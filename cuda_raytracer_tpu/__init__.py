"""cuda_raytracer_tpu — a TPU-native differentiable Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas framework matching the capabilities of the
reference CUDA raytracer (isaac-chandler/cuda-raytracer): custom scene DSL with
spheres / triangles / quads / PLY meshes and PFM environment maps, binned-SAH
BVH, Möller–Trumbore and slab intersection, diffuse / metallic / dielectric
materials, Morton-code ray reordering, bloom post-processing — re-designed for
TPU: wavefront rendering under ``lax.scan``, SoA ray batches on a sharded
leading axis, counter-style PCG RNG, end-to-end differentiability to material
parameters and the sky map, and multi-chip SPMD via ``shard_map``.

Layer map (mirrors SURVEY.md §1, top = closest to the user):
  L7 cli          — command-line driver (reference: raytracing.cu:305-398)
  L6 models/*     — scene DSL / PLY / PFM loaders (reference: scene.cu:489-831)
  L5 models/bvh   — binned-SAH BVH builder, C++ + NumPy (scene.cu:859-1036)
  L4 render/*     — render orchestrators / pass loop (raytracing.cu:122-284)
  L3 ops/*        — ray kernels: intersect, traverse, shade (scene.cu:78-487)
  L2 models/scene — scene data model as a JAX pytree (scene.cuh:9-166)
  L1 ops/{vecmath,rng} — primitives (math.cuh, random.cuh)
  +  parallel/*   — multi-chip SPMD (no reference analogue; SURVEY §5.8)
"""

__version__ = "0.1.0"

from cuda_raytracer_tpu.models.scene import Scene, Materials, RenderConfig  # noqa: F401
from cuda_raytracer_tpu.models.scene_dsl import load_scene  # noqa: F401
