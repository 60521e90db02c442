"""Wavefront path tracing — the TPU form of the reference megakernel.

The reference fuses traversal + intersection + shading into one CUDA kernel
relaunched per bounce with persistent RayData (raytracing.cu:83-94,232-249).
Here the whole wavefront is SoA ray state marched by a ``lax.scan`` over
bounces; XLA fuses the intersect/shade math per bounce, and an optional
Morton-key sort between bounces reorders rays for traversal coherence (the
CUB radix-sort step, raytracing.cu:238-247, expressed as
``jax.lax.sort_key_val``).

Shading matches scene.cu:320-487: emissive add on hit, rough-normal
perturbation, metallicity-probability specular/diffuse split for opaque
materials, Schlick + total-internal-reflection russian roulette for
dielectrics. Sampling draws come from the counter-based PCG stream seeded per
(ray, bounce) with the reference GPU's constants (raytracing.cu:89).

RNG-parity note (deliberate divergence): the reference GPU seeds by *sorted
ray position*, so reordering changes its noise pattern; we seed by the stable
per-pass ray id, making sort vs no-sort renders bit-identical. The reference
CPU path also omits the bounce index from its seed (raytracing.cu:148),
correlating bounces; we follow the GPU scheme (bounce-dependent).

Differentiation: radiance is accumulated as ``collected += emitted ⊙
transmitted`` with ``transmitted`` a product of gathered albedos, so gradients
flow to material colours and the sky map. With ``reparam=True`` direction
computations stay differentiable (pathwise gradients for roughness/ior); by
default geometry is detached each bounce, which is cheaper and unbiased for
the colour/emission/sky parameters.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from cuda_raytracer_tpu.models.scene import Scene
from cuda_raytracer_tpu.ops import camera as camera_ops
from cuda_raytracer_tpu.ops import envmap, intersect, morton, rng, traverse, vecmath

# Per-(ray, bounce) seeding constants, raytracing.cu:89. The scalar seed is
# `pass_seed * 20 + bounce` exactly like the reference's
# `remaining_rays * MAX_RAYS_PER_PIXEL_PER_PASS + i` (raytracing.cu:236).
# Bounces whose closest-hit uses the packet path's two-round sweep (the
# wavefront is still large there but has lost primary-ray coherence).
TWO_ROUND_BOUNCES = (1, 2)

_BOUNCE_RAY_MULT = np.uint32(4137874753)
_BOUNCE_SEED_MULT = np.uint32(279220567)
_PASS_STRIDE = np.uint32(20)


class RayState(NamedTuple):
    """SoA wavefront state — the reference's RayData (scene.cuh:61-68) plus
    the stable ray id that carries pixel identity through reordering."""

    origin: jnp.ndarray  # (R, 3)
    direction: jnp.ndarray  # (R, 3)
    transmitted: jnp.ndarray  # (R, 3)
    collected: jnp.ndarray  # (R, 3)
    ray_id: jnp.ndarray  # (R,) int32


def bounce_seeds(ray_id: jnp.ndarray, pass_seed, bounce) -> jnp.ndarray:
    return (
        ray_id.astype(jnp.uint32) * _BOUNCE_RAY_MULT
        + _BOUNCE_SEED_MULT
        * (jnp.uint32(pass_seed) * _PASS_STRIDE + jnp.uint32(bounce))
    )


def closest_hit(
    scene: Scene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    alive: jnp.ndarray = None,
    two_round: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Nearest hit over spheres (brute force) then triangles (BVH, or a brute
    (rays x tris) tile when the scene is small enough that a tree walk is
    slower than one dense VPU sweep). Dead rays enter traversal with
    ``closest = 0`` so their tree walk terminates immediately — the wavefront
    analogue of the reference's early-out (scene.cu:322-328).

    Returns (t, index, suspect) where ``suspect`` is a scalar count of rays
    whose result the packet intersector could not certify exact (pair-budget
    overflow — see packet_intersect.closest_hit_packet). Zero means the hit
    set is exact; render orchestration fails loudly on nonzero (the TPU
    analogue of the reference's fail-fast CUDA_CHECK, common.cuh:10-18)."""
    t, index = intersect.intersect_spheres(
        origin, direction, scene.sphere_center, scene.sphere_radius
    )
    exact = jnp.zeros((), jnp.int32)
    if alive is not None:
        # Dead rays enter the intersectors with a NEGATIVE search window:
        # the slab test (tmin >= 0 > tmax) then rejects every box, so they
        # generate no traversal work and no cluster pairs.
        t = jnp.where(alive, t, -1.0)
    if scene.triangle_count == 0:
        return t, index, exact

    # no_bvh note: with a single-leaf tree (scene.cu:820) the cluster cut
    # degenerates to same-AABB chunks, so resolved_intersector falls back
    # to the brute linear scan — exactly the reference's no_bvh semantics.
    mode = resolved_intersector(scene)

    if mode == "brute":
        t_tri, i_tri = intersect.intersect_triangles_brute(
            origin, direction, scene.tri_p1, scene.tri_e1, scene.tri_e2
        )
        better = t_tri < t
        t = jnp.where(better, t_tri, t)
        index = jnp.where(better, scene.sphere_count + i_tri, index)
        return t, index, exact
    if mode == "packet":
        from cuda_raytracer_tpu.ops import packet_intersect

        backend = scene.config.packet_backend
        if backend == "auto":
            if getattr(scene.config, "cluster_pack", 1) > 1:
                # Packed paired-sub-cluster tables: only the fused1 kernel
                # understands the box↔block mapping.
                backend = (
                    "fused1" if jax.default_backend() == "tpu"
                    else "fused1_interpret"
                )
            else:
                backend = "fused" if jax.default_backend() == "tpu" else "xla"
        t, index, suspects = packet_intersect.closest_hit_packet(
            scene, origin, direction, t, index,
            tile=scene.config.packet_tile,
            cap=min(scene.config.packet_cap, scene.num_clusters),
            backend=backend,
            # Front-to-back two-round pruning pays only on the legacy sweep
            # path, whose XLA pair extraction the pruning halves; the fused
            # kernel's in-kernel extraction is already cheap, and the extra
            # cull+launches measure as a net loss (80 → 85 ms/step).
            two_round=two_round and backend == "pallas",
            skip=scene.config.packet_skip,
        )
        return t, index, suspects.astype(jnp.int32)
    t, index = traverse.bvh_closest_hit(scene, origin, direction, t, index)
    return t, index, exact


def recompute_hit_distance(
    scene: Scene,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    hit_index: jnp.ndarray,
    t_detached: jnp.ndarray,
) -> jnp.ndarray:
    """Differentiable hit distance for an already-chosen primitive.

    Traversal is a discrete search (its while-loop is not differentiable and
    its output is piecewise-constant in the inputs), so reparameterised mode
    detaches the *choice* of primitive and re-evaluates the analytic distance
    — sphere quadratic or Möller–Trumbore — for that primitive only, which IS
    smooth in origin/direction/geometry. Miss lanes return 0 so no 1e30
    sentinel ever enters the differentiable graph (inf would leak NaN through
    `where` in backward)."""
    hit_index = jax.lax.stop_gradient(hit_index)
    t_detached = jax.lax.stop_gradient(t_detached)
    is_sphere = (hit_index >= 0) & (hit_index < scene.sphere_count)
    is_tri = hit_index >= scene.sphere_count

    sphere_i = jnp.clip(hit_index, 0, scene.sphere_center.shape[0] - 1)
    center = scene.sphere_center[sphere_i]
    radius = scene.sphere_radius[sphere_i]
    offset = center - origin
    minus_half_b = vecmath.dot(offset, direction)
    quarter_disc = (
        minus_half_b * minus_half_b
        - vecmath.magnitude_squared(offset)
        + radius * radius
    )
    half_sqrt = _safe_sqrt(quarter_disc)
    near = minus_half_b - half_sqrt
    far = minus_half_b + half_sqrt
    take_near = jnp.abs(near - t_detached) <= jnp.abs(far - t_detached)
    t_sphere = jnp.where(take_near, near, far)

    tri_i = jnp.clip(hit_index - scene.sphere_count, 0, scene.tri_p1.shape[0] - 1)
    p1 = scene.tri_p1[tri_i]
    e1 = scene.tri_e1[tri_i]
    e2 = scene.tri_e2[tri_i]
    h = vecmath.cross(direction, e2)
    det = vecmath.dot(h, e1)
    inv_det = jnp.where(det == 0, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))
    q = vecmath.cross(origin - p1, e1)
    t_tri = vecmath.dot(e2, q) * inv_det

    return jnp.where(is_sphere, t_sphere, jnp.where(is_tri, t_tri, 0.0))


# Tables at or below this row count are looked up with a one-hot matmul
# instead of a row gather: TPU row gathers of narrow rows run element-wise
# (~2 ms per (262k, 3) gather), while a (R, N) @ (N, 3) contraction is
# bandwidth-bound. Exact for 0/1 one-hots at HIGHEST precision.
SMALL_TABLE = 128


def _lookup(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table[idx] with the one-hot path for small tables. idx must be
    pre-clamped to range."""
    n = table.shape[0]
    if n > SMALL_TABLE:
        return table[idx]
    onehot = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)).astype(jnp.float32)
    squeeze = table.ndim == 1
    t2 = table[:, None] if squeeze else table
    int_out = jnp.issubdtype(t2.dtype, jnp.integer)
    out = jnp.matmul(
        onehot,
        t2.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    if int_out:
        out = out.astype(table.dtype)  # exact below 2^24
    return out[:, 0] if squeeze else out


def _gather_normal(
    scene: Scene, hit_index: jnp.ndarray, hit_point: jnp.ndarray
) -> jnp.ndarray:
    """Surface normal for the shared sphere/triangle hit-index space
    (scene.cu:401-411)."""
    is_sphere = hit_index < scene.sphere_count
    sphere_i = jnp.clip(hit_index, 0, scene.sphere_center.shape[0] - 1)
    tri_i = jnp.clip(
        hit_index - scene.sphere_count, 0, scene.tri_normal.shape[0] - 1
    )
    center = _lookup(scene.sphere_center, sphere_i)
    radius = _lookup(scene.sphere_radius, sphere_i)
    sphere_n = (hit_point - center) / jnp.where(radius == 0, 1.0, radius)[:, None]
    tri_n = _lookup(scene.tri_normal, tri_i)
    return jnp.where(is_sphere[:, None], sphere_n, tri_n)


def _safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt clamped at 0 whose gradient stays finite for non-selected branch
    lanes (double-where pattern)."""
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.sqrt(safe), 0.0)


# Shading-path fusion control (see process_rays): 0 = let XLA fuse freely
# (round-4 behaviour), 1 = materialise the per-bounce PCG draws, 2 = also
# compute the on-sphere trig as flat (R,) arrays at full lane utilisation.
# Env override is for A/B scans (scripts/scan_simple.py); the default is the
# measured winner on v5e.
import os as _os

_SHADE_OPT = int(_os.environ.get("RT_SHADE_OPT", "2"))


def _on_sphere_lanes(bits_a: jnp.ndarray, bits_b: jnp.ndarray) -> jnp.ndarray:
    """rng.on_sphere_from_bits with its sine/cosine terms materialised as
    flat (R,) arrays — bit-identical values, radically different XLA code.

    Fused freely, XLA re-computes each trig term inside the (R, 1) column
    fusions of the final stack (layout T(1,128): one sublane in eight live)
    and drags the whole upstream RNG chain in with it. The barrier pins
    cos/sin to (R,)-shaped full-lane fusions computed exactly once."""
    r1 = rng.to_radians(bits_a)
    r2 = rng.to_02(bits_b)
    x = jnp.sqrt(r2 * (2.0 - r2))
    c, s = jax.lax.optimization_barrier((jnp.cos(r1) * x, jnp.sin(r1) * x))
    return jnp.stack([c, s, 1.0 - r2], axis=-1)


def process_rays(
    scene: Scene, state: RayState, pass_seed, bounce, reparam: bool = False
) -> Tuple[RayState, jnp.ndarray]:
    """One bounce for the whole wavefront (reference Scene::process_ray,
    scene.cu:320-487). Returns (new_state, suspect) — ``suspect`` is the
    closest-hit exactness certificate (see closest_hit)."""
    alive = jnp.any(state.transmitted != 0.0, axis=-1)

    # The closest-hit search is always detached (discrete, and the BVH walk's
    # while-loop is not differentiable); reparam mode re-derives a smooth t.
    # Early post-primary bounces carry a large, direction-incoherent
    # wavefront — there the packet path's two-round front-to-back sweep
    # prunes the pair list ~2×; elsewhere its fixed overhead loses.
    two_round = isinstance(bounce, int) and bounce in TWO_ROUND_BOUNCES
    t, hit_index, suspect = closest_hit(
        scene,
        jax.lax.stop_gradient(state.origin),
        jax.lax.stop_gradient(state.direction),
        alive,
        two_round=two_round,
    )
    t = jax.lax.stop_gradient(t)
    hit_index = jax.lax.stop_gradient(hit_index)
    # Name the (tiny) intersection results so trace_wavefront's checkpoint
    # policy saves them: the backward pass then rematerialises shading only,
    # never re-running the (gradient-free) closest-hit search.
    t = checkpoint_name(t, "hit_t")
    hit_index = checkpoint_name(hit_index, "hit_index")
    miss = hit_index < 0
    if reparam:
        t = recompute_hit_distance(scene, state.origin, state.direction, hit_index, t)
    else:
        # Keep sentinel 1e30 out of downstream products: miss lanes never use
        # their hit_point, but inf/NaN would still leak through `where`.
        t = jnp.where(miss, 0.0, t)

    draws = rng.uniforms(bounce_seeds(state.ray_id, pass_seed, bounce), 5)
    if _SHADE_OPT >= 1:
        # Materialise the PCG draws once per bounce. Without the barrier XLA
        # duplicates the whole seed→srand→5-advance integer chain (~200 ops)
        # into EVERY consumer fusion — profiled on spheres 1000²×100 spp as
        # ~4 copies per bounce inside (R, 1)-shaped sine/cosine fusions at
        # 1/8 sublane utilisation, ~half the render (PROFILE_r05).
        draws = jax.lax.optimization_barrier(draws)
    if _SHADE_OPT >= 2:
        sphere_a = _on_sphere_lanes(draws[0], draws[1])  # rough normal
        sphere_b = _on_sphere_lanes(draws[3], draws[4])  # diffuse dir
    else:
        sphere_a = rng.on_sphere_from_bits(draws[0], draws[1])  # rough normal
        sphere_b = rng.on_sphere_from_bits(draws[3], draws[4])  # diffuse dir
    branch_u = rng.to_01(draws[2])  # metallicity / roulette draw

    # ---- Miss: environment radiance, ray dies (scene.cu:376-395) ----------
    # Reparam mode filters bilinearly so the sky is smooth in the (traced)
    # scatter direction; parity mode keeps the reference's nearest fetch.
    sky = envmap.sample_environment(
        scene.environment_map, state.direction, bilinear=reparam
    )
    collected_miss = state.collected + sky * state.transmitted

    # ---- Hit: emissive add + scatter --------------------------------------
    hit_point = state.origin + t[:, None] * state.direction
    hit_safe = jnp.clip(hit_index, 0, scene.material_index.shape[0] - 1)
    mat_i = checkpoint_name(_lookup(scene.material_index, hit_safe), "hit_mat")
    mats = scene.materials
    # Material table lookups as one-hot matmuls: the table is tiny (M <= a
    # few dozen, padded), and a (R, M) @ (M, ·) contraction beats R-sized
    # row gathers on TPU — and its VJP is a matmul into the parameter table
    # instead of a scatter-add (the north-star gradients flow through here).
    M = mats.diffuse_albedo.shape[0]
    onehot = (mat_i[:, None] == jnp.arange(M, dtype=mat_i.dtype)).astype(jnp.float32)
    mat3 = jnp.concatenate(
        [mats.diffuse_albedo, mats.specular_albedo, mats.emitted], axis=1
    )  # (M, 9)
    mat1 = jnp.stack(
        [mats.metallicity, mats.roughness, mats.index_of_refraction], axis=1
    )  # (M, 3)
    # HIGHEST precision: the default TPU matmul rounds operands to bf16,
    # which would perturb material values by ~2^-8; with a 0/1 one-hot the
    # product must reproduce the table entries exactly.
    per_ray3 = jnp.matmul(onehot, mat3, precision=jax.lax.Precision.HIGHEST)
    per_ray1 = jnp.matmul(onehot, mat1, precision=jax.lax.Precision.HIGHEST)
    diffuse = per_ray3[:, 0:3]
    specular = per_ray3[:, 3:6]
    emitted = per_ray3[:, 6:9]
    metallicity = per_ray1[:, 0]
    roughness = per_ray1[:, 1]
    ior0 = per_ray1[:, 2]

    normal = _gather_normal(scene, hit_safe, hit_point)
    if not reparam:
        # Geometry carries no gradient in detached mode — save the gathered
        # normal across the bounce checkpoint so backward skips the
        # (R,3)-row gather over the triangle table.
        normal = checkpoint_name(jax.lax.stop_gradient(normal), "hit_geom_normal")
    front_face = vecmath.dot(normal, state.direction) < 0
    normal = jnp.where(front_face[:, None], normal, -normal)

    if not reparam:
        # Detached-sampling mode: geometry does not carry gradients.
        normal = jax.lax.stop_gradient(normal)
        roughness_s = jax.lax.stop_gradient(roughness)
        ior_s = jax.lax.stop_gradient(ior0)
    else:
        roughness_s = roughness
        ior_s = ior0

    rough_normal = vecmath.normalise_safe(normal + roughness_s[:, None] * sphere_a)
    cos_theta = vecmath.dot(rough_normal, state.direction)

    collected_hit = state.collected + emitted * state.transmitted

    # Opaque branch (ior == 0): metallicity coin flip (scene.cu:430-442).
    specular_dir = state.direction - 2.0 * cos_theta[:, None] * rough_normal
    diffuse_dir = vecmath.normalise_safe(normal + sphere_b)
    take_specular = branch_u <= jax.lax.stop_gradient(metallicity)

    # Dielectric branch (scene.cu:443-476): swap ior for front faces, Schlick
    # reflectance, TIR-or-roulette reflect, else Snell refraction.
    ior = jnp.where(front_face, 1.0 / jnp.where(ior_s == 0, 1.0, ior_s), ior_s)
    inv_ior = jnp.where(front_face, ior_s, 1.0 / jnp.where(ior_s == 0, 1.0, ior_s))
    sin_theta_sq = 1.0 - cos_theta * cos_theta
    r0 = (1.0 - ior) / (1.0 + ior)
    r0 = r0 * r0
    cosine = 1.0 + cos_theta
    reflectance = r0 + (1.0 - r0) * cosine**5
    take_reflect = (sin_theta_sq > inv_ior * inv_ior) | (
        branch_u < jax.lax.stop_gradient(reflectance)
    )
    r_out_perp = ior[:, None] * (state.direction - cos_theta[:, None] * rough_normal)
    r_out_par = (
        -_safe_sqrt(1.0 - vecmath.magnitude_squared(r_out_perp))[:, None]
        * rough_normal
    )
    refract_dir = vecmath.normalise_safe(r_out_par + r_out_perp)

    is_dielectric = ior0 > 0
    spec_like = jnp.where(is_dielectric, take_reflect, take_specular)
    tint = jnp.where(spec_like[:, None], specular, diffuse)
    new_dir = jnp.where(
        spec_like[:, None],
        specular_dir,
        jnp.where(is_dielectric[:, None], refract_dir, diffuse_dir),
    )
    # Score-function (REINFORCE) gradient for the opaque metallicity coin:
    # the branch decision itself stays detached, but scaling the continuing
    # throughput by P(branch)/stop_grad(P(branch)) — identically 1 in value —
    # injects ∂log P(branch)/∂metallicity into the backward pass, so the
    # discrete specular/diffuse choice contributes its distributional
    # gradient (E[f·∂log P]). Unbiased for metallicity in (0, 1) (at the
    # boundaries the unsampled branch's term vanishes from the estimator);
    # validated against many-sample finite differences in
    # tests/test_diff.py::test_grad_metallicity. The weight is exactly 1.0
    # in value (x/x), so forward renders and oracle parity are untouched.
    p_taken = jnp.where(take_specular, metallicity, 1.0 - metallicity)
    p_safe = jnp.maximum(jnp.where(is_dielectric, 1.0, p_taken), 1e-6)
    score_w = p_safe / jax.lax.stop_gradient(p_safe)
    transmitted_hit = state.transmitted * tint * score_w[:, None]

    # ---- Merge miss/hit, mask dead rays -----------------------------------
    update = alive
    hit_update = update & ~miss
    new_origin = jnp.where(hit_update[:, None], hit_point, state.origin)
    new_direction = jnp.where(hit_update[:, None], new_dir, state.direction)
    new_transmitted = jnp.where(
        update[:, None],
        jnp.where(miss[:, None], jnp.zeros_like(state.transmitted), transmitted_hit),
        state.transmitted,
    )
    new_collected = jnp.where(
        update[:, None],
        jnp.where(miss[:, None], collected_miss, collected_hit),
        state.collected,
    )
    if not reparam:
        new_origin = jax.lax.stop_gradient(new_origin)
        new_direction = jax.lax.stop_gradient(new_direction)
    new_state = RayState(
        new_origin, new_direction, new_transmitted, new_collected, state.ray_id
    )
    return new_state, suspect


def process_rays_tiled(
    scene: Scene,
    state: RayState,
    pass_seed,
    bounce,
    reparam: bool = False,
    tile_size: int = 1 << 18,
) -> Tuple[RayState, jnp.ndarray]:
    """process_rays over fixed-size ray tiles via ``lax.map``.

    Bounds the per-step working set (the (rays × prims) intersection tiles
    and traversal stacks) to ``tile_size`` rows regardless of wavefront size —
    the analogue of the reference's grid-stride kernel launches, sized for
    VMEM/HBM instead of SM occupancy. Cross-ray operations (sorting,
    accumulation) stay outside; within a bounce every ray is independent, so
    padding with dead lanes and slicing back is exact."""
    rays = state.origin.shape[0]
    if rays <= tile_size:
        return process_rays(scene, state, pass_seed, bounce, reparam=reparam)

    pad = (-rays) % tile_size
    if pad:
        def pad_leaf(x):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)

        state = RayState(*(pad_leaf(leaf) for leaf in state))
    tiles = (rays + pad) // tile_size

    def tile_fn(tile_state):
        return process_rays(scene, tile_state, pass_seed, bounce, reparam=reparam)

    tiled = RayState(
        *(leaf.reshape((tiles, tile_size) + leaf.shape[1:]) for leaf in state)
    )
    out, suspect = jax.lax.map(tile_fn, tiled)
    state_out = RayState(
        *(leaf.reshape((tiles * tile_size,) + leaf.shape[2:])[:rays] for leaf in out)
    )
    return state_out, jnp.sum(suspect)


# Static prefix sizes for live-prefix processing (dead-ray compaction), as
# divisors of the wavefront. After a global Morton sort, dead rays (key
# 0xFFFFFFFF) sit at the tail, so the wavefront is live-first and a bounce
# only needs to process the smallest static prefix covering the live bound.
# One lax.switch per bounce — a scan of cond'd chunks was tried first and
# LOSES (~165 µs loop overhead per chunk iteration: 96 → 129 ms/step).
LIVE_PREFIX_DIVISORS = (1, 4, 16, 64)


def prefix_quantum(scene: Scene, rays: int) -> int:
    """Prefix granularity: whole intersection tiles when the Morton sort is
    global; whole sort chunks otherwise (a prefix sort must respect the same
    chunk boundaries as the full-wavefront sort, or the chunk-local
    by-ray-id unsort in accumulate_radiance would break)."""
    cs = sort_chunk_size(rays)
    return scene.config.packet_tile if cs == rays else cs


def prefix_for_divisor(scene: Scene, rays: int, divisor) -> int:
    """ceil(rays / divisor) rounded up to the prefix quantum. ``divisor``
    may be fractional (calibrate_live_schedule emits R/need so the prefix
    lands on the calibrated live bound instead of the next power of two)."""
    quantum = prefix_quantum(scene, rays)
    n = int(-(-rays // max(1, divisor)))
    return min(rays, -(-n // quantum) * quantum)


def live_prefix_sizes(scene: Scene, rays: int) -> list:
    """Static prefix sizes (descending) for dead-ray compaction."""
    sizes = []
    for div in LIVE_PREFIX_DIVISORS:
        n = prefix_for_divisor(scene, rays, div)
        if n not in sizes:
            sizes.append(n)
    return sizes


def bounce_on_live_prefix(
    scene: Scene,
    state: RayState,
    pass_seed,
    bounce,
    live_bound: jnp.ndarray,  # () int32 — all live rays sit below this row
    do_sort: bool,
    reparam: bool = False,
    static_divisor: int = None,
) -> Tuple[RayState, jnp.ndarray, jnp.ndarray]:
    """One bounce (process + optional Morton reorder + live recount) on the
    smallest static prefix covering the live rays — the TPU form of
    dead-ray compaction (SURVEY §7.4; the reference only sorts dead rays to
    the tail, raytracing.cu:238-247). → (state, live_bound', suspect).

    Exactness: dead rays are no-ops in process_rays (they enter the
    intersectors with a negative window and their state merge is masked), so
    leaving the all-dead suffix untouched cannot change any output.
    ``live_bound`` must over-approximate the highest live row + 1; rows can
    only die in place between sorts, so a bound computed after the last
    live-first sort stays valid; sorting a prefix keeps its rays inside the
    prefix, so the incoming bound survives sorts too, and tightens to the
    exact live count whenever the prefix was sorted in one piece (dead keys
    sort last). The prefix choice is a lax.switch over static slice sizes —
    data-dependent at runtime, fully differentiable, static shapes
    throughout.

    ``static_divisor`` (config.live_schedule) replaces the runtime switch
    with one TRACE-TIME prefix — no conditional, so none of the switch's
    full-state operand copies. Exactness stays guaranteed: any bounce whose
    dynamic live bound exceeds its static prefix reports the overhang
    through the suspect count (the certificate channel), and render
    orchestration retries with the schedule off."""
    rays = state.origin.shape[0]
    cs = sort_chunk_size(rays)
    sizes = live_prefix_sizes(scene, rays)

    def run_prefix(n):
        def fn(st):
            prefix = RayState(*(leaf[:n] for leaf in st))
            # process_rays_tiled: bounds each call's working set (fused-
            # kernel VMEM outputs, cull matrices) to tile_size rays — the
            # prefix itself can span millions of rays on full-res passes.
            out, suspect = process_rays_tiled(
                scene, prefix, pass_seed, bounce, reparam=reparam
            )
            bound = jnp.minimum(live_bound, n)
            if do_sort:
                out = reorder_rays(scene, out, chunk_size=min(cs, n))
                if n <= cs:
                    # Single-piece sort → live-first prefix → exact recount.
                    alive = jnp.any(out.transmitted != 0.0, axis=-1)
                    bound = jnp.sum(alive).astype(jnp.int32)
            merged = RayState(
                *(
                    jnp.concatenate([o, leaf[n:]], axis=0) if n < rays else o
                    for o, leaf in zip(out, st)
                )
            )
            return merged, bound, suspect

        return fn

    if static_divisor is not None:
        n = prefix_for_divisor(scene, rays, static_divisor)
        merged, bound, suspect = run_prefix(n)(state)
        # Schedule certificate: live rays beyond the static prefix were not
        # processed — count them as suspect (0 when the schedule holds).
        overhang = jnp.maximum(live_bound - n, 0)
        return merged, bound, suspect + overhang

    if len(sizes) == 1:
        return run_prefix(sizes[0])(state)

    # Smallest prefix >= live_bound (sizes are descending).
    index = jnp.zeros((), jnp.int32)
    for i in range(1, len(sizes)):
        index = jnp.where(live_bound <= sizes[i], i, index)
    return jax.lax.switch(index, [run_prefix(n) for n in sizes], state)


def resolved_intersector(scene: Scene) -> str:
    """The triangle intersector closest_hit will actually use.

    auto → brute (component-form dense (R, T) sweep, no reorder) for small
    scenes, packet (clustered cull + Pallas sweep) above 512 triangles.
    The threshold is measured, not aesthetic: at cornell's 30 triangles the
    packet machinery is per-tile-fixed-cost-bound and 7x SLOWER than the
    brute sweep on v5e (0.50 vs 3.46 s at 1000²×10 spp, SCAN_r04), while
    teapot-scale tables are unusable brute."""
    mode = scene.config.intersector
    if mode not in ("auto", "brute", "packet", "bvh"):
        # Fail fast like the CLI does for unknown flags — a typo'd (or
        # removed, e.g. round 1's "clustered") mode must not silently fall
        # through to a different intersector.
        raise ValueError(
            f"unknown intersector {mode!r}; "
            "expected auto | brute | packet | bvh"
        )
    if mode == "auto":
        mode = "brute" if scene.triangle_count <= 512 else "packet"
    if scene.bvh_node_count <= 1 or scene.triangle_count == 0:
        mode = "brute"
    return mode


def reorder_is_useful(scene: Scene) -> bool:
    """Morton reordering pays only through tile coherence in the packet /
    clustered intersectors; for brute-force scenes the sort is pure cost
    (matches the reference's own finding that reordering only helps complex
    scenes, REPORT p.7)."""
    return resolved_intersector(scene) != "brute"


# Rays are reordered within fixed-size chunks rather than globally: XLA's
# sort is O(n log^2 n) and dominates big wavefronts (≈0.5 s for one 10M-ray
# argsort on v5e), while chunk-local Morton order gives the packet
# intersector the same tile coherence. Chunk-locality also makes the
# final by-ray-id unsort a cheap per-chunk operation, because a ray can
# never leave its chunk.
SORT_CHUNK = 1 << 18


def sort_chunk_size(rays: int) -> int:
    """Largest divisor of ``rays`` at most SORT_CHUNK (floor 4096; falls
    back to a global sort when none divides evenly)."""
    if rays <= SORT_CHUNK:
        return rays
    for cs in range(SORT_CHUNK, 4095, -1):
        if rays % cs == 0:
            return cs
    return rays


def _pack_state(state: RayState) -> jnp.ndarray:
    """Pack the SoA wavefront into one (R, 16) float32 block (ray_id
    bitcast into lanes 12): row-gathers of 3-wide arrays run element-wise on
    TPU (~1.5 ms per (R,3) gather at R=131k), so permutations move ONE wide
    array instead of five narrow ones."""
    rid = jax.lax.bitcast_convert_type(state.ray_id, jnp.float32)[:, None]
    pad = jnp.zeros((state.origin.shape[0], 3), jnp.float32)
    return jnp.concatenate(
        [state.origin, state.direction, state.transmitted, state.collected,
         rid, pad],
        axis=1,
    )


def _unpack_state(packed: jnp.ndarray) -> RayState:
    return RayState(
        origin=packed[:, 0:3],
        direction=packed[:, 3:6],
        transmitted=packed[:, 6:9],
        collected=packed[:, 9:12],
        ray_id=jax.lax.bitcast_convert_type(packed[:, 12], jnp.int32),
    )


def reorder_rays(
    scene: Scene, state: RayState, chunk_size: int = None
) -> RayState:
    """Morton-key sort of the wavefront (the CUB radix-sort step,
    raytracing.cu:238-247), chunk-local (see SORT_CHUNK). Physically
    permutes the SoA state — on TPU a sort+gather is the native form of the
    reference's index indirection. ``chunk_size`` overrides the chunking
    (used by the live-prefix path, which must keep the same chunk
    boundaries as full-wavefront sorts)."""
    alive = jnp.any(state.transmitted != 0.0, axis=-1)
    key_mode = scene.config.sort_key
    if key_mode == "auto":
        key_mode = "cullhit" if resolved_intersector(scene) == "packet" else "morton"
    if key_mode == "cullhit" and resolved_intersector(scene) == "packet":
        keys = morton.first2_cluster_keys(
            state.origin, state.direction, alive,
            scene.cluster_min, scene.cluster_max,
            scene.num_clusters, scene.config.cull_split,
        )
    else:
        keys = morton.ray_sort_keys(
            state.origin, state.direction, alive, scene.min_coord, scene.inv_extent
        )
    R = keys.shape[0]
    cs = chunk_size if chunk_size is not None else sort_chunk_size(R)
    packed = _pack_state(state)
    nc = R // cs
    engine = scene.config.sort_engine
    if engine == "auto":
        # Per-regime engine (v5e, SCAN_r04): the matmul counting sort's
        # scatter-apply wins up to 2^17-row chunks (79.8 vs 80.2 ms bench
        # grad step) but loses badly on 2^18-row full-res blocks (teapot
        # 10 spp 3.40 vs 2.77 s) — the bitonic argsort + gather scales
        # better past ~131k rows.
        engine = "count" if cs <= (1 << 17) else "argsort"
    # The permutation is saved as a checkpoint residual ("sort_order",
    # trace_wavefront's policy): it costs 4 bytes/ray/bounce, and saving it
    # turns the backward rematerialisation's argsort (~3 ms at R=131k, the
    # bitonic sort is O(cs log^2 cs)) back into a plain gather (or, for the
    # counting engine, a unique-index scatter).
    if engine == "count":
        # Stable matmul counting sort (ops/sort.py): dest[i] is where row i
        # moves, chunk-local. Applied as a unique-index scatter; its VJP is
        # a plain gather by dest. Dead rays land last per chunk, like the
        # argsort (dead keys are maximal), so live-prefix recounts hold.
        from cuda_raytracer_tpu.ops import sort as sort_mod

        if cs == R:
            dest = sort_mod.bucket_sort_dest(keys)
        else:
            dest = jax.vmap(sort_mod.bucket_sort_dest)(keys.reshape(nc, cs))
            dest = (dest + (jnp.arange(nc, dtype=jnp.int32) * cs)[:, None]).reshape(R)
        dest = checkpoint_name(dest, "sort_order")
        permuted = jnp.zeros_like(packed).at[dest].set(
            packed, unique_indices=True
        )
        return _unpack_state(permuted)
    if cs == R:
        order = checkpoint_name(jnp.argsort(keys), "sort_order")
        return _unpack_state(packed[order])
    order = checkpoint_name(jnp.argsort(keys.reshape(nc, cs), axis=1), "sort_order")
    permuted = jnp.take_along_axis(
        packed.reshape(nc, cs, packed.shape[1]), order[:, :, None], axis=1
    )
    return _unpack_state(permuted.reshape(R, packed.shape[1]))


def trace_wavefront(
    scene: Scene,
    state: RayState,
    pass_seed,
    bounces: int,
    sort_rays: bool,
    reparam: bool = False,
    checkpoint_bounces: bool = True,
    tile_size: int = 1 << 18,
) -> Tuple[RayState, jnp.ndarray]:
    """March the wavefront through ``bounces`` scatter events. The loop is a
    Python loop over a static bounce count (the per-bounce graphs differ only
    in the seed scalar; XLA shares code across iterations), with
    ``jax.checkpoint`` on each bounce so the backward pass rematerialises
    intermediates instead of storing every bounce's wavefront — except the
    closest-hit results (t, hit index; ~5 bytes/ray/bounce), which are saved:
    they carry no gradient, so re-running the intersection during backward
    would be pure waste. Per-bounce work runs in ``tile_size``-ray tiles
    (see process_rays_tiled).

    Returns (state, suspect): ``suspect`` is the summed closest-hit exactness
    certificate across all bounces — zero iff every intersection result is
    certified exact (see closest_hit). Render orchestration fails loudly on
    nonzero (pipeline.render_framebuffer)."""

    sort_rays = sort_rays and reorder_is_useful(scene)
    sort_depth = scene.config.sort_depth or bounces
    R = state.origin.shape[0]

    def one_bounce(state, live_bound, bounce):
        """→ (state, live_bound', suspect); the whole bounce (intersect +
        shade + optional Morton reorder + live recount) runs on the smallest
        static live prefix (bounce_on_live_prefix)."""
        # Static per-bounce sort decision (the loop is unrolled): sort while
        # the wavefront is young; deep bounces are mostly dead rays where
        # the reorder costs more than the coherence it buys — though with
        # compaction, a sort also tightens the live bound, so it keeps
        # paying further down than round 1's tuning suggested.
        do_sort = sort_rays and bounce + 1 != bounces and bounce < sort_depth
        if not sort_rays or sort_chunk_size(R) != R:
            # The live bound can only tighten after a live-first sort of a
            # whole prefix — impossible without sorting, and unreachable in
            # the chunk-local-sort regime (the bound starts at R > chunk, so
            # the full branch runs and never recounts). Skip the prefix
            # switch entirely there: besides compiling every branch of the
            # bounce graph for nothing, XLA conditionals copy the full
            # wavefront state in and out (~130 MB/bounce at 1M rays —
            # measured 10x slower full-res renders). Full-res compaction
            # comes from pipeline-level ray blocking instead.
            new_state, suspect = process_rays_tiled(
                scene, state, pass_seed, bounce, reparam=reparam
            )
            if do_sort:
                new_state = reorder_rays(scene, new_state)
            return new_state, live_bound, suspect
        sched = scene.config.live_schedule
        # Divisors may be fractional (calibrate_live_schedule emits R/need
        # so the prefix lands on the calibrated bound, not a power of two);
        # prefix_for_divisor handles either form exactly.
        static_divisor = sched[min(bounce, len(sched) - 1)] if sched else None
        return bounce_on_live_prefix(
            scene, state, pass_seed, bounce, live_bound, do_sort,
            reparam=reparam, static_divisor=static_divisor,
        )

    policy = jax.checkpoint_policies.save_only_these_names(
        "hit_t", "hit_index", "hit_mat", "hit_geom_normal", "sort_order"
    )
    step = (
        jax.checkpoint(one_bounce, static_argnums=(2,), policy=policy)
        if checkpoint_bounces
        else one_bounce
    )
    suspect_total = jnp.zeros((), jnp.int32)
    live_bound = jnp.int32(R)
    for bounce in range(bounces):
        state, live_bound, suspect = step(state, live_bound, bounce)
        suspect_total = suspect_total + suspect
    return state, suspect_total


def trace_live_bounds(
    scene: Scene,
    state: RayState,
    pass_seed,
    bounces: int,
    sort_rays: bool,
) -> jnp.ndarray:
    """Per-bounce ENTERING live bounds of a full (uncompacted) trace — the
    calibration input for config.live_schedule. Replicates the bound
    recurrence of the scheduled path: the bound tightens to the exact live
    count after each sorted bounce (a live-first sort parks dead rays last)
    and carries over unsorted ones."""
    sort_rays = sort_rays and reorder_is_useful(scene)
    sort_depth = scene.config.sort_depth or bounces
    R = state.origin.shape[0]
    bound = jnp.int32(R)
    bounds = []
    for bounce in range(bounces):
        bounds.append(bound)
        state, _ = process_rays_tiled(scene, state, pass_seed, bounce)
        if sort_rays and bounce + 1 != bounces and bounce < sort_depth:
            state = reorder_rays(scene, state)
            if sort_chunk_size(R) == R:
                alive = jnp.any(state.transmitted != 0.0, axis=-1)
                bound = jnp.sum(alive).astype(jnp.int32)
    return jnp.stack(bounds)


@jax.custom_vjp
def _unsort_by_ray_id(collected: jnp.ndarray, ray_id: jnp.ndarray) -> jnp.ndarray:
    """collected rows restored to ray-id order.

    Reordering is chunk-local (SORT_CHUNK), so chunk c always holds exactly
    the ids [base + c*cs, base + (c+1)*cs) — base is 0 for whole-pass
    wavefronts and the block offset for pipeline._render_block — and the
    unsort is a per-chunk argsort + gather. The custom VJP exploits that
    ids are a within-chunk permutation: backward is a plain per-chunk
    gather by the chunk-local ids — where XLA's autodiff of a gather emits
    a scatter-add tree (~16 ms at R=131k vs ~1.5 ms for the gather)."""
    R = ray_id.shape[0]
    cs = sort_chunk_size(R)
    if cs == R:
        return collected[jnp.argsort(ray_id)]
    nc = R // cs
    order = jnp.argsort(ray_id.reshape(nc, cs), axis=1)
    out = jnp.take_along_axis(
        collected.reshape(nc, cs, collected.shape[1]), order[:, :, None], axis=1
    )
    return out.reshape(R, collected.shape[1])


def _unsort_fwd(collected, ray_id):
    return _unsort_by_ray_id(collected, ray_id), ray_id


def _unsort_bwd(ray_id, g):
    R = ray_id.shape[0]
    cs = sort_chunk_size(R)
    if cs == R:
        # Subtract the base so non-zero-based blocks (_render_block's
        # ray_id = block_lo + arange) stay in range — a raw g[ray_id]
        # would clamp out-of-range ids and silently corrupt gradients.
        return g[ray_id - ray_id.min()], None
    nc = R // cs
    ids = ray_id.reshape(nc, cs)
    local = ids - ids.min(axis=1, keepdims=True)
    dg = jnp.take_along_axis(g.reshape(nc, cs, g.shape[1]), local[:, :, None], axis=1)
    return dg.reshape(R, g.shape[1]), None


_unsort_by_ray_id.defvjp(_unsort_fwd, _unsort_bwd)


def accumulate_radiance(
    state: RayState,
    rays_per_pixel: int,
    num_pixels: int,
    ordered: bool = False,
) -> jnp.ndarray:
    """Per-pixel radiance sums from a (possibly reordered) wavefront.

    The TPU-native form of the reference's atomicAdd accumulate kernel
    (raytracing.cu:96-107). Ray ids are a permutation of arange(R): sorting
    by id restores pixel-major order, after which per-pixel accumulation is
    a plain reshape-sum — measured ~5x cheaper than a scattered-id
    segment_sum tree at R=131k. ``ordered=True`` (wavefront never
    reordered) skips the unsort entirely."""
    collected = state.collected
    if not ordered:
        collected = _unsort_by_ray_id(collected, state.ray_id)
    return collected.reshape(num_pixels, rays_per_pixel, 3).sum(axis=1)


def wavefront_ordered(scene: Scene, sort_rays: bool, bounces: int) -> bool:
    """True when trace_wavefront will never physically reorder the rays —
    the accumulator can then skip the by-ray-id unsort."""
    return not (
        sort_rays
        and reorder_is_useful(scene)
        and bounces > 1
        and (scene.config.sort_depth or bounces) > 0
    )


def make_initial_state(
    scene: Scene, ray_id: jnp.ndarray, rays_per_pixel: int, pass_seed
) -> RayState:
    origin, direction = camera_ops.generate_rays(
        scene.camera, scene.config.width, rays_per_pixel, ray_id, pass_seed
    )
    rays = ray_id.shape[0]
    return RayState(
        origin=origin,
        direction=direction,
        transmitted=jnp.ones((rays, 3), jnp.float32),
        collected=jnp.zeros((rays, 3), jnp.float32),
        ray_id=ray_id.astype(jnp.int32),
    )
