"""Device-mesh construction for ray-parallel SPMD.

The natural parallel axis of a path tracer is rays: every ray is independent
until the framebuffer reduction. We shard the ray axis over a 1-D mesh named
``"rays"`` (spanning all chips — within a host this rides ICI), replicate the
scene + BVH on every device (the reference's read-only __constant__/global
broadcast pattern, raytracing.cu:19), and reduce framebuffers/gradients with
``psum`` collectives.

For multi-host pods, ``initialize_distributed`` wires ``jax.distributed`` so
the same mesh spans hosts; the code paths are identical — XLA routes the
collectives over ICI/DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

RAY_AXIS = "rays"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name "rays"."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for per-ray state."""
    return NamedSharding(mesh, PartitionSpec(RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (scene, BVH, materials, framebuffer)."""
    return NamedSharding(mesh, PartitionSpec())


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (jax.distributed). No-op for single-process runs;
    on a pod slice each host calls this before building the mesh."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
