"""Sharded rendering and training over a device mesh (shard_map + psum).

Parallel decomposition (SURVEY §5.8):
  * rays sharded on the leading axis — contiguous blocks, so a shard's rays
    cover contiguous pixel spans (pixel-major ray layout);
  * scene / BVH / materials replicated per device (the reference's read-only
    broadcast pattern);
  * framebuffer accumulation = local segment_sum + ``psum`` over the ray
    axis — the TPU-native form of the reference's atomicAdd accumulate
    kernel (raytracing.cu:96-107), riding ICI instead of L2 atomics;
  * gradients: differentiating through shard_map turns the psum'd loss into
    replicated parameter gradients — the all-reduce XLA inserts is the
    overlap-friendly equivalent of a gradient bucket all-reduce.

Everything works identically on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), a single host's chips, or a
multi-host pod slice brought up via parallel/mesh.initialize_distributed.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from cuda_raytracer_tpu.models.scene import Scene
from cuda_raytracer_tpu.parallel.mesh import RAY_AXIS
from cuda_raytracer_tpu.render import wavefront
from cuda_raytracer_tpu.render.diff import SceneParams, merge_params, split_params


def _padded_ray_count(total_rays: int, n_devices: int) -> int:
    return -(-total_rays // n_devices) * n_devices


def _trace_block(
    scene: Scene,
    ray_id: jnp.ndarray,
    total_rays: int,
    rays_per_pixel: int,
    pass_seed,
    bounces: int,
    sort_rays: bool,
    reparam: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trace one device's ray block → (full-size local framebuffer, local
    suspect count). Accumulation is a segment_sum over stable ray ids, so it
    is invariant to any physical reordering the wavefront applied."""
    valid = ray_id < total_rays
    ray_id_safe = jnp.where(valid, ray_id, 0)
    state = wavefront.make_initial_state(scene, ray_id_safe, rays_per_pixel, pass_seed)
    # Kill padding lanes: transmitted 0 → dead from the start, contribute 0.
    state = state._replace(
        transmitted=state.transmitted * valid[:, None].astype(jnp.float32)
    )
    state, suspect = wavefront.trace_wavefront(
        scene, state, pass_seed, bounces, sort_rays, reparam=reparam
    )
    local = jax.ops.segment_sum(
        state.collected,
        state.ray_id // rays_per_pixel,
        num_segments=scene.num_pixels,
    )
    return local, suspect


def render_pass_sharded(
    scene: Scene,
    mesh: Mesh,
    rays_per_pixel: int,
    pass_seed,
    bounces: Optional[int] = None,
    sort_rays: Optional[bool] = None,
    reparam: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One pass over every pixel, rays sharded across the mesh. Returns the
    replicated (raw-sum framebuffer (pixels, 3), suspect-ray count) — the
    suspect count is psum'd over the mesh like the framebuffer."""
    cfg = scene.config
    bounces = cfg.bounces if bounces is None else bounces
    sort_rays = cfg.sort_rays if sort_rays is None else sort_rays
    total_rays = scene.num_pixels * rays_per_pixel
    n_dev = mesh.devices.size
    padded = _padded_ray_count(total_rays, n_dev)
    ray_id = jnp.arange(padded, dtype=jnp.int32)

    def block_fn(scene_block, ray_id_block, seed):
        local, suspect = _trace_block(
            scene_block,
            ray_id_block,
            total_rays,
            rays_per_pixel,
            seed[0],
            bounces,
            sort_rays,
            reparam,
        )
        return jax.lax.psum(local, RAY_AXIS), jax.lax.psum(suspect, RAY_AXIS)

    sharded = shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P()),
        out_specs=(P(), P()),
    )
    return sharded(scene, ray_id, jnp.asarray([pass_seed], jnp.uint32))


@partial(
    jax.jit,
    static_argnames=("mesh", "rays_per_pixel", "bounces", "sort_rays", "reparam"),
)
def _render_pass_sharded_jit(
    scene: Scene,
    mesh: Mesh,
    rays_per_pixel: int,
    pass_seed: jnp.ndarray,
    bounces: int,
    sort_rays: bool,
    reparam: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return render_pass_sharded(
        scene, mesh, rays_per_pixel, pass_seed, bounces, sort_rays, reparam
    )


def render_framebuffer_sharded(scene: Scene, mesh: Mesh) -> jnp.ndarray:
    """Full multi-pass sharded render (the distributed form of
    render/pipeline.render_framebuffer). Enforces the closest-hit exactness
    certificate after the pass loop, like the single-device pipeline."""
    cfg = scene.config
    framebuffer = jnp.zeros((scene.num_pixels, 3), jnp.float32)
    suspect_total = jnp.zeros((), jnp.int32)
    remaining = cfg.rays_per_pixel
    while remaining:
        chunk = min(remaining, cfg.max_rays_per_pixel_per_pass)
        remaining -= chunk
        contribution, suspect = _render_pass_sharded_jit(
            scene,
            mesh,
            chunk,
            jnp.uint32(remaining),
            cfg.bounces,
            cfg.sort_rays,
        )
        framebuffer = framebuffer + contribution
        suspect_total = suspect_total + suspect
    suspects = int(suspect_total)
    if suspects:
        raise RuntimeError(
            f"closest-hit exactness certificate failed: {suspects} suspect "
            "ray-bounces (packet pair-budget overflow); raise "
            "RenderConfig.packet_cap."
        )
    return framebuffer


def sharded_loss(
    params: SceneParams,
    scene: Scene,
    mesh: Mesh,
    target: jnp.ndarray,
    rays_per_pixel: int,
    pass_seed,
    bounces: int,
    reparam: bool = False,
) -> jnp.ndarray:
    """L2 inverse-rendering loss on the psum'd framebuffer. Differentiating
    this through shard_map yields replicated parameter gradients — the
    cross-device grad all-reduce falls out of the psum's VJP.

    sort_rays follows the scene config so sharded training exercises the same
    Morton reorder/unsort path the single-chip pipeline is tuned on (the
    per-device accumulation is a ray-id segment_sum, reorder-invariant)."""
    scene = merge_params(scene, params)
    framebuffer, _suspect = render_pass_sharded(
        scene, mesh, rays_per_pixel, pass_seed,
        bounces=bounces, sort_rays=None, reparam=reparam,
    )
    radiance = framebuffer / rays_per_pixel
    return jnp.mean((radiance - target) ** 2)


def make_sharded_train_step(
    scene: Scene,
    mesh: Mesh,
    optimizer,
    rays_per_pixel: int,
    bounces: int,
    reparam: bool = False,
    live_schedule="auto",
):
    """Jitted multi-chip inverse-rendering train step:
    ``step(params, opt_state, target, seed) -> (params, opt_state, loss)``.
    This is the framework's full training step — forward wavefront render,
    backward through the bounce chain, gradient all-reduce over the mesh.

    ``live_schedule``: as diff.make_train_step — "auto" calibrates a static
    live-prefix schedule (certificate-audited single-device first; the
    divisors are ray-count-relative, so they transfer to the per-shard
    wavefronts unchanged), an explicit tuple pins one, None keeps the
    dynamic switch."""
    import dataclasses

    from cuda_raytracer_tpu.render import diff as diff_mod

    if live_schedule == "auto":
        live_schedule = diff_mod.calibrate_live_schedule(
            scene, rays_per_pixel=rays_per_pixel, bounces=bounces
        )
    if live_schedule:
        audited = scene.replace(
            config=dataclasses.replace(
                scene.config, live_schedule=tuple(live_schedule)
            )
        )
        if diff_mod.check_radiance_exact(
            audited, rays_per_pixel=rays_per_pixel, bounces=bounces
        ) == 0:
            scene = audited

    @jax.jit
    def train_step(params, opt_state, target, seed):
        loss, grads = jax.value_and_grad(sharded_loss)(
            params, scene, mesh, target, rays_per_pixel, seed, bounces, reparam
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return train_step


def scaling_report(
    scene: Scene, mesh: Mesh, rays_per_pixel: int = 4, repeats: int = 3
) -> dict:
    """Measure rays/s at 1 device vs the full mesh (the ≥85% scaling-
    efficiency acceptance metric, SURVEY §7.6)."""
    import time

    from cuda_raytracer_tpu.parallel.mesh import make_mesh

    results = {}
    for label, sub_mesh in (
        ("1dev", make_mesh(mesh.devices.ravel()[:1])),
        (f"{mesh.devices.size}dev", mesh),
    ):
        fn = lambda: _render_pass_sharded_jit(
            scene, sub_mesh, rays_per_pixel, jnp.uint32(0),
            scene.config.bounces, scene.config.sort_rays,
        )[0].block_until_ready()
        fn()  # compile
        start = time.perf_counter()
        for _ in range(repeats):
            fn()
        dt = (time.perf_counter() - start) / repeats
        results[label] = scene.num_pixels * rays_per_pixel / dt
    n = mesh.devices.size
    results["scaling_efficiency"] = results[f"{n}dev"] / (n * results["1dev"])
    return results
