"""End-to-end render orchestration (reference: gpu_raytrace / cpu_raytrace,
raytracing.cu:122-284, and main's post chain, raytracing.cu:347-395).

The pass loop mirrors the reference exactly: samples are traced in batches of
at most ``max_rays_per_pixel_per_pass`` (20) rays per pixel, each pass
accumulating raw radiance sums into a persistent framebuffer — which also
makes long renders checkpointable/resumable (utils/checkpoint.py). The
framebuffer buffer is donated between passes so XLA updates it in place.

Accumulation: rays are pixel-major (ray i → pixel i // rpp), so per-pass
accumulation is one ``segment_sum`` over stable ray ids — the TPU-native form
of the reference's atomicAdd accumulate kernel (raytracing.cu:96-107).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cuda_raytracer_tpu.models.scene import Scene
from cuda_raytracer_tpu.ops import bloom as bloom_ops
from cuda_raytracer_tpu.ops import tonemap as tonemap_ops
from cuda_raytracer_tpu.render import wavefront


# Rays per traced sub-pass block. Matching wavefront.SORT_CHUNK keeps every
# block in the global-Morton-sort regime, where dead-ray compaction
# (wavefront.bounce_on_live_prefix) is active; it also bounds compile sizes
# (full-res pass graphs at 20M rays took minutes to build).
RAY_BLOCK = 1 << 18


@partial(
    jax.jit,
    static_argnames=("rays_per_pixel", "block_rays", "bounces", "sort_rays", "reparam"),
    donate_argnums=(1,),
)
def _render_block(
    scene: Scene,
    framebuffer: jnp.ndarray,  # (pixels, 3) — donated
    pass_seed: jnp.ndarray,
    block_lo: jnp.ndarray,  # () int32 — first ray id of the block
    rays_per_pixel: int,
    block_rays: int,
    bounces: int,
    sort_rays: bool,
    reparam: bool = False,
) -> tuple:
    """Trace rays [block_lo, block_lo + block_rays) and accumulate into the
    framebuffer rows they cover (blocks are whole-pixel runs)."""
    from cuda_raytracer_tpu.ops.pallas import shade

    ray_id = block_lo + jnp.arange(block_rays, dtype=jnp.int32)
    block_pixels = block_rays // rays_per_pixel
    if shade.megakernel_eligible(scene, reparam):
        # Whole-pass bounce megakernel (brute scenes, constant sky): camera
        # gen + all bounces in one Pallas launch with per-tile dead-ray
        # skipping — the wavefront path below cannot skip dead rays without
        # a physical sort that costs more than the bounce it saves.
        collected = shade.shade_trace(
            scene, ray_id, rays_per_pixel, pass_seed, bounces,
            interpret=jax.default_backend() != "tpu",
        )
        contribution = collected.reshape(
            block_pixels, rays_per_pixel, 3
        ).sum(axis=1)
        suspect = jnp.zeros((), jnp.int32)  # brute path is exact by design
    else:
        state = wavefront.make_initial_state(
            scene, ray_id, rays_per_pixel, pass_seed
        )
        state, suspect = wavefront.trace_wavefront(
            scene, state, pass_seed, bounces, sort_rays, reparam=reparam
        )
        contribution = wavefront.accumulate_radiance(
            state, rays_per_pixel, block_pixels,
            ordered=wavefront.wavefront_ordered(scene, sort_rays, bounces),
        )
    px_lo = block_lo // rays_per_pixel
    current = jax.lax.dynamic_slice(
        framebuffer, (px_lo, 0), (block_pixels, 3)
    )
    framebuffer = jax.lax.dynamic_update_slice(
        framebuffer, current + contribution, (px_lo, 0)
    )
    return framebuffer, suspect


def _regime_scene(scene: Scene, rays_per_pixel: int) -> Scene:
    """Resolve packet_backend "auto" per PASS regime.

    Production multi-sample passes (≥ 10 rays/pixel traced together, e.g.
    the reference's 20-spp chunks) carry strong per-pixel primary coherence
    and long dead tails inside each ray block — there the single-program
    fused1 kernel (in-kernel gated cull, whole-tile dead early-out, no
    (T, K) HBM tables) measured fastest on v5e (teapot 1000² 10 spp: 2.62 s
    vs 2.96 s 3-stage, bit-equal — SCAN_r04 ab_fullres). Sparse-sample
    shapes (training steps, low-spp renders) keep the 3-stage fused path
    (77.6 vs 78.3 ms on the bench grad step), and so do scenes whose block
    table splits into 3+ VMEM shards — each fused1 shard re-runs the
    in-kernel cull over every ray tile, and on lamp (~28 MB of blocks)
    that measured 4.65 vs 4.39 s. Explicit packet_backend values are never
    overridden."""
    import dataclasses

    cfg = scene.config
    if (
        cfg.packet_backend == "auto"
        and rays_per_pixel >= 10
        and cfg.cull_split == 1
        and scene.cluster_blocks.size * 4 <= (16 << 20)
        and jax.default_backend() == "tpu"
    ):
        return scene.replace(
            config=dataclasses.replace(cfg, packet_backend="fused1")
        )
    return scene


def render_pass(
    scene: Scene,
    framebuffer: jnp.ndarray,  # (pixels, 3) raw accumulated sums — donated
    pass_seed: jnp.ndarray,  # () uint32 — the reference's `remaining_rays`
    rays_per_pixel: int,
    bounces: int,
    sort_rays: bool,
    reparam: bool = False,
) -> tuple:
    """Trace one pass of ``rays_per_pixel`` samples for every pixel and
    accumulate into the framebuffer, in sub-blocks of ≤ RAY_BLOCK rays (each
    a whole-pixel run, so per-pixel sums are bit-identical to one full-width
    trace; per-(ray, bounce) RNG seeds depend only on stable ray ids).

    Returns (framebuffer, suspect): ``suspect`` is the pass's closest-hit
    exactness certificate (wavefront.trace_wavefront) — the number of rays
    whose intersection result could not be certified exact (packet-intersector
    pair-budget overflow). render_framebuffer fails loudly on nonzero."""
    from cuda_raytracer_tpu.ops.pallas import shade

    pixels = framebuffer.shape[0]
    total = pixels * rays_per_pixel
    scene = _regime_scene(scene, rays_per_pixel)
    if shade.megakernel_eligible(scene, reparam):
        # One dispatch per pass: the megakernel's compiled graph is
        # grid-size-independent (no (rays × prims) intermediates, no sort
        # chunks), and simple-scene renders are HOST-dispatch-bound, not
        # device-bound — PROFILE_r05-mk measured 0.29 s device-busy against
        # 2.5 s wall at 380 RAY_BLOCK dispatches (~5 ms tunnel floor each).
        block = total
    else:
        block = max(
            rays_per_pixel, (RAY_BLOCK // rays_per_pixel) * rays_per_pixel
        )
    suspect = jnp.zeros((), jnp.int32)
    lo = 0
    while lo + block <= total:
        framebuffer, s = _render_block(
            scene, framebuffer, pass_seed, jnp.int32(lo),
            rays_per_pixel, block, bounces, sort_rays, reparam,
        )
        suspect = suspect + s
        lo += block
    if lo < total:
        framebuffer, s = _render_block(
            scene, framebuffer, pass_seed, jnp.int32(lo),
            rays_per_pixel, total - lo, bounces, sort_rays, reparam,
        )
        suspect = suspect + s
    return framebuffer, suspect


def render_framebuffer(
    scene: Scene,
    progress: Optional[Callable[[int, int], None]] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1,
    metrics=None,
    auto_retry: bool = True,
) -> jnp.ndarray:
    """Full multi-pass render → raw accumulated (pixels, 3) framebuffer.
    Matches the reference pass loop (raytracing.cu:222-254): chunks of ≤20
    rays/pixel, pass seed = remaining rays after the chunk is subtracted.

    With ``checkpoint_path``, resumes from a matching checkpoint and persists
    at every ``checkpoint_every``-th pass boundary; because pass seeds derive
    from the remaining-sample count, a resumed render is bit-identical to an
    uninterrupted one (SURVEY §5.4).

    If the closest-hit exactness certificate fires (XLA-backend pair-budget
    overflow — typically tiny renders whose ray tiles span large image
    areas), the render is redone from scratch with a doubled packet cap
    (up to the exact uncapped budget) rather than shipping a possibly-wrong
    image; ``auto_retry=False`` raises instead."""
    from cuda_raytracer_tpu.utils import checkpoint as ckpt

    cfg = scene.config
    framebuffer = jnp.zeros((scene.num_pixels, 3), jnp.float32)
    remaining = cfg.rays_per_pixel
    fingerprint = None
    suspect_total = jnp.zeros((), jnp.int32)
    if checkpoint_path is not None:
        fingerprint = ckpt.scene_fingerprint(scene)
        restored = ckpt.load_checkpoint(checkpoint_path, fingerprint)
        if restored is not None:
            fb_np, samples_done, suspects_done = restored
            framebuffer = jnp.asarray(fb_np)
            remaining = cfg.rays_per_pixel - samples_done
            # Re-enforce the certificate over the passes we are NOT
            # re-running: without this, resuming a render whose earlier
            # passes overflowed would launder the suspect count to zero.
            suspect_total = suspect_total + jnp.int32(suspects_done)

    passes_done = 0
    while remaining:
        chunk = min(remaining, cfg.max_rays_per_pixel_per_pass)
        remaining -= chunk
        framebuffer, suspect = render_pass(
            scene,
            framebuffer,
            jnp.uint32(remaining),
            rays_per_pixel=chunk,
            bounces=cfg.bounces,
            sort_rays=cfg.sort_rays,
        )
        suspect_total = suspect_total + suspect
        passes_done += 1
        if checkpoint_path is not None and (
            passes_done % checkpoint_every == 0 or not remaining
        ):
            framebuffer.block_until_ready()
            # int() costs no extra sync: the block_until_ready + host copy
            # above already round-trip the device at this boundary.
            ckpt.save_checkpoint(
                checkpoint_path,
                np.asarray(framebuffer),
                cfg.rays_per_pixel - remaining,
                fingerprint,
                suspects=int(suspect_total),
            )
        if metrics is not None:
            metrics.record("samples_done", cfg.rays_per_pixel - remaining)
        if progress is not None:
            framebuffer.block_until_ready()
            progress(cfg.rays_per_pixel - remaining, cfg.rays_per_pixel)
    # Enforce the exactness certificate once, after the pass loop (a single
    # device sync instead of one per pass). A nonzero count means some rays'
    # closest hits may have been silently dropped by a packet-intersector
    # pair-budget overflow — fail loudly like the reference's CUDA_CHECK
    # (common.cuh:10-18) instead of shipping a subtly wrong image.
    suspects = int(suspect_total)
    if metrics is not None:
        metrics.record("suspect_rays", suspects)
    if suspects:
        import dataclasses
        import warnings

        if auto_retry and cfg.live_schedule:
            # A stale static live-prefix schedule (config.live_schedule)
            # reports unprocessed live rays through the same certificate;
            # drop the schedule and re-render before touching the packet cap.
            warnings.warn(
                f"closest-hit certificate flagged {suspects} suspect "
                "ray-bounces with a static live_schedule set; re-rendering "
                "with the dynamic live-prefix switch"
            )
            retry = scene.replace(
                config=dataclasses.replace(cfg, live_schedule=())
            )
            return render_framebuffer(
                retry, progress=progress, checkpoint_path=checkpoint_path,
                checkpoint_every=checkpoint_every, metrics=metrics,
                auto_retry=auto_retry,
            )
        cap = cfg.packet_cap
        if auto_retry and cap < scene.num_clusters:
            new_cap = min(max(cap * 2, 8), scene.num_clusters)
            warnings.warn(
                f"closest-hit certificate flagged {suspects} suspect "
                f"ray-bounces; re-rendering with packet_cap {cap} → {new_cap}"
            )
            retry = scene.replace(
                config=dataclasses.replace(cfg, packet_cap=new_cap)
            )
            return render_framebuffer(
                retry, progress=progress, checkpoint_path=checkpoint_path,
                checkpoint_every=checkpoint_every, metrics=metrics,
            )
        raise RuntimeError(
            f"closest-hit exactness certificate failed: {suspects} suspect "
            "ray-bounces (packet pair-budget overflow). Raise "
            "RenderConfig.packet_cap (XLA backend) or lower cluster size to "
            "shrink per-tile cluster unions (Pallas backend)."
        )
    return framebuffer


def render_image(
    scene: Scene, apply_bloom: bool = True, framebuffer: Optional[jnp.ndarray] = None
) -> np.ndarray:
    """Render to an (H, W, 3) uint8 image: pass loop → optional bloom on the
    raw sums → exposure/tonemap/sRGB (reference main, raytracing.cu:347-395)."""
    cfg = scene.config
    if framebuffer is None:
        framebuffer = render_framebuffer(scene)
    image = framebuffer.reshape(cfg.height, cfg.width, 3)
    if apply_bloom:
        image = bloom_ops.apply_bloom(image, cfg.rays_per_pixel)
    display = tonemap_ops.tonemap(image, cfg.exposure, cfg.rays_per_pixel)
    return np.asarray(tonemap_ops.to_bytes(display))


def render_timed(scene: Scene) -> tuple:
    """Render with the reference's timing scope (trace phase only — excludes
    BVH build and image output, raytracing.cu:172,279-281).

    Returns (uint8 image, trace_seconds)."""
    start = time.perf_counter()
    framebuffer = render_framebuffer(scene)
    framebuffer.block_until_ready()
    elapsed = time.perf_counter() - start
    return render_image(scene, framebuffer=framebuffer), elapsed
