"""Pallas TPU kernel for the packet-intersector tile cull (phase A).

Grid over 128-ray tiles: each step slab-tests its rays against every
cluster AABB and ORs the hits over the tile's lanes, emitting one (1, K)
row of the tile×cluster mask. Blocks are auto-pipelined by Mosaic; the
cluster AABB table (8, K) stays VMEM-resident across the whole grid.

Replaces the XLA chunked cull (ops/packet_intersect._cull_tile_mask via
lax.map), whose per-chunk loop overhead dominates the actual slab math —
the point is to make small clusters (large K) affordable, which is where
the triangle-test savings live.

Semantics match the XLA cull exactly: branchless Tavian slab test with a
[0, tmax] window (reference ray_aabb_intersection, scene.cu:107-132) and
the same safe-inverse-direction convention (ops/traverse._safe_inv_dir);
dead rays carry tmax < 0, rejecting every box.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Entry value for (tile, cluster) pairs no ray in the tile can hit.
MISS_ENTRY = 1e30


def _cull_kernel(rays_ref, window_ref, aabb_ref, entry_ref):
    """rays (1, 8, L): rows [o xyz, d xyz, -, -], lanes padded to L >= tile;
    window (1, 1, tile) tmax; aabb (8, K): rows [min xyz, max xyz, -, -];
    out entry (1, 1, K) — min slab entry over the tile's rays, 1e30 where
    no ray hits the box (a hit mask is `entry < MISS_ENTRY`)."""
    tile = window_ref.shape[2]
    K = aabb_ref.shape[1]
    raysT = rays_ref[0][:, :tile].T  # (tile, 8)
    tmax0 = window_ref[0].reshape(tile, 1)

    tmin_run = jnp.zeros((tile, K), jnp.float32)
    tmax_run = jnp.broadcast_to(tmax0, (tile, K))
    tiny = jnp.float32(1e-30)
    huge = jnp.float32(1e30)
    for axis in range(3):
        o = raysT[:, axis:axis + 1]
        d = raysT[:, 3 + axis:4 + axis]
        small = jnp.abs(d) < tiny
        inv = jnp.where(
            small,
            jnp.where(d < 0, -huge, huge),
            1.0 / jnp.where(small, 1.0, d),
        )
        lo = aabb_ref[axis:axis + 1, :]  # (1, K)
        hi = aabb_ref[3 + axis:4 + axis, :]
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        tmin_run = jnp.minimum(jnp.maximum(t1, tmin_run), jnp.maximum(t2, tmin_run))
        tmax_run = jnp.maximum(jnp.minimum(t1, tmax_run), jnp.minimum(t2, tmax_run))
    hit = tmin_run <= tmax_run  # (tile, K)
    entry = jnp.where(hit, tmin_run, jnp.float32(MISS_ENTRY))
    entry_ref[0] = jnp.min(entry, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cull_tiles(
    rays_tiles: jnp.ndarray,  # (T + 1, 8, tile) f32 (dummy row unused here)
    window: jnp.ndarray,  # (T, tile) f32 per-ray tmax (negative = dead)
    aabb: jnp.ndarray,  # (8, K) f32 — rows [min xyz, max xyz, 0, 0]
    interpret: bool = False,
) -> jnp.ndarray:
    """→ (T, K) f32 tile×cluster slab entry distance (min over the tile's
    rays); MISS_ENTRY where no ray hits, so a hit mask is
    ``cull_tiles(...) < MISS_ENTRY``."""
    T, tile = window.shape
    lanes = rays_tiles.shape[2]
    K = aabb.shape[1]
    entry = pl.pallas_call(
        _cull_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 8, lanes), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, K), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 1, K), jnp.float32),
        interpret=interpret,
    )(rays_tiles, window.reshape(T, 1, tile), aabb)
    return entry.reshape(T, K)
