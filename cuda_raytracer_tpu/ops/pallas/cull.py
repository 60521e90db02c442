"""Pallas TPU kernel for the packet-intersector tile cull (phase A).

Grid over ray tiles: each step slab-tests its rays against every cluster
AABB and ORs the hits over the tile's lanes, emitting one (1, K) row of the
tile×cluster entry matrix. Blocks are auto-pipelined by Mosaic; the cluster
AABB table (8, K) stays VMEM-resident across the whole grid.

Ray layout: component-row tiles (T + 1, 8, L): row c holds component c
(ox oy oz dx dy dz tmax pad) of the tile's rays on lanes, L padded to 128.
Built caller-side by stacking per-component reshapes (no transpose op); the
per-ray search window rides row 6, so re-culls with a tightened window need
no separate operand.

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


def _slab_entry_mask(rays, tmax0, lo_cols, hi_cols, tile, n_words):
    """Shared slab-test body: the tile's rays against one column range of
    the box table → (entry row (1, k), packed per-ray hit words (W, k) or
    None). ``lo_cols``/``hi_cols``: (3,) tuples of (1, k) rows."""
    k = lo_cols[0].shape[1]
    tmin_run = jnp.zeros((tile, k), jnp.float32)
    tmax_run = jnp.broadcast_to(tmax0, (tile, k))
    tiny = jnp.float32(1e-30)
    huge = jnp.float32(1e30)
    for axis in range(3):
        o = rays[:, axis:axis + 1]
        d = rays[:, 3 + axis:4 + axis]
        small = jnp.abs(d) < tiny
        inv = jnp.where(
            small,
            jnp.where(d < 0, -huge, huge),
            1.0 / jnp.where(small, 1.0, d),
        )
        t1 = (lo_cols[axis] - o) * inv
        t2 = (hi_cols[axis] - o) * inv
        tmin_run = jnp.minimum(jnp.maximum(t1, tmin_run), jnp.maximum(t2, tmin_run))
        tmax_run = jnp.maximum(jnp.minimum(t1, tmax_run), jnp.minimum(t2, tmax_run))
    hit = tmin_run <= tmax_run  # (tile, k)
    entry = jnp.min(
        jnp.where(hit, tmin_run, jnp.float32(MISS_ENTRY)), axis=0, keepdims=True
    )
    if n_words is None:
        return entry, None
    # Bit-pack the (tile, k) hit mask along the ray (sublane) axis: hit
    # bits are disjoint powers of two per 32-row band, so an int32 SUM
    # over the band is exactly the bitwise OR.
    ray = jax.lax.broadcasted_iota(jnp.int32, (tile, k), 0)
    shifted = jax.lax.shift_left(hit.astype(jnp.int32), ray & 31)
    words = jnp.concatenate(
        [
            jnp.sum(shifted[32 * w : 32 * (w + 1)], axis=0, keepdims=True)
            for w in range(n_words)
        ],
        axis=0,
    )
    return entry, words


def _cull_kernel(rays_ref, aabb_ref, entry_ref, *mask_out, tile):
    """rays (1, 8, L): component rows [ox oy oz dx dy dz tmax pad], lanes
    padded to L >= tile; aabb (8, K): rows [min xyz, max xyz, -, -];
    out entry (1, K) — min slab entry over the tile's rays, 1e30 where
    no ray hits the box (a hit mask is `entry < MISS_ENTRY`).

    With a second output ref (1, W, K) int32 (W = ceil(tile/32)), also
    emits the per-ray hit BITMASK: bit r of word w is set iff ray
    32w + r of the tile slab-hits the cluster — the fused kernel's
    per-ray early-out needs to know *which* rays demanded each pair,
    not just the tile-level OR (a single never-hit ray in the tile
    otherwise pins every pair; see fused._fused_kernel_resident)."""
    rays = rays_ref[0][:, :tile].T  # (tile, 8)
    tmax0 = rays[:, 6:7]
    lo_cols = tuple(aabb_ref[a:a + 1, :] for a in range(3))
    hi_cols = tuple(aabb_ref[3 + a:4 + a, :] for a in range(3))
    n_words = mask_out[0].shape[1] if mask_out else None
    entry, words = _slab_entry_mask(rays, tmax0, lo_cols, hi_cols, tile, n_words)
    entry_ref[0] = entry
    if mask_out:
        mask_out[0][0] = words


# Sub-box columns per gated chunk of the hierarchical cull — one full lane
# width, the granularity Mosaic slices statically without relayouts.
GATE_CHUNK = 128


def _cull_kernel_gated(gates_ref, rays_ref, aabb_ref, entry_ref, *mask_out,
                       tile):
    """Chunk-gated variant of ``_cull_kernel`` for the hierarchical cull.

    ``gates_ref`` (scalar prefetch, SMEM): flat (T * Wg,) int32 — kept 1-D
    because 2-D SMEM prefetch operands are lane-padded to 128 words/row
    (4 MB at T=8192 vs the v5e's 1 MB SMEM; hardware-verified OOM). Bit i
    of word t * Wg + i // 32 is set iff chunk i (sub-box columns
    [128i, 128(i+1))) of tile t
    can be hit by some ray of tile t, per the super-AABB pre-pass
    (cull_tiles pass 1 in packet_intersect). Ungated chunks write
    MISS_ENTRY / zero masks, which is exactly what the flat kernel
    computes for them (the gate is conservative), so outputs are
    bit-equal to ``_cull_kernel``'s."""
    t = pl.program_id(0)
    K = aabb_ref.shape[1]
    assert K % GATE_CHUNK == 0, K
    rays = rays_ref[0][:, :tile].T  # (tile, 8)
    tmax0 = rays[:, 6:7]
    n_words = mask_out[0].shape[1] if mask_out else None
    Wg = -(-(K // GATE_CHUNK) // 32)
    for i in range(K // GATE_CHUNK):
        sl = slice(i * GATE_CHUNK, (i + 1) * GATE_CHUNK)
        bit = (gates_ref[t * Wg + i // 32] >> (i % 32)) & 1

        @pl.when(bit != 0)
        def _(sl=sl):
            lo_cols = tuple(aabb_ref[a:a + 1, sl] for a in range(3))
            hi_cols = tuple(aabb_ref[3 + a:4 + a, sl] for a in range(3))
            entry, words = _slab_entry_mask(
                rays, tmax0, lo_cols, hi_cols, tile, n_words
            )
            entry_ref[0, 0:1, sl] = entry
            if mask_out:
                mask_out[0][0, :, sl] = words

        @pl.when(bit == 0)
        def _(sl=sl):
            entry_ref[0, 0:1, sl] = jnp.full(
                (1, GATE_CHUNK), MISS_ENTRY, jnp.float32
            )
            if mask_out:
                mask_out[0][0, :, sl] = jnp.zeros(
                    (n_words, GATE_CHUNK), jnp.int32
                )


@functools.partial(jax.jit, static_argnames=("tile", "interpret", "with_mask"))
def cull_tiles(
    od8: jnp.ndarray,  # (T + 1, 8, L) f32 component-row tiles (dummy row T unused)
    aabb: jnp.ndarray,  # (8, K) f32 — rows [min xyz, max xyz, 0, 0]
    tile: int,
    interpret: bool = False,
    with_mask: bool = False,
):
    """→ (T, K) f32 tile×cluster slab entry distance (min over the tile's
    rays); MISS_ENTRY where no ray hits, so a hit mask is
    ``cull_tiles(...) < MISS_ENTRY``.

    ``with_mask=True`` returns (entry, maskw) where maskw is the
    (T, W, K) int32 per-ray hit bitmask (W = ceil(tile/32); bit r of
    word w ⇔ ray 32w + r hits) consumed by the fused kernel's per-ray
    slab-entry early-out."""
    T = od8.shape[0] - 1
    K = aabb.shape[1]
    L = od8.shape[2]
    W = -(-tile // 32)
    out_shape = [jax.ShapeDtypeStruct((T, 1, K), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, 1, K), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
    ]
    if with_mask:
        out_shape.append(jax.ShapeDtypeStruct((T, W, K), jnp.int32))
        out_specs.append(
            pl.BlockSpec((1, W, K), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        functools.partial(_cull_kernel, tile=tile),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 8, L), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs) if with_mask else out_specs[0],
        out_shape=tuple(out_shape) if with_mask else out_shape[0],
        interpret=interpret,
    )(od8, aabb)
    if with_mask:
        entry, maskw = out
        return entry.reshape(T, K), maskw
    return out.reshape(T, K)


@functools.partial(jax.jit, static_argnames=("tile", "interpret", "with_mask"))
def cull_tiles_gated(
    od8: jnp.ndarray,  # (T + 1, 8, L) f32 component-row tiles (dummy row T unused)
    aabb: jnp.ndarray,  # (8, Kp) f32, Kp % GATE_CHUNK == 0
    gates: jnp.ndarray,  # flat (T * Wg,) int32 — bit i of word t*Wg + i//32: chunk i of tile t live
    tile: int,
    interpret: bool = False,
    with_mask: bool = False,
):
    """Hierarchical-cull main pass: like ``cull_tiles`` but each tile only
    slab-tests the 128-column chunks whose gate bit is set (the super-AABB
    pre-pass proves the rest can't hit). Bit-equal outputs to
    ``cull_tiles`` on the same table — ungated chunks are all-miss by
    construction. The box table must be padded to a multiple of
    GATE_CHUNK (pad with far-away point boxes, models/cluster.split_aabbs
    convention)."""
    T = od8.shape[0] - 1
    Kp = aabb.shape[1]
    L = od8.shape[2]
    if Kp % GATE_CHUNK:
        raise ValueError(f"gated cull table width {Kp} % {GATE_CHUNK} != 0")
    Wg = -(-(Kp // GATE_CHUNK) // 32)
    if gates.shape != (T * Wg,):
        raise ValueError(
            f"gates must be flat (T * Wg,) = ({T} * {Wg},) int32 words "
            f"(bit i of word t*Wg + i//32 gates chunk i of tile t); got "
            f"shape {gates.shape}"
        )
    W = -(-tile // 32)
    out_shape = [jax.ShapeDtypeStruct((T, 1, Kp), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, 1, Kp), lambda t, g: (t, 0, 0), memory_space=pltpu.VMEM)
    ]
    if with_mask:
        out_shape.append(jax.ShapeDtypeStruct((T, W, Kp), jnp.int32))
        out_specs.append(
            pl.BlockSpec((1, W, Kp), lambda t, g: (t, 0, 0), memory_space=pltpu.VMEM)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 8, L), lambda t, g: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Kp), lambda t, g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs) if with_mask else out_specs[0],
    )
    out = pl.pallas_call(
        functools.partial(_cull_kernel_gated, tile=tile),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape) if with_mask else out_shape[0],
        interpret=interpret,
    )(gates, od8, aabb)
    if with_mask:
        entry, maskw = out
        return entry.reshape(T, Kp), maskw
    return out.reshape(T, Kp)
