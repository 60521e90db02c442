"""Pallas TPU kernel for the packet-intersector MT sweep (phases C+D).

One Pallas program owns the whole sweep: it walks the compacted
(tile, cluster) pair list with a double-buffered HBM→VMEM DMA pipeline
(pair ids staged through SMEM in chunks), runs the dense Möller–Trumbore of
each 128-ray tile against its cluster's (16, C) block on the VPU, and folds
results straight into per-tile (t, tri) accumulators resident in VMEM.

Why a hand-written kernel instead of the XLA while_loop (packet_intersect's
phase C): XLA pays ~165 µs of loop/gather/scatter overhead per 64-pair
iteration (measured v5e; 4.2 µs/pair against 1.53 µs/pair of pure compute),
and needs (T·cap, tile) candidate buffers plus a separate reduction pass.
Here pairs are processed in groups of ``GROUP``: one DMA wave and one
straight-line unrolled compute block per group, so the scalar-core loop
and semaphore costs amortise across the group; the reduction is a
register-resident read-modify-write of the output row — no candidate
buffers at all.

Sentinel pairs (the tail of the static pair list past ``total``) carry
tile id T and cluster 0: they compute garbage against a zero ray tile and
fold it into a dummy output row that the caller slices off — branch-free
tail handling.

Reference semantics covered: closest-triangle-hit with epsilon 0.005 over
the BVH-cut cluster blocks (scene.cu:134-241); ties broken toward the larger
triangle index (matches ops/packet_intersect phase D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIT_EPS = 0.005
MISS = 1e30

# Pair ids staged into SMEM in chunks of this many pairs.
PAIR_CHUNK = 512
# Pairs fetched and computed per inner step (one DMA wave, unrolled compute).
GROUP = 8


# Lane width of one MT compute slice. The full (tile, C) expression holds
# ~20 live intermediates — at C=1024 that is thousands of VREGs, which the
# register allocator spills to VMEM. Slicing C bounds the live set to what
# actually fits in vector registers (XLA's fusion tiles the same way).
MT_SLICE = 256


def _mt_t_plane(o, d, tri9):
    """The shared Möller–Trumbore t-plane: broadcast-polymorphic core used
    by BOTH the legacy sweep (_mt_pair_t: (tile,1)×(1,W) operands) and the
    fused kernel's batched form (_mt_batch: (1,tile,1)×(B,1,C)) — ONE copy
    of the arithmetic so the bit-equality the parity tests assert can never
    drift between kernels.

    o, d: 3-tuples of broadcastable origin/direction components;
    tri9: 9-tuple (p1x p1y p1z e1x e1y e1z e2x e2y e2z).
    Returns t = accepted hit distance or MISS, at the broadcast shape.
    Division-free sign-folded acceptance (see packet_intersect)."""
    ox, oy, oz = o
    dx, dy, dz = d
    p1x, p1y, p1z, e1x, e1y, e1z, e2x, e2y, e2z = tri9
    # h = d × e2
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    det = hx * e1x + hy * e1y + hz * e1z
    fx = ox - p1x
    fy = oy - p1y
    fz = oz - p1z
    ud = fx * hx + fy * hy + fz * hz
    # q = f × e1
    qx = fy * e1z - fz * e1y
    qy = fz * e1x - fx * e1z
    qz = fx * e1y - fy * e1x
    vd = dx * qx + dy * qy + dz * qz
    td = e2x * qx + e2y * qy + e2z * qz
    s = jnp.sign(det)
    ad = jnp.abs(det)
    us = ud * s
    vs = vd * s
    ts = td * s
    ok = (
        (det != 0.0) & (us >= 0.0) & (us <= ad) & (vs >= 0.0)
        & (us + vs <= ad) & (ts >= HIT_EPS * ad)
    )
    return jnp.where(ok, td / jnp.where(det == 0.0, 1.0, det), MISS)


def _mt_pair(rays: jnp.ndarray, blk: jnp.ndarray, tile: int, C: int):
    """Möller–Trumbore of one ray tile vs one cluster block.

    rays: (8, L) — rows [ox oy oz dx dy dz, -, -], lanes padded to L >= tile.
          Transposed once here to (tile, 8) so the per-component (tile, 1)
          slices broadcast against (1, C) block rows without a lane↔sublane
          shuffle per component. (The fused kernel caches this transpose per
          tile and calls _mt_pair_t directly — it costs ~0.4 µs, which
          dominates small-C pair work.)
    blk:  (16, C)   — rows [p1 e1 e2 (xyz each), tri_id, ...]
    Returns (best_t (1, tile), best_tri (1, tile) float).
    Division-free sign-folded acceptance (see packet_intersect)."""
    return _mt_pair_t(rays[:, :tile].T, blk, tile, C)


def _mt_pair_t(raysT: jnp.ndarray, blk: jnp.ndarray, tile: int, C: int):
    """_mt_pair with pre-transposed rays: raysT (tile, 8)."""
    ox = raysT[:, 0:1]
    oy = raysT[:, 1:2]
    oz = raysT[:, 2:3]
    dx = raysT[:, 3:4]
    dy = raysT[:, 4:5]
    dz = raysT[:, 5:6]

    W = min(MT_SLICE, C)
    best = jnp.full((tile, 1), MISS, jnp.float32)
    tri = jnp.full((tile, 1), -1.0, jnp.float32)
    for cs in range(0, C, W):
        sl = slice(cs, cs + W)
        p1x = blk[0, sl].reshape(1, W)
        p1y = blk[1, sl].reshape(1, W)
        p1z = blk[2, sl].reshape(1, W)
        e1x = blk[3, sl].reshape(1, W)
        e1y = blk[4, sl].reshape(1, W)
        e1z = blk[5, sl].reshape(1, W)
        e2x = blk[6, sl].reshape(1, W)
        e2y = blk[7, sl].reshape(1, W)
        e2z = blk[8, sl].reshape(1, W)
        trif = blk[9, sl].reshape(1, W)

        t = _mt_t_plane(
            (ox, oy, oz), (dx, dy, dz),
            (p1x, p1y, p1z, e1x, e1y, e1z, e2x, e2y, e2z),
        )  # (tile, W)
        m = jnp.min(t, axis=1, keepdims=True)  # (tile, 1)
        eq = t == m
        tr = jnp.max(jnp.where(eq & (t < MISS), trif, -1.0), axis=1, keepdims=True)
        upd = (m < best) | ((m == best) & (tr > tri))
        best = jnp.where(upd, m, best)
        tri = jnp.where(upd, tr, tri)
    # One sublane→lane transpose each to match the (T, tile) output rows.
    return best.reshape(1, tile), tri.reshape(1, tile)


def _sweep_kernel(
    # scalar prefetch
    total_ref,  # SMEM (1,) int32 — number of valid pairs
    # inputs (HBM; DMA'd manually)
    pairs_ref,  # (2, Pg) int32 — rows [pair_tile; pair_cluster]; sentinel
    #             pairs past `total` carry (T, 0)
    rays_ref,  # (T + 1, 8, L) f32 — row T is a zero dummy tile; L >= tile
    blocks_ref,  # (K, 16, C) f32
    # outputs (VMEM)
    t_out_ref,  # (T + 1, tile) f32 — row T collects sentinel garbage
    tri_out_ref,  # (T + 1, tile) f32
    # scratch
    pair_smem,  # SMEM (2, 2, PAIR_CHUNK) int32
    ray_buf,  # VMEM (2, GROUP, 8, L) f32
    blk_buf,  # VMEM (2, GROUP, 16, C) f32
    pair_sem,  # DMA (2,)
    ray_sem,  # DMA (2, GROUP)
    blk_sem,  # DMA (2, GROUP)
):
    T1, tile = t_out_ref.shape
    C = blk_buf.shape[3]
    total = total_ref[0]
    n_chunks = pl.cdiv(total, PAIR_CHUNK)
    groups_per_chunk = PAIR_CHUNK // GROUP

    t_out_ref[:] = jnp.full((T1, tile), MISS, jnp.float32)
    tri_out_ref[:] = jnp.full((T1, tile), -1.0, jnp.float32)

    def pair_dma(c, slot):
        return pltpu.make_async_copy(
            pairs_ref.at[:, pl.ds(c * PAIR_CHUNK, PAIR_CHUNK)],
            pair_smem.at[slot],
            pair_sem.at[slot],
        )

    def data_dma(pslot, g, slot, j):
        """DMA descriptors for pair j (0..GROUP) of group g (chunk-local)."""
        i = g * GROUP + j
        pt_i = pair_smem[pslot, 0, i]
        pc_i = pair_smem[pslot, 1, i]
        return (
            pltpu.make_async_copy(
                rays_ref.at[pt_i], ray_buf.at[slot, j], ray_sem.at[slot, j]
            ),
            pltpu.make_async_copy(
                blocks_ref.at[pc_i], blk_buf.at[slot, j], blk_sem.at[slot, j]
            ),
        )

    def start_group(pslot, g, slot):
        for j in range(GROUP):
            r, b = data_dma(pslot, g, slot, j)
            r.start()
            b.start()

    def wait_group(pslot, g, slot):
        for j in range(GROUP):
            r, b = data_dma(pslot, g, slot, j)
            r.wait()
            b.wait()

    @pl.when(n_chunks > 0)
    def _():
        pair_dma(0, 0).start()

    def outer(c, _):
        pslot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            pair_dma(c + 1, (c + 1) % 2).start()

        pair_dma(c, pslot).wait()
        # Number of groups with at least one REAL pair; sentinel-only tail
        # groups are skipped entirely (their work would be pure garbage).
        rem = jnp.minimum(total - c * PAIR_CHUNK, PAIR_CHUNK)
        n_groups = pl.cdiv(rem, GROUP)

        start_group(pslot, 0, 0)

        def inner(g, _):
            slot = g % 2

            @pl.when(g + 1 < n_groups)
            def _():
                start_group(pslot, g + 1, (g + 1) % 2)

            wait_group(pslot, g, slot)

            for j in range(GROUP):
                best, tri = _mt_pair(ray_buf[slot, j], blk_buf[slot, j], tile, C)
                tile_idx = pair_smem[pslot, 0, g * GROUP + j]
                row = pl.ds(tile_idx, 1)
                cur_t = t_out_ref[row, :]
                cur_tri = tri_out_ref[row, :]
                upd = (best < cur_t) | ((best == cur_t) & (tri > cur_tri))
                t_out_ref[row, :] = jnp.where(upd, best, cur_t)
                tri_out_ref[row, :] = jnp.where(upd, tri, cur_tri)
            return 0

        jax.lax.fori_loop(0, n_groups, inner, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, outer, 0)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def sweep_pairs(
    rays_tiles: jnp.ndarray,  # (T + 1, 8, L) f32 — rows [o xyz, d xyz, -, -]
    blocks: jnp.ndarray,  # (K, 16, C) f32
    pairs: jnp.ndarray,  # (2, P) int32 — [pair_tile; pair_cluster], prefix-
    #                       valid with (T, 0) sentinels after `total`
    total: jnp.ndarray,  # () int32 — number of valid pairs
    tile: int = None,  # rays per tile (lanes L may be padded past it)
    interpret: bool = False,
):
    """Run the sweep → (t_tile (T+1, tile) f32, tri_tile (T+1, tile) int32).

    Callers slice off the final dummy row (sentinel-pair collector)."""
    T1, _, lanes = rays_tiles.shape
    if tile is None:
        tile = lanes
    P = pairs.shape[1]
    ppad = (-P) % PAIR_CHUNK
    if ppad:
        pairs = jnp.pad(
            pairs, ((0, 0), (0, ppad)), constant_values=0
        )
        # Padded tail must stay sentinel-shaped: tile row = T1-1, cluster 0.
        pairs = pairs.at[0, P:].set(T1 - 1)
    _, _, C = blocks.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((2, 2, PAIR_CHUNK), jnp.int32),
            pltpu.VMEM((2, GROUP, 8, lanes), jnp.float32),
            pltpu.VMEM((2, GROUP, 16, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, GROUP)),
            pltpu.SemaphoreType.DMA((2, GROUP)),
        ],
    )
    t_tile, tri_tile = pl.pallas_call(
        _sweep_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T1, tile), jnp.float32),
            jax.ShapeDtypeStruct((T1, tile), jnp.float32),
        ),
        interpret=interpret,
    )(total.reshape(1).astype(jnp.int32), pairs, rays_tiles, blocks)
    return t_tile, tri_tile.astype(jnp.int32)
