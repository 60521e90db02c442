"""Single-program Pallas closest-hit: cull + pack + walk + sweep in ONE kernel.

The three-stage fused path (ops/pallas/cull.py -> XLA pack_words ->
ops/pallas/fused.py) still pays per closest-hit for the XLA glue between its
kernels: the (T, K) entry table and the (T, W, K) per-ray hit bitmask round-
trip HBM, pack_words runs two matmuls plus pad/reshape relayouts, and every
stage is a separate launch. This kernel does the whole closest-hit per ray
tile inside one grid step:

  * cull — the Tavian slab test evaluated directly in (K, tile) orientation:
    box columns from a (Kp, 8) table against the tile's component rows. Same
    expression tree as ops/pallas/cull._slab_entry_mask element-for-element,
    so hit decisions and entries are bit-identical; nothing is reduced — the
    PER-RAY entry matrix stays live in registers/VMEM for the skip test.
  * pack — per-cluster any-hit column (Kp, 1) is packed into 16-bit words by
    two MXU matmuls against byte-split power-of-two weights (exact under
    bf16 operand rounding, values <= 255 — the pack_words argument), then
    DMA'd VMEM -> SMEM for the scalar core.
  * walk — a scalar loop over the Kw words emits set-bit cluster ids into an
    SMEM ring; work is proportional to live pairs.
  * sweep — the ring is swept in MT_BATCH groups from the VMEM-resident
    block table (fused._mt_batch, bit-identical MT core), gated by a PER-RAY
    slab-entry early-out: a pair is swept only if some ray that slab-hits its
    box has a bound (incoming window min accumulated best) reaching that
    ray's OWN entry distance. This is strictly stronger than fused.py's
    tile-min-entry test and exact by the same argument (fused.SKIP_SLACK):
    a triangle hit in a box lies at or beyond that ray's slab entry.

No (T, K) arrays ever exist: entry and hit live per tile only. Reference
semantics: closest triangle hit, eps 0.005, ties toward the larger triangle
id (scene.cu:134-241; matches every other intersector backend bit-for-bit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_raytracer_tpu.ops.pallas.fused import (
    SKIP_SLACK,
    _ctz16,
    _mt_batch,
    _mt_batch_for,
    resident_budget,
)
from cuda_raytracer_tpu.ops.pallas.sweep import MISS

# Largest cluster count per kernel call (the SMEM pair ring is sized to it;
# bigger tables run as merged shards, packet_intersect-style).
MAX_K = 2048


def _shard_overhead_bytes(tile: int, K: int) -> int:
    """fused1-only fixed VMEM footprint for a K-cluster shard, on top of the
    block table itself: the (Kwp, Kp) packing-weight pair, the (Kp, lanes)
    hit/entry scratch (lane-padded to 128 by Mosaic's (8, 128) tiling), the
    (Kp, 8) box table and the packed-word staging column. fused.resident_budget
    only accounts for the shapes the 3-stage fused kernel carries, so sizing
    fused1 shards against it alone can bust the 15 MiB scoped-VMEM cap on
    exactly the large scenes (e.g. lamp) that sharding is meant to handle."""
    Kw = -(-K // 16)
    Kwp = max(8, -(-Kw // 8) * 8)
    Kp = Kw * 16
    lanes = max(tile, 128)
    weights = 2 * Kwp * Kp * 4
    scratch = 2 * Kp * lanes * 4
    aabb = Kp * 8 * 4
    words = 2 * Kwp * 128 * 4  # (Kwp, 1) staging, lane-padded
    return weights + scratch + aabb + words


def plan_shards(T: int, tile: int, C: int, K: int) -> int:
    """Number of table shards so each fused1 call fits the scoped-VMEM
    budget: per-shard block bytes PLUS the fused1 fixed footprint (which
    itself shrinks with the shard's K) must clear fused.resident_budget."""
    budget = resident_budget(T, tile, C)
    n = max(1, -(-K // MAX_K))
    while n < K:
        k_shard = -(-K // n)
        need = k_shard * 16 * C * 4 + _shard_overhead_bytes(tile, k_shard)
        if k_shard <= MAX_K and need <= budget:
            break
        n += 1
    return min(n, K)


def _fused1_kernel(
    od8_ref,  # (1, 8, L) f32 — this tile's component rows (BlockSpec)
    aabbT_ref,  # (Kp, 8) f32 VMEM — box columns [min xyz, max xyz, 0, 0]
    w_lo_ref,  # (Kwp, Kp) f32 VMEM — low-byte packing weights
    w_hi_ref,  # (Kwp, Kp) f32 VMEM — high-byte packing weights
    blocks_ref,  # (>= K, 16, C) f32 VMEM — resident cluster blocks
    t_out_ref,  # (T + 1, tile) f32 VMEM
    tri_out_ref,  # (T + 1, tile) f32 VMEM
    words_vmem,  # VMEM (Kwp, 1) int32 — packed words staging
    words_smem,  # SMEM (Kwp, 1) int32
    pk_smem,  # SMEM (MAX_K,) int32 — this tile's pair ring
    hit_vmem,  # VMEM (Kp, tile) f32 — per-ray box hits (1.0 / 0.0)
    ent_vmem,  # VMEM (Kp, tile) f32 — per-ray slab entries (MISS where unhit)
    blkB_buf,  # VMEM (B, 16, C) f32 — MT batch staging
    acc_best,  # VMEM (1, tile) f32
    acc_tri,  # VMEM (1, tile) f32
    words_sem,  # DMA (1,)
    *,
    tile: int,
    K: int,
    Kw: int,
):
    t = pl.program_id(0)
    T = t_out_ref.shape[0] - 1
    C = blocks_ref.shape[2]
    Kp = aabbT_ref.shape[0]
    B = blkB_buf.shape[0]

    @pl.when(t == 0)
    def _():
        t_out_ref[:] = jnp.full(t_out_ref.shape, MISS, jnp.float32)
        tri_out_ref[:] = jnp.full(tri_out_ref.shape, -1.0, jnp.float32)

    # ---- cull: slab test in (Kp, tile) orientation ------------------------
    # Bit-identical expression tree to cull._slab_entry_mask: same safe
    # inverse, same running-window min/max order, same [0, tmax] window.
    win = od8_ref[0, 6:7, :tile]  # (1, tile) per-ray search window
    tmin_run = jnp.zeros((Kp, tile), jnp.float32)
    tmax_run = jnp.broadcast_to(win, (Kp, tile))
    tiny = jnp.float32(1e-30)
    huge = jnp.float32(1e30)
    for axis in range(3):
        o = od8_ref[0, axis:axis + 1, :tile]  # (1, tile)
        d = od8_ref[0, 3 + axis:4 + axis, :tile]
        small = jnp.abs(d) < tiny
        inv = jnp.where(
            small,
            jnp.where(d < 0, -huge, huge),
            1.0 / jnp.where(small, 1.0, d),
        )
        lo = aabbT_ref[:, axis:axis + 1]  # (Kp, 1)
        hi = aabbT_ref[:, 3 + axis:4 + axis]
        t1 = (lo - o) * inv  # (Kp, tile)
        t2 = (hi - o) * inv
        tmin_run = jnp.minimum(jnp.maximum(t1, tmin_run), jnp.maximum(t2, tmin_run))
        tmax_run = jnp.maximum(jnp.minimum(t1, tmax_run), jnp.minimum(t2, tmax_run))
    hit = tmin_run <= tmax_run  # (Kp, tile) per-ray
    # Stage per-ray hits/entries in VMEM scratch: the sweep's skip test
    # reads them back a cluster ROW at a time by dynamic sublane index.
    hit_vmem[:, :] = hit.astype(jnp.float32)
    ent_vmem[:, :] = jnp.where(hit, tmin_run, jnp.float32(MISS))

    # ---- pack: any-hit column -> 16-bit words via byte-split matmuls ------
    any_col = jnp.max(hit.astype(jnp.float32), axis=1, keepdims=True)  # (Kp, 1)
    lo_col = jax.lax.dot_general(
        w_lo_ref[:, :], any_col,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Kwp, 1)
    hi_col = jax.lax.dot_general(
        w_hi_ref[:, :], any_col,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    words_vmem[:, :] = (lo_col + 256.0 * hi_col).astype(jnp.int32)
    copy = pltpu.make_async_copy(words_vmem, words_smem, words_sem)
    copy.start()
    copy.wait()

    # ---- walk: emit set-bit cluster ids into the pair ring ----------------
    def word_body(w, rc):
        def bit_cond(c):
            word, _ = c
            return word != 0

        def bit_body(c):
            word, rc = c
            tz = _ctz16(word)
            pk_smem[rc] = w * 16 + tz
            return word & (word - 1), rc + 1

        word0 = words_smem[w, 0]
        _, rc = jax.lax.while_loop(bit_cond, bit_body, (word0, rc))
        return rc

    rc = jax.lax.fori_loop(0, Kw, word_body, jnp.int32(0))

    # ---- sweep: per-ray-entry-gated batched MT from the resident table ----
    @pl.when(rc > 0)
    def _():
        raysT = od8_ref[0][:, :tile].T  # (tile, 8)
        row = pl.ds(t, 1)
        acc_best[:, :] = t_out_ref[row, :]
        acc_tri[:, :] = tri_out_ref[row, :]
        n_groups = pl.cdiv(rc, B)

        def group_body(g, _):
            base = g * B
            bound = jnp.minimum(acc_best[:, :], win)
            needv = jnp.zeros((1, tile), jnp.bool_)
            for j in range(B):
                p = jnp.minimum(base + j, rc - 1)
                k = pk_smem[p]
                hit_k = hit_vmem[pl.ds(k, 1), :] != 0.0  # (1, tile)
                ent_k = ent_vmem[pl.ds(k, 1), :]  # (1, tile) per-ray entries
                needv = needv | (
                    hit_k & (bound >= ent_k * jnp.float32(SKIP_SLACK))
                )
            need = jnp.any(needv)

            @pl.when(need)
            def _():
                for j in range(B):
                    p = jnp.minimum(base + j, rc - 1)
                    blkB_buf[pl.ds(j, 1)] = blocks_ref[pl.ds(pk_smem[p], 1)]
                b_g, tr_g = _mt_batch(raysT, blkB_buf[:, :, :], tile, C)
                best = acc_best[:, :]
                tri = acc_tri[:, :]
                upd = (b_g < best) | ((b_g == best) & (tr_g > tri))
                acc_best[:, :] = jnp.where(upd, b_g, best)
                acc_tri[:, :] = jnp.where(upd, tr_g, tri)

            return 0

        jax.lax.fori_loop(0, n_groups, group_body, 0)
        t_out_ref[row, :] = acc_best[:, :]
        tri_out_ref[row, :] = acc_tri[:, :]


def _pack_weights(K: int, Kp: int, Kwp: int):
    """Byte-split packing weights: W[w, k] = 2^(k%16 - byte*8) when k//16 == w
    and k%16 lies in the byte, else 0. Shapes (Kwp, Kp); constants folded by
    XLA, uploaded once per compiled shape."""
    import numpy as np

    k = np.arange(Kp)
    w = np.arange(Kwp)
    sel = (k[None, :] // 16) == w[:, None]
    lo = np.where(sel & (k[None, :] % 16 < 8), 2.0 ** (k[None, :] % 16), 0.0)
    hi = np.where(sel & (k[None, :] % 16 >= 8), 2.0 ** (k[None, :] % 16 - 8), 0.0)
    lo[:, K:] = 0.0
    hi[:, K:] = 0.0
    return jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused1_closest_hit(
    od8: jnp.ndarray,  # (T + 1, 8, L) f32 component-row tiles — dummy row T
    aabb: jnp.ndarray,  # (8, K) f32 — rows [min xyz, max xyz, 0, 0]
    blocks: jnp.ndarray,  # (>= K, 16, C) f32 — rows past K are never read
    tile: int,
    interpret: bool = False,
):
    """→ (t_tile (T+1, tile) f32, tri_tile (T+1, tile) int32): exact closest
    hits over every (tile, cluster) pair whose AABB some ray slab-hits,
    computed in one kernel launch. The per-ray slab-entry early-out is
    always on (it costs nothing extra here — per-ray entries are already in
    registers). The caller shards tables above the VMEM budget and merges
    (packet_intersect), exactly like the fused backend."""
    T1, _, L = od8.shape
    T = T1 - 1
    C = blocks.shape[2]
    K = aabb.shape[1]
    if K > MAX_K:
        raise ValueError(f"fused1 shard K={K} exceeds MAX_K={MAX_K}")
    Kw = -(-K // 16)
    Kwp = max(8, -(-Kw // 8) * 8)
    Kp = Kw * 16
    # Box columns (Kp, 8): padded clusters get far point boxes (never hit).
    aabbT = jnp.full((Kp, 8), 1e17, jnp.float32).at[:K].set(aabb.T[:K])
    aabbT = aabbT.at[:K, 6:8].set(0.0)
    w_lo, w_hi = _pack_weights(K, Kp, Kwp)

    B = _mt_batch_for(tile, C)
    kernel = functools.partial(_fused1_kernel, tile=tile, K=K, Kw=Kw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 8, L), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Kwp, 1), jnp.int32),
            pltpu.SMEM((Kwp, 1), jnp.int32),
            pltpu.SMEM((MAX_K,), jnp.int32),
            pltpu.VMEM((Kp, tile), jnp.float32),
            pltpu.VMEM((Kp, tile), jnp.float32),
            pltpu.VMEM((B, 16, C), jnp.float32),
            pltpu.VMEM((1, tile), jnp.float32),
            pltpu.VMEM((1, tile), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    t_tile, tri_tile = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T1, tile), jnp.float32),
            jax.ShapeDtypeStruct((T1, tile), jnp.float32),
        ),
        interpret=interpret,
    )(od8, aabbT, w_lo, w_hi, blocks)
    return t_tile, tri_tile.astype(jnp.int32)
