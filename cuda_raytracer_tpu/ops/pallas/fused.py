"""Fused Pallas closest-hit: in-kernel pair extraction + MT sweep.

The round-1 Pallas path ran three stages per closest-hit — cull kernel,
XLA pair extraction (cumsum + scatter over T·K elements under a global pair
budget), sweep kernel — whose glue cost ~2-4 ms/call and whose budget made
results inexact under overflow. This kernel fuses extraction into the sweep:

  * The caller packs the cull's (T, K) hit mask into 16-bit words
    (``pack_words``) — a dense XLA reshape+dot, microseconds, no scatters —
    plus a second-level word mask and a per-tile count.
  * In-kernel, a scalar-core cursor machine walks the hierarchy (skip dead
    tiles by count, skip empty words by the level-2 mask, count-trailing-
    zeros through set bits) and emits (tile, cluster) pairs into an SMEM
    ring. Work is proportional to live pairs, not T·K.
  * Each full ring is swept exactly like ops/pallas/sweep.py: double-buffered
    HBM→VMEM DMA waves of GROUP pairs, dense Möller–Trumbore of the
    (tile, C) block on the VPU, read-modify-write accumulation into VMEM
    output rows.

Every culled pair is swept — no per-tile cap, no global budget: the result
is EXACT by construction (the packet path's overflow certificate is
structurally zero here).

Reference semantics: closest-triangle-hit, epsilon 0.005, over the BVH-cut
cluster blocks (scene.cu:134-241); ties toward the larger triangle id
(matches ops/packet_intersect phase D and ops/pallas/sweep.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_raytracer_tpu.ops.pallas.sweep import (
    MISS,
    _mt_pair_t,
    _mt_t_plane,
)

# Pairs per SMEM ring (flush granularity) and DMA pipeline width.
RING = 128
GROUP = 8
# Tile segments per ring in the resident variant.
RINGT = 64
# Cluster tables at or below this size stay VMEM-resident (v5e has ~16 MB of
# VMEM; leave room for outputs, ray buffers and compiler temporaries).
# 0 forces the DMA-wave escape hatch. The effective per-call cap also
# subtracts the call-shape-dependent VMEM (resident_budget below).
RESIDENT_BYTES = 12 << 20
# Scoped-VMEM budget for one fused call: the v5e limit is 16.00 MiB and the
# compiler adds temporaries, so leave ~1 MiB of headroom.
VMEM_CALL_BUDGET = 15 << 20
# SMEM budget for the double-buffered metadata chunk (bytes); the tile-chunk
# size adapts to keep 2 * tc * (1 + Kw2 + Kw) * 4 under it.
META_SMEM_BUDGET = 1 << 16
# Budget for the skip path's double-buffered entry/mask SMEM scratch
# (2*(1+NW)*EW*4 bytes). v5e SMEM is ~1 MB; leave headroom for the meta
# chunk (META_SMEM_BUDGET), rings, and compiler temporaries.
SKIP_SMEM_BUDGET = 640 << 10


def _tile_chunk(Kw: int, Kw2: int) -> int:
    tc = 256
    row_bytes = (1 + Kw2 + Kw) * 4 * 2
    while tc > 64 and tc * row_bytes > META_SMEM_BUDGET:
        tc //= 2
    # tc cannot shrink below 64: Mosaic tiles flat 1-D HBM memrefs at
    # (1024) elements and memref_slice needs lengths/offsets aligned to
    # that, and MW/WW are only guaranteed multiples of 16 (64 * 16 = 1024).
    # With the tc=64 floor the budget is overshot once
    # 64 * 8 * (1 + Kw2 + Kw) > 65536, i.e. Kw ≳ 110 (K ≳ ~1.8k words per
    # table). Reachable two ways: the budget=0 DMA-wave escape hatch with a
    # huge table, or a VMEM-resident shard with a small cluster width C
    # (cluster_tris ≪ 128) carrying several thousand clusters per shard.
    # Fail loudly rather than let Mosaic starve scalar memory.
    if tc * row_bytes > META_SMEM_BUDGET:
        raise ValueError(
            f"fused closest-hit metadata row ({row_bytes} B for Kw={Kw}) "
            "exceeds the SMEM budget even at the minimum tile chunk; shard "
            "the cluster table (packet_intersect's resident shards) or "
            "reduce cluster count"
        )
    return tc


def resident_budget(T: int, tile: int, C: int) -> int:
    """Max cluster-table bytes the VMEM-resident variant can carry at these
    call shapes. The (T+1, tile) f32 outputs are lane-padded to 128 by
    Mosaic's (8, 128) tiling — at tile=32 that is 4x the logical size, and
    hardware-verified to matter: the teapot C=128/tile=32 grad step demanded
    16.06 MiB of scoped VMEM against the 16.00 MiB limit with the flat
    12 MiB table cap. The MT batch staging buffer also scales with tile/C.
    Callers shard the cluster table to this budget (packet_intersect) and
    fused_closest_hit uses the same number to pick resident vs DMA-wave, so
    the two can never disagree."""
    out_bytes = 2 * (-(-(T + 1) // 8) * 8) * 128 * 4
    blkB_bytes = _mt_batch_for(tile, C) * 16 * C * 4
    ray_bytes = 2 * 8 * 128 * 4 + 2 * tile * 4  # ray_buf + acc rows
    slack = 128 << 10  # compiler temporaries, semaphores, rounding
    return min(
        RESIDENT_BYTES,
        VMEM_CALL_BUDGET - out_bytes - blkB_bytes - ray_bytes - slack,
    )


def _ctz16(w):
    """Count trailing zeros of a 16-bit scalar (w != 0), branchless."""
    j = jnp.int32(0)
    x = w
    for bits, mask in ((8, 0xFF), (4, 0xF), (2, 0x3), (1, 0x1)):
        z = ((x & mask) == 0).astype(jnp.int32)
        j = j + z * bits
        x = jax.lax.shift_right_logical(x, z * bits)
    return j


def _walk_pairs(
    meta_ref,
    words_ref,
    meta_smem,
    words_smem,
    meta_sem,
    words_sem,
    *,
    T: int,
    tile_chunk: int,
    MW: int,
    WW: int,
    Kw: int,
    Kw2: int,
    extras_init,  # () -> tuple of variant-specific extra loop carries
    flush_pred,  # (rc, chunk_done, extras) -> bool — the full flush predicate
    flush_hook,  # (do_flush, rc, extras) -> (rc, extras); runs + resets flush
    pre_emit_hook,  # (c, have1, t, rc, extras) -> extras; before the emit
    emit_hook,  # (c, have1, rc, t, g1base, tz1) -> None; pl.when inside
):
    """The ONE cursor state machine shared by both fused kernels.

    Double-buffers per-chunk metadata SMEM DMAs and walks the packed word
    hierarchy — one action per iteration, priority order:

      w1 != 0             → emit pair (t, g1base + ctz(w1)), clear bit
      w2 != 0             → load the L1 word at the lowest set L2 bit
      g2 < Kw2, t live    → load next L2 word
      else                → advance to the next tile (count-0 tiles cost
                            one iteration each)

    Invariant: w1 == w2 == 0 whenever t >= tc_eff, so the loop terminates
    once the tail flush empties rc. Ring storage, flush conditions and the
    emit destinations are the variants' business — injected as hooks so the
    delicate shared logic (classification, guarded word loads, dead-tile
    advance) can never desynchronize between the wave and resident kernels.
    Each hook does its own arithmetic inside its pl.when so traced ops stay
    under the predicate (verified trace-identical to the pre-refactor
    kernels by jaxpr comparison)."""
    TILE_CHUNK = tile_chunk
    n_chunks = pl.cdiv(T, TILE_CHUNK)

    def meta_dma(c, slot):
        # Flat 1-D src and dst slices whose offsets/lengths are multiples of
        # 1024 (TILE_CHUNK ≥ 64, MW/WW multiples of 16) — Mosaic tiles flat
        # 1-D HBM memrefs at (1024), so slices must align to that.
        mlen = TILE_CHUNK * MW
        wlen = TILE_CHUNK * WW
        return (
            pltpu.make_async_copy(
                meta_ref.at[pl.ds(c * mlen, mlen)],
                meta_smem.at[pl.ds(slot * mlen, mlen)],
                meta_sem.at[slot],
            ),
            pltpu.make_async_copy(
                words_ref.at[pl.ds(c * wlen, wlen)],
                words_smem.at[pl.ds(slot * wlen, wlen)],
                words_sem.at[slot],
            ),
        )

    def start_meta(c, slot):
        a, b = meta_dma(c, slot)
        a.start()
        b.start()

    def wait_meta(c, slot):
        a, b = meta_dma(c, slot)
        a.wait()
        b.wait()

    @pl.when(n_chunks > 0)
    def _():
        start_meta(0, 0)

    def chunk_body(c, _):
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            start_meta(c + 1, (c + 1) % 2)

        wait_meta(c, slot)
        tc_eff = jnp.minimum(T - c * TILE_CHUNK, TILE_CHUNK)

        def cond(carry):
            t, g2, g2base, w2, w1, g1base, rc = carry[:7]
            return (t < tc_eff) | (rc > 0)

        def body(carry):
            t, g2, g2base, w2, w1, g1base, rc = carry[:7]
            extras = carry[7:]

            chunk_done = (t >= tc_eff) & (w1 == 0) & (w2 == 0)
            do_flush = flush_pred(rc, chunk_done, extras)
            rc, extras = flush_hook(do_flush, rc, extras)

            have1 = w1 != 0
            have2 = (~have1) & (w2 != 0)
            need2 = (~have1) & (~have2) & (g2 < Kw2) & (t < tc_eff)
            adv = (~have1) & (~have2) & (~need2) & (t < tc_eff)

            extras = pre_emit_hook(c, have1, t, rc, extras)

            # emit the lowest set bit of w1 (ctz input guarded for w1 == 0)
            tz1 = _ctz16(jnp.where(have1, w1, 1))
            emit_hook(c, have1, rc, t, g1base, tz1)
            rc = jnp.where(have1, rc + 1, rc)
            w1 = jnp.where(have1, w1 & (w1 - 1), w1)

            # load next L1 word from the lowest set L2 bit
            tz2 = _ctz16(jnp.where(have2, w2, 1))
            g1_idx = g2base + tz2
            g1_safe = jnp.minimum(g1_idx, Kw - 1)
            t_safe = jnp.minimum(t, TILE_CHUNK - 1)
            w1_new = words_smem[slot * TILE_CHUNK * WW + t_safe * WW + g1_safe]
            w1 = jnp.where(have2, w1_new, w1)
            g1base = jnp.where(have2, g1_idx * 16, g1base)
            w2 = jnp.where(have2, w2 & (w2 - 1), w2)

            # load next L2 word
            g2_safe = jnp.minimum(g2, Kw2 - 1)
            w2_new = meta_smem[slot * TILE_CHUNK * MW + t_safe * MW + 1 + g2_safe]
            w2 = jnp.where(need2, w2_new, w2)
            g2base = jnp.where(need2, g2 * 16, g2base)
            g2 = jnp.where(need2, g2 + 1, g2)

            # advance tile; dead tiles (count 0) skip their L2 scan entirely
            t_next = jnp.minimum(t + 1, TILE_CHUNK - 1)
            next_alive = meta_smem[slot * TILE_CHUNK * MW + t_next * MW] > 0
            g2 = jnp.where(adv, jnp.where(next_alive, 0, Kw2), g2)
            t = jnp.where(adv, t + 1, t)
            return (t, g2, g2base, w2, w1, g1base, rc) + extras

        first_alive = meta_smem[slot * TILE_CHUNK * MW] > 0
        init = (
            jnp.int32(0),  # t
            jnp.where(first_alive, jnp.int32(0), jnp.int32(Kw2)),  # g2
            jnp.int32(0),  # g2base
            jnp.int32(0),  # w2
            jnp.int32(0),  # w1
            jnp.int32(0),  # g1base
            jnp.int32(0),  # rc
        ) + extras_init()
        jax.lax.while_loop(cond, body, init)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def _fused_kernel(
    # inputs (HBM unless noted)
    meta_ref,  # (T * MW,) int32 — per-tile [count, l2 words..., pad] rows
    words_ref,  # (T * WW,) int32 — per-tile 16-bit L1 hit word rows
    rays_ref,  # (T + 1, 8, L) f32 component-row tiles — row T is a zero dummy
    blocks_ref,  # (K + 1, 16, C) f32 — row K is a degenerate dummy cluster
    # outputs (VMEM)
    t_out_ref,  # (T + 1, tile) f32
    tri_out_ref,  # (T + 1, tile) f32
    # scratch
    meta_smem,  # SMEM (2 * TILE_CHUNK * MW,) int32 — two flat slots
    words_smem,  # SMEM (2 * TILE_CHUNK * WW,) int32 — two flat slots
    pt_smem,  # SMEM (RING,) int32 — pair tile ids (global)
    pk_smem,  # SMEM (RING,) int32 — pair cluster ids
    ray_buf,  # VMEM (2, GROUP, 8, L)
    blk_buf,  # VMEM (2, GROUP, 16, C)
    raysT_buf,  # VMEM (tile, 8) — cached transpose of the current pair tile
    meta_sem,  # DMA (2,)
    words_sem,  # DMA (2,)
    ray_sem,  # DMA (2, GROUP)
    blk_sem,  # DMA (2, GROUP)
    *,
    tile: int,
    tile_chunk: int,
    Kw: int,
    Kw2: int,
    MW: int,
    WW: int,
):
    T1, _ = t_out_ref.shape
    T = T1 - 1
    K1 = blocks_ref.shape[0]
    C = blk_buf.shape[3]
    TILE_CHUNK = tile_chunk

    t_out_ref[:] = jnp.full(t_out_ref.shape, MISS, jnp.float32)
    tri_out_ref[:] = jnp.full(tri_out_ref.shape, -1.0, jnp.float32)

    def pair_dma(slot, j, wave_base):
        pt_j = pt_smem[wave_base + j]
        pk_j = pk_smem[wave_base + j]
        return (
            pltpu.make_async_copy(
                rays_ref.at[pt_j], ray_buf.at[slot, j], ray_sem.at[slot, j]
            ),
            pltpu.make_async_copy(blocks_ref.at[pk_j], blk_buf.at[slot, j], blk_sem.at[slot, j]),
        )

    def start_wave(w, slot):
        for j in range(GROUP):
            r, b = pair_dma(slot, j, w * GROUP)
            r.start()
            b.start()

    def wait_wave(w, slot):
        for j in range(GROUP):
            r, b = pair_dma(slot, j, w * GROUP)
            r.wait()
            b.wait()

    def merge_row(pt, best, tri):
        """Fold a (1, tile) accumulator into output row ``pt`` with the
        closest-hit tie rule (larger tri id wins on equal t)."""
        row = pl.ds(pt, 1)
        cur_t = t_out_ref[row, :]
        cur_tri = tri_out_ref[row, :]
        upd = (best < cur_t) | ((best == cur_t) & (tri > cur_tri))
        t_out_ref[row, :] = jnp.where(upd, best, cur_t)
        tri_out_ref[row, :] = jnp.where(upd, tri, cur_tri)

    def flush(rc):
        """Sweep the first ``rc`` ring slots (rc > 0).

        Pairs arrive tile-sorted, so per-tile state is carried in registers
        across pairs: the transposed ray tile lives in a VMEM scratch
        refreshed only on tile change, and the per-tile (best, tri)
        accumulator rides the loop carry, merged into the output rows once
        per tile instead of once per pair (the read-modify-write and the
        (tile, 8) transpose are the dominant per-pair fixed costs)."""
        # Pad the last wave's tail with sentinel pairs (dummy ray tile T,
        # dummy cluster K) so waves are uniform.
        n_waves = pl.cdiv(rc, GROUP)

        def pad_body(j, _):
            pt_smem[j] = T
            pk_smem[j] = K1 - 1
            return 0

        jax.lax.fori_loop(rc, n_waves * GROUP, pad_body, 0)

        start_wave(0, 0)

        def wave_body(w, carry):
            prev_pt, best, tri = carry
            slot = w % 2

            @pl.when(w + 1 < n_waves)
            def _():
                start_wave(w + 1, (w + 1) % 2)

            wait_wave(w, slot)
            for j in range(GROUP):
                pt_j = pt_smem[w * GROUP + j]
                is_new = pt_j != prev_pt

                @pl.when(is_new)
                def _(best=best, tri=tri, prev_pt=prev_pt):
                    merge_row(prev_pt, best, tri)
                    raysT_buf[:, :] = ray_buf[slot, j][:, :tile].T

                # switch the register accumulator to the new tile's rows
                row_new = pl.ds(pt_j, 1)
                best = jnp.where(is_new, t_out_ref[row_new, :], best)
                tri = jnp.where(is_new, tri_out_ref[row_new, :], tri)

                b_j, tr_j = _mt_pair_t(raysT_buf[:, :], blk_buf[slot, j], tile, C)
                upd = (b_j < best) | ((b_j == best) & (tr_j > tri))
                best = jnp.where(upd, b_j, best)
                tri = jnp.where(upd, tr_j, tri)
                prev_pt = pt_j
            return prev_pt, best, tri

        init = (
            jnp.int32(T),  # dummy row: first tile switch merges harmlessly
            jnp.full((1, tile), MISS, jnp.float32),
            jnp.full((1, tile), -1.0, jnp.float32),
        )
        prev_pt, best, tri = jax.lax.fori_loop(0, n_waves, wave_body, init)
        merge_row(prev_pt, best, tri)

    # The ring is flushed whenever it reaches RING pairs, and once more at
    # chunk end for the remainder.
    def flush_pred(rc, chunk_done, extras):
        return (rc >= RING) | (chunk_done & (rc > 0))

    def flush_hook(do_flush, rc, extras):
        @pl.when(do_flush)
        def _():
            flush(rc)

        rc = jnp.where(do_flush, 0, rc)
        return rc, extras

    def pre_emit_hook(c, have1, t, rc, extras):
        return extras

    def emit_hook(c, have1, rc, t, g1base, tz1):
        @pl.when(have1)
        def _():
            pt_smem[rc] = c * TILE_CHUNK + t
            pk_smem[rc] = g1base + tz1

    _walk_pairs(
        meta_ref, words_ref, meta_smem, words_smem, meta_sem, words_sem,
        T=T, tile_chunk=TILE_CHUNK, MW=MW, WW=WW, Kw=Kw, Kw2=Kw2,
        extras_init=tuple,
        flush_pred=flush_pred,
        flush_hook=flush_hook,
        pre_emit_hook=pre_emit_hook,
        emit_hook=emit_hook,
    )


# Same-tile pairs batched per MT call in the resident kernel. The (tile, C)
# single-pair shapes are only ~8 vregs per vector op — too narrow to hide
# VPU op latency behind the MT's dependency chain (measured ~0.55 µs/pair at
# (32, 256) vs ~4-5 vreg-ops/cycle sustained at (128, 1024)); a leading
# batch axis widens every op by B× with no extra instructions.
MT_BATCH = 4


def _mt_batch_for(tile: int, C: int) -> int:
    """Batch width per MT call: keep each vector op at ≥ MT_BATCH×64×256
    elements so small tiles / small C don't fall back into the
    latency-bound narrow regime; bigger batches also amortise the
    per-group scalar staging, at the cost of coarser skip granularity."""
    target = MT_BATCH * 64 * 256
    b = MT_BATCH
    # Cap at 16 (32 for tiny tiles, which otherwise top out at half the
    # width target): beyond that the skip granularity (one predicate per
    # group) costs more in unskippable pairs than the extra width buys —
    # though the loss is modest (sim: B=4 → 16 costs ~20% more masked MT
    # tests at tile=32/C=128).
    cap = 32 if tile <= 16 else 16
    while b < cap and b * tile * C < target:
        b *= 2
    return b


def _mt_batch(raysT: jnp.ndarray, blks, tile: int, C: int, lane_valid=None):
    """Möller–Trumbore of one ray tile against B cluster blocks at once.

    raysT: (tile, 8) — ray-major [o xyz, d xyz, tmax, pad]
    blks:  (B, 16, C) — B cluster blocks
    lane_valid: optional (B, 1, C) bool — lanes masked False report MISS
    (the cluster_pack sweep masks the unhit half of a paired block so the
    effective pair set stays at sub-cluster granularity).
    Returns (best_t (1, tile), best_tri (1, tile) f32) folded over B and C
    with the shared tie rule (smaller t wins; larger tri id on equal t).
    Bit-identical to sweep._mt_pair_t by construction: both call the one
    sweep._mt_t_plane core."""
    B = blks.shape[0]
    tile_n = raysT.shape[0]

    def col(c):
        # unit-leading-dim reshape (layout-preserving; [None] indexing
        # lowers as an unsupported gather in Mosaic)
        return raysT[:, c:c + 1].reshape(1, tile_n, 1)

    ox = col(0)
    oy = col(1)
    oz = col(2)
    dx = col(3)
    dy = col(4)
    dz = col(5)
    p1x = blks[:, 0:1, :]
    p1y = blks[:, 1:2, :]
    p1z = blks[:, 2:3, :]
    e1x = blks[:, 3:4, :]
    e1y = blks[:, 4:5, :]
    e1z = blks[:, 5:6, :]
    e2x = blks[:, 6:7, :]
    e2y = blks[:, 7:8, :]
    e2z = blks[:, 8:9, :]
    trif = blks[:, 9:10, :]

    t = _mt_t_plane(
        (ox, oy, oz), (dx, dy, dz),
        (p1x, p1y, p1z, e1x, e1y, e1z, e2x, e2y, e2z),
    )  # (B, tile, C)
    if lane_valid is not None:
        t = jnp.where(lane_valid, t, MISS)
    m = jnp.min(t, axis=2)  # (B, tile)
    eq = t == m[:, :, None]
    trb = jnp.broadcast_to(trif, t.shape)
    tr = jnp.max(jnp.where(eq & (t < MISS), trb, -1.0), axis=2)  # (B, tile)
    best = jnp.full((1, tile), MISS, jnp.float32)
    tri = jnp.full((1, tile), -1.0, jnp.float32)
    for j in range(B):
        mj = m[j:j + 1]
        tj = tr[j:j + 1]
        upd = (mj < best) | ((mj == best) & (tj > tri))
        best = jnp.where(upd, mj, best)
        tri = jnp.where(upd, tj, tri)
    return best, tri


# Conservative relative slack on the slab-entry skip threshold: a pair is
# skipped only when its (slightly shrunk) entry distance strictly exceeds
# every ray's current bound, so float rounding between the slab's tmin and
# the MT t (different f32 expression chains, each ~2^-20 relative) can
# never discard a pair that would have won — including exact-t ties, which
# the tie rules resolve deterministically.
SKIP_SLACK = 1.0 - 2.0 ** -14


def _fused_kernel_resident(
    # inputs
    meta_ref,  # HBM (T * MW,) int32
    words_ref,  # HBM (T * WW,) int32
    rays_ref,  # HBM (T + 1, 8, L) f32 component-row tiles
    blocks_ref,  # VMEM (K + 1, 16, C) f32 — whole table resident on-chip
    *rest,  # [entry_ref (T * EW,) f32, mask_ref (T * NW * EW,) i32 when EW > 0], outputs, scratch
    tile: int,
    tile_chunk: int,
    Kw: int,
    Kw2: int,
    MW: int,
    WW: int,
    EW: int = 0,
    NW: int = 0,
):
    """The fused walk+sweep with the cluster table VMEM-resident.

    Per-pair work is a dynamic on-chip read of the (16, C) block + the MT
    sweep — no per-pair DMA descriptors or semaphore traffic (measured
    ~0.5 µs/pair in the wave variant, dominating small-C configs). Ray
    tiles are DMA'd once per tile segment, double-buffered across the
    ring's tile list.

    ``EW > 0`` enables the slab-entry skip (BVH-style early-out): the
    cull's per-(tile, cluster) entry table rides along (row per tile,
    padded to EW lanes) together with its per-ray hit BITMASK (NW int32
    words per tile row, bit r of word w ⇔ ray 32w + r slab-hits the
    cluster). A pair is swept only if some ray that actually HITS its box
    has a current bound — min(accumulated best, incoming window) — that
    reaches the pair's entry (scaled by SKIP_SLACK; see its note). The
    mask is what makes the test per-ray: without it, one never-hit ray in
    the tile (bound = MISS forever) forces every sweep, and simulation
    says the early-out then fires ~never on mixed tiles (scripts/
    lever_sim.py: teapot b1-sorted 5.4k → 4.1k MT tests/ray with the
    mask, ~0 without). Dead and padded rays carry negative windows and
    zero mask bits, so they can never force a sweep."""
    skip = EW > 0
    rest = list(rest)
    entry_ref = rest.pop(0) if skip else None
    mask_ref = rest.pop(0) if skip else None
    # Exact-length unpacks (the * tail re-unpacks to a fixed arity) so a
    # scratch-list edit in fused_closest_hit that desynchronizes from this
    # signature raises immediately instead of silently mis-binding refs
    # that share a shape/dtype (e.g. acc_best/acc_tri, the DMA semaphores).
    (t_out_ref, tri_out_ref,
     meta_smem, words_smem, rt_smem, rs_smem, pk_smem, ray_buf, blkB_buf,
     *tail) = rest
    if skip:
        (acc_best, acc_tri, ent_smem, mask_smem,
         meta_sem, words_sem, ray_sem, ent_sem, mask_sem) = tail
    else:
        meta_sem, words_sem, ray_sem = tail
    T1, _ = t_out_ref.shape
    T = T1 - 1
    C = blocks_ref.shape[2]
    TILE_CHUNK = tile_chunk

    t_out_ref[:] = jnp.full(t_out_ref.shape, MISS, jnp.float32)
    tri_out_ref[:] = jnp.full(tri_out_ref.shape, -1.0, jnp.float32)

    def ray_dma(i, slot):
        return pltpu.make_async_copy(
            rays_ref.at[rt_smem[i]], ray_buf.at[slot], ray_sem.at[slot]
        )

    def ent_dma(i, slot):
        return pltpu.make_async_copy(
            entry_ref.at[pl.ds(rt_smem[i] * EW, EW)],
            ent_smem.at[pl.ds(slot * EW, EW)],
            ent_sem.at[slot],
        )

    def mask_dma(i, slot):
        return pltpu.make_async_copy(
            mask_ref.at[pl.ds(rt_smem[i] * NW * EW, NW * EW)],
            mask_smem.at[pl.ds(slot * NW * EW, NW * EW)],
            mask_sem.at[slot],
        )

    def start_tile(i, slot):
        ray_dma(i, slot).start()
        if skip:
            ent_dma(i, slot).start()
            mask_dma(i, slot).start()

    def wait_tile(i, slot):
        ray_dma(i, slot).wait()
        if skip:
            ent_dma(i, slot).wait()
            mask_dma(i, slot).wait()

    B = blkB_buf.shape[0]  # MT batch width (_mt_batch_for)

    def flush(tc, rc):
        """Sweep the ring's ``tc`` tile segments / ``rc`` pairs (rc > 0)."""
        rs_smem[tc] = rc  # terminator for the last segment

        start_tile(0, 0)

        def tile_body(i, _):
            slot = i % 2

            @pl.when(i + 1 < tc)
            def _():
                start_tile(i + 1, (i + 1) % 2)

            wait_tile(i, slot)
            raysT = ray_buf[slot][:, :tile].T  # (tile, 8), once per tile
            row = pl.ds(rt_smem[i], 1)
            seg_lo = rs_smem[i]
            seg_hi = rs_smem[i + 1]
            n_groups = pl.cdiv(seg_hi - seg_lo, B)

            def stage_group(base):
                # Stage B same-tile blocks; tail slots clamp to the
                # segment's last pair (duplicates are idempotent under the
                # min-fold accumulate).
                for j in range(B):
                    p = jnp.minimum(base + j, seg_hi - 1)
                    blkB_buf[pl.ds(j, 1)] = blocks_ref[pl.ds(pk_smem[p], 1)]

            if not skip:
                best0 = t_out_ref[row, :]
                tri0 = tri_out_ref[row, :]

                def group_body(g, bt):
                    best, tri = bt
                    base = seg_lo + g * B
                    stage_group(base)
                    b_g, tr_g = _mt_batch(raysT, blkB_buf[:, :, :], tile, C)
                    upd = (b_g < best) | ((b_g == best) & (tr_g > tri))
                    return jnp.where(upd, b_g, best), jnp.where(upd, tr_g, tri)

                best, tri = jax.lax.fori_loop(
                    0, n_groups, group_body, (best0, tri0)
                )
                t_out_ref[row, :] = best
                tri_out_ref[row, :] = tri
                return 0

            # Skip path: the accumulator lives in VMEM scratch so a whole
            # group's staging + MT can sit under one pl.when. ``bound`` is
            # each ray's best-possible improvement target: the incoming
            # per-ray window (ray row 6 — negative for dead/padded rays)
            # min'd with the accumulated best-so-far. A pair demands its
            # sweep only through rays whose mask bit is set (rays that
            # slab-hit its box): bit r of mask word w covers ray 32w + r,
            # expanded to a lane predicate with a variable-shift against a
            # lane iota.
            win = ray_buf[slot][6:7, :tile]  # (1, tile)
            acc_best[:, :] = t_out_ref[row, :]
            acc_tri[:, :] = tri_out_ref[row, :]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
            lane_lo = lanes & 31
            lane_w = jax.lax.shift_right_logical(lanes, 5)

            def group_body_skip(g, _):
                base = seg_lo + g * B
                bound = jnp.minimum(acc_best[:, :], win)
                needv = jnp.zeros((1, tile), jnp.bool_)
                for j in range(B):
                    p = jnp.minimum(base + j, seg_hi - 1)
                    k = pk_smem[p]
                    e = ent_smem[slot * EW + k]
                    pred = jnp.zeros((1, tile), jnp.int32)
                    for w in range(NW):
                        word = jnp.full(
                            (1, tile), mask_smem[slot * NW * EW + w * EW + k]
                        )
                        bits = (
                            jax.lax.shift_right_logical(word, lane_lo) & 1
                        )
                        pred = jnp.where(lane_w == w, bits, pred)
                    needv = needv | (
                        (pred != 0) & (bound >= e * SKIP_SLACK)
                    )
                need = jnp.any(needv)

                @pl.when(need)
                def _():
                    stage_group(base)
                    b_g, tr_g = _mt_batch(raysT, blkB_buf[:, :, :], tile, C)
                    best = acc_best[:, :]
                    tri = acc_tri[:, :]
                    upd = (b_g < best) | ((b_g == best) & (tr_g > tri))
                    acc_best[:, :] = jnp.where(upd, b_g, best)
                    acc_tri[:, :] = jnp.where(upd, tr_g, tri)

                return 0

            jax.lax.fori_loop(0, n_groups, group_body_skip, 0)
            t_out_ref[row, :] = acc_best[:, :]
            tri_out_ref[row, :] = acc_tri[:, :]
            return 0

        jax.lax.fori_loop(0, tc, tile_body, 0)

    # As _fused_kernel, plus per-tile segmentation — `et` tracks the last
    # tile with an open segment; a pair on a new tile appends (tile id,
    # segment start) to the tile ring.
    def flush_pred(rc, chunk_done, extras):
        tc, et = extras
        return (rc >= RING) | (tc >= RINGT) | (chunk_done & (rc > 0))

    def flush_hook(do_flush, rc, extras):
        tc, et = extras

        @pl.when(do_flush)
        def _(tc=tc, rc=rc):
            flush(tc, rc)

        rc = jnp.where(do_flush, 0, rc)
        tc = jnp.where(do_flush, 0, tc)
        et = jnp.where(do_flush, -1, et)
        return rc, (tc, et)

    def pre_emit_hook(c, have1, t, rc, extras):
        tc, et = extras
        open_tile = have1 & (t != et)

        @pl.when(open_tile)
        def _(tc=tc, rc=rc, t=t):
            rt_smem[tc] = c * TILE_CHUNK + t
            rs_smem[tc] = rc

        tc = jnp.where(open_tile, tc + 1, tc)
        et = jnp.where(open_tile, t, et)
        return (tc, et)

    def emit_hook(c, have1, rc, t, g1base, tz1):
        @pl.when(have1)
        def _(rc=rc):
            pk_smem[rc] = g1base + tz1

    _walk_pairs(
        meta_ref, words_ref, meta_smem, words_smem, meta_sem, words_sem,
        T=T, tile_chunk=TILE_CHUNK, MW=MW, WW=WW, Kw=Kw, Kw2=Kw2,
        extras_init=lambda: (jnp.int32(0), jnp.int32(-1)),  # tc, et
        flush_pred=flush_pred,
        flush_hook=flush_hook,
        pre_emit_hook=pre_emit_hook,
        emit_hook=emit_hook,
    )


def pack_words(mask: jnp.ndarray):
    """(T, K) bool hit mask → (meta (T, 1+Kw2), words (T, Kw)) int32.

    words[t, g] packs mask[t, 16g:16g+16] little-endian; meta row = [count,
    L2 words] where L2 bit g is set iff words[t, g] != 0. Pure dense XLA
    (reshape + dot against power-of-two weights — exact in f32 below 2^16).
    """
    T, K = mask.shape
    Kw = -(-K // 16)
    Kw2 = -(-Kw // 16)
    # Matmul form: words = mask @ W with W[k, k//16] = 2^(k%16), split into
    # low/high byte halves so every product and partial sum stays <= 255 —
    # exact even when the MXU rounds operands to bf16 (8-bit mantissa).
    # The naive reshape(T, Kw, 16).sum(-1) forced a 3M-element relayout
    # (~3 ms at T=4096, K=749); these two matmuls take microseconds.
    def _pack16(bits: jnp.ndarray) -> jnp.ndarray:
        n = bits.shape[1]
        groups = n // 16
        k = jnp.arange(n)
        col = jnp.arange(groups)
        sel = (k[:, None] // 16) == col[None, :]
        w_lo = jnp.where(sel, (2 ** (k % 16) * (k % 16 < 8))[:, None], 0)
        w_hi = jnp.where(sel, (2 ** ((k % 16) - 8) * (k % 16 >= 8))[:, None], 0)
        f = bits.astype(jnp.float32)
        lo = jnp.matmul(f, w_lo.astype(jnp.float32))
        hi = jnp.matmul(f, w_hi.astype(jnp.float32))
        return (lo + 256.0 * hi).astype(jnp.int32)

    mpad = jnp.pad(mask, ((0, 0), (0, Kw * 16 - K)))
    words = _pack16(mpad)
    wpad = jnp.pad(words != 0, ((0, 0), (0, Kw2 * 16 - Kw)))
    l2 = _pack16(wpad)
    count = mask.sum(axis=1).astype(jnp.int32)
    meta = jnp.concatenate([count[:, None], l2], axis=1)
    return meta, words


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_closest_hit(
    od8: jnp.ndarray,  # (T + 1, 8, L) f32 component-row tiles — dummy row T
    blocks: jnp.ndarray,  # (K + 1, 16, C) f32 — dummy row K (degenerate)
    meta: jnp.ndarray,  # (T, 1 + Kw2) int32
    words: jnp.ndarray,  # (T, Kw) int32
    tile: int,
    interpret: bool = False,
    entry: jnp.ndarray = None,  # (T, K) f32 cull slab entries — enables skip
    hitmask: jnp.ndarray = None,  # (T, W, K) int32 per-ray cull bitmask
):
    """→ (t_tile (T+1, tile) f32, tri_tile (T+1, tile) int32); exact closest
    hits over every culled (tile, cluster) pair. Callers slice off row T.

    ``entry`` (the cull kernel's per-(tile, cluster) slab entry distances)
    plus ``hitmask`` (its per-ray hit bitmask, cull_tiles(with_mask=True))
    enable the BVH-style early-out in the resident kernel: a pair is
    skipped when no ray that slab-hits its box has a bound reaching its
    entry (exact — see SKIP_SLACK). Ignored on the DMA-wave variant."""
    T1, _, lanes = od8.shape
    T = T1 - 1
    K1, _, C = blocks.shape
    Kw = words.shape[1]
    Kw2 = meta.shape[1] - 1
    # Row widths padded to multiples of 16 so flat chunk slices are
    # 128-aligned (TILE_CHUNK is a multiple of 8).
    MW = -(-(1 + Kw2) // 16) * 16
    WW = -(-Kw // 16) * 16
    tc = _tile_chunk(WW, MW - 1)

    tpad = (-T) % tc
    # Chunk-uniform flat metadata; padded tiles carry count 0 / empty words.
    meta = jnp.pad(meta, ((0, tpad), (0, MW - 1 - Kw2))).reshape(-1)
    words = jnp.pad(words, ((0, tpad), (0, WW - Kw))).reshape(-1)

    resident = (
        RESIDENT_BYTES > 0 and blocks.size * 4 <= resident_budget(T, tile, C)
    )
    skip = entry is not None and hitmask is not None and resident
    if resident:
        EW = 0
        NW = 0
        extra_in = []
        extra_ops = ()
        skip_scratch = []
        if skip:
            # Entry rows padded to 1024-element multiples: Mosaic tiles flat
            # 1-D HBM memrefs at (1024), and memref_slice requires slice
            # lengths/offsets aligned to that tiling (hardware-verified: 768
            # fails with "Slice shape along dimension 0 must be aligned to
            # tiling (1024)"). The meta/words DMAs above satisfy this by
            # construction (tc*MW >= 64*16). Pad value is MISS (never hit).
            EW = -(-entry.shape[1] // 1024) * 1024
            NW = hitmask.shape[1]
            # The double-buffered skip scratch (ent_smem + mask_smem below)
            # costs 2*(1 + NW)*EW*4 bytes of SMEM on top of the meta chunk
            # budget. Guard it loudly (like _tile_chunk) so larger tile/NW
            # or shard-K configs fail with a clear message instead of a
            # Mosaic SMEM allocation error.
            skip_smem = 2 * (1 + NW) * EW * 4
            if skip_smem > SKIP_SMEM_BUDGET:
                raise ValueError(
                    f"fused skip-path SMEM scratch ({skip_smem} B for "
                    f"EW={EW}, NW={NW}) exceeds the "
                    f"{SKIP_SMEM_BUDGET} B budget; shrink the cluster "
                    "shard (packet_intersect resident shards), raise "
                    "packet_tile, or disable packet_skip"
                )
            entry = jnp.pad(
                entry, ((0, 0), (0, EW - entry.shape[1])),
                constant_values=MISS,
            ).reshape(-1)
            # Mask rows flat per tile, word-major; padded clusters carry
            # zero bits (no ray hits them — they are never emitted anyway).
            hitmask = jnp.pad(
                hitmask, ((0, 0), (0, 0), (0, EW - hitmask.shape[2]))
            ).reshape(-1)
            extra_in = [
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ]
            extra_ops = (entry, hitmask)
            skip_scratch = [
                pltpu.VMEM((1, tile), jnp.float32),  # acc_best
                pltpu.VMEM((1, tile), jnp.float32),  # acc_tri
                pltpu.SMEM((2 * EW,), jnp.float32),  # ent_smem
                pltpu.SMEM((2 * NW * EW,), jnp.int32),  # mask_smem
            ]
        kernel = functools.partial(
            _fused_kernel_resident,
            tile=tile, tile_chunk=tc, Kw=Kw, Kw2=Kw2, MW=MW, WW=WW, EW=EW,
            NW=NW,
        )
        blocks_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = [
            pltpu.SMEM((2 * tc * MW,), jnp.int32),
            pltpu.SMEM((2 * tc * WW,), jnp.int32),
            pltpu.SMEM((RINGT,), jnp.int32),
            pltpu.SMEM((RINGT + 1,), jnp.int32),
            pltpu.SMEM((RING,), jnp.int32),
            pltpu.VMEM((2, 8, lanes), jnp.float32),
            pltpu.VMEM((_mt_batch_for(tile, C), 16, C), jnp.float32),
            *skip_scratch,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if skip:
            scratch.append(pltpu.SemaphoreType.DMA((2,)))  # ent_sem
            scratch.append(pltpu.SemaphoreType.DMA((2,)))  # mask_sem
    else:
        extra_in = []
        extra_ops = ()
        kernel = functools.partial(
            _fused_kernel, tile=tile, tile_chunk=tc, Kw=Kw, Kw2=Kw2, MW=MW, WW=WW
        )
        blocks_spec = pl.BlockSpec(memory_space=pltpu.HBM)
        scratch = [
            pltpu.SMEM((2 * tc * MW,), jnp.int32),
            pltpu.SMEM((2 * tc * WW,), jnp.int32),
            pltpu.SMEM((RING,), jnp.int32),
            pltpu.SMEM((RING,), jnp.int32),
            pltpu.VMEM((2, GROUP, 8, lanes), jnp.float32),
            pltpu.VMEM((2, GROUP, 16, C), jnp.float32),
            pltpu.VMEM((tile, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, GROUP)),
            pltpu.SemaphoreType.DMA((2, GROUP)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[
            # Explicit HBM: untiled memrefs, so the flat metadata DMA slices
            # need no 128-lane alignment (VMEM placement would force it).
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            blocks_spec,
            *extra_in,
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
    )
    t_tile, tri_tile = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T1, tile), jnp.float32),
            jax.ShapeDtypeStruct((T1, tile), jnp.float32),
        ),
        interpret=interpret,
    )(meta, words, od8, blocks, *extra_ops)
    return t_tile, tri_tile.astype(jnp.int32)
