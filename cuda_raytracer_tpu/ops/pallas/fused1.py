"""Single-program Pallas closest-hit: cull + pack + walk + sweep in ONE kernel.

The three-stage fused path (ops/pallas/cull.py -> XLA pack_words ->
ops/pallas/fused.py) still pays per closest-hit for the XLA glue between its
kernels: the (T, K) entry table and the (T, W, K) per-ray hit bitmask round-
trip HBM, pack_words runs two matmuls plus pad/reshape relayouts, and every
stage is a separate launch. This kernel does the whole closest-hit inside one
grid step per BLOCK of ``TB`` ray tiles (one tile per step measured 4+ us of
fixed cost — two synchronous staging DMAs, two latency-bound tiny matmuls,
scalar<->vector transitions — 11 ms/step at 2700 tile-steps on the round-3
teapot bench; blocking amortises all of it TB-fold):

  * gate — (optional, ``gate_g`` clusters per super) a cheap slab pass over
    tight super-AABBs; 128-cluster chunks of the main cull run only when one
    super is hit by some ray of the block. Conservative by box inclusion
    under the windowed slab test (a sub-box hit implies its super hits), so
    the emitted pair set — hence every output bit — is unchanged. This is
    what makes small-C cluster tables affordable: the dense cull scales with
    K, the gated cull with the hit region.
  * cull — the Tavian slab test evaluated directly in (128, tile) chunk
    orientation: box columns from a (Kp, 8) table against each tile's
    component rows. Same expression tree as ops/pallas/cull._slab_entry_mask
    element-for-element, so hit decisions and entries are bit-identical.
    Per-ray entries stay live in VMEM for the sweep's skip test; misses
    store +inf, so "hit" needs no second plane (any finite windowed entry is
    <= the 1e30 MISS sentinel < inf).
  * pack — the block's any-hit columns (128, TB) are packed into 16-bit
    words by one shared (16, 128) byte-split weight matmul per chunk (exact
    under bf16 operand rounding, values <= 255 — the pack_words argument);
    the whole (Kw, TB) word panel is DMA'd VMEM -> SMEM once per block.
  * walk — a scalar loop over each tile's Kw words emits set-bit cluster
    ids into an SMEM ring; work is proportional to live pairs.
  * sweep — each tile's ring is swept in MT_BATCH groups from the
    VMEM-resident block table (fused._mt_batch, bit-identical MT core),
    gated by a PER-RAY slab-entry early-out: a pair is swept only if some
    ray has a bound (incoming window min accumulated best) reaching that
    ray's OWN entry distance for the pair's box (misses carry +inf, so they
    never demand). This is strictly stronger than fused.py's tile-min-entry
    test and exact by the same argument (fused.SKIP_SLACK): a triangle hit
    in a box lies at or beyond that ray's slab entry.

Ray tiles whose every ray is dead (negative search window — they cannot hit
any box) skip their cull, walk and sweep: one vector max against the window
row gates each tile, and a fully-dead BLOCK skips everything, so dead tail
tiles cost ~nothing (full-res ray blocks keep long dead tails between
pipeline-level compactions).

No (T, K) arrays ever exist: entry and hit live per block only. Reference
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
MAX_K = 4096
# Cull chunk width: the dense slab matrix is computed 128 box columns at a
# time (one lane tile), each chunk gated independently.
CHUNK = 128
# Ray tiles per grid step (fixed-cost amortisation; see module docstring).
TILE_BLOCK = 8


def _shard_overhead_bytes(
    tile: int, K: int, tb: int = TILE_BLOCK, pack: int = 1
) -> int:
    """fused1-only fixed VMEM footprint for a K-box shard, on top of the
    block table itself: the (TB, Kp/pack, lanes) entry scratch (lane-padded
    to 128 by Mosaic's (8, 128) tiling), the (Kp, 8) box table, the shared
    packing weights and the packed-word staging panel. fused.resident_budget
    only accounts for the shapes the 3-stage fused kernel carries, so sizing
    fused1 shards against it alone can bust the 15 MiB scoped-VMEM cap on
    exactly the large scenes (e.g. lamp) that sharding is meant to handle."""
    Kp = -(-K // CHUNK) * CHUNK
    lanes = max(tile, 128)
    scratch = tb * (Kp // pack) * lanes * 4  # ent_vmem (block granularity)
    aabb = Kp * 8 * 4
    weights = 16 * 128 * 4
    words = 2 * (Kp // 16) * 128 * 4  # (Kw, TB) staging, lane-padded
    acols = CHUNK * 128 * 4
    return scratch + aabb + weights + words + acols


def plan_shards(T: int, tile: int, C: int, K: int, pack: int = 1) -> int:
    """Number of table shards so each fused1 call fits the scoped-VMEM
    budget: per-shard block bytes PLUS the fused1 fixed footprint (which
    itself shrinks with the shard's K) must clear fused.resident_budget.
    ``K`` counts cull boxes; with ``pack`` > 1 each block carries ``pack``
    boxes' triangles (C lanes total), so block bytes scale with K/pack."""
    budget = resident_budget(T, tile, C)
    n = max(1, -(-K // MAX_K))
    while n < K:
        k_shard = -(-K // n)
        blk_bytes = (-(-k_shard // pack)) * 16 * C * 4
        need = blk_bytes + _shard_overhead_bytes(tile, k_shard, pack=pack)
        if k_shard <= MAX_K and need <= budget:
            break
        n += 1
    return min(n, K)


def _slab_rows(o_row, d_row, boxT, win):
    """Windowed Tavian slab test of one tile's rays against ``boxT``
    (rows, 8) box columns → (hit (rows, tile) bool, entry (rows, tile)).
    Bit-identical expression tree to cull._slab_entry_mask: same safe
    inverse, same running-window min/max order, same [0, tmax] window."""
    rows = boxT.shape[0]
    tile = win.shape[1]
    tmin_run = jnp.zeros((rows, tile), jnp.float32)
    tmax_run = jnp.broadcast_to(win, (rows, tile))
    tiny = jnp.float32(1e-30)
    huge = jnp.float32(1e30)
    for axis in range(3):
        o = o_row[axis]  # (1, tile)
        d = d_row[axis]
        small = jnp.abs(d) < tiny
        inv = jnp.where(
            small,
            jnp.where(d < 0, -huge, huge),
            1.0 / jnp.where(small, 1.0, d),
        )
        lo = boxT[:, axis:axis + 1]  # (rows, 1)
        hi = boxT[:, 3 + axis:4 + axis]
        t1 = (lo - o) * inv  # (rows, tile)
        t2 = (hi - o) * inv
        tmin_run = jnp.minimum(jnp.maximum(t1, tmin_run), jnp.maximum(t2, tmin_run))
        tmax_run = jnp.maximum(jnp.minimum(t1, tmax_run), jnp.minimum(t2, tmax_run))
    return tmin_run <= tmax_run, tmin_run


def _fused1_kernel(
    od8_ref,  # (TB, 8, L) f32 — this block's component-row tiles (BlockSpec)
    aabbT_ref,  # (Kp, 8) f32 VMEM — box columns [min xyz, max xyz, 0, 0]
    supT_ref,  # (Ksp, 8) f32 VMEM — super boxes (8-row dummy when ungated)
    w16_ref,  # (16, 128) f32 VMEM — shared byte-split packing weights
    vmask_ref,  # (Kp, 1) f32 VMEM — 1.0 for real boxes (pack > 1; else (8,1))
    blocks_ref,  # (>= K, 16, C) f32 VMEM — resident cluster blocks
    t_out_ref,  # (T1p, tile) f32 VMEM
    tri_out_ref,  # (T1p, tile) f32 VMEM
    words_vmem,  # VMEM (Kw, TB) int32 — packed word panel staging
    words_smem,  # SMEM (Kw, TB) int32
    gw_vmem,  # VMEM (8, 1) int32 — packed chunk-gate words staging
    gw_smem,  # SMEM (8, 1) int32
    pk_smem,  # SMEM (MAX_K,) int32 — per-tile pair ring (reused across tiles)
    ent_vmem,  # VMEM (TB, Kp/pack, tile) f32 — per-ray slab entries (+inf unhit)
    acols_vmem,  # VMEM (CHUNK, TB) f32 — any-hit columns staging per chunk
    blkB_buf,  # VMEM (B, 16, C) f32 — MT batch staging
    acc_best,  # VMEM (1, tile) f32
    acc_tri,  # VMEM (1, tile) f32
    words_sem,  # DMA (1,)
    gw_sem,  # DMA (1,)
    *,
    tile: int,
    K: int,
    gate_g: int,
    pack: int,
):
    blk = pl.program_id(0)
    TB = od8_ref.shape[0]
    Kp = aabbT_ref.shape[0]
    nch = Kp // CHUNK
    Kw = Kp // 16
    BPC = CHUNK // pack  # blocks per chunk (pack > 1: split-plane layout)
    B = blkB_buf.shape[0]
    gated = gate_g > 0
    inf = jnp.float32("inf")

    @pl.when(blk == 0)
    def _():
        t_out_ref[:] = jnp.full(t_out_ref.shape, MISS, jnp.float32)
        tri_out_ref[:] = jnp.full(tri_out_ref.shape, -1.0, jnp.float32)

    # Per-tile component rows and liveness (a dead tile's rays all carry
    # negative windows and can hit nothing).
    wins = [od8_ref[j, 6:7, :tile] for j in range(TB)]
    o_rows = [
        [od8_ref[j, a:a + 1, :tile] for a in range(3)] for j in range(TB)
    ]
    d_rows = [
        [od8_ref[j, 3 + a:4 + a, :tile] for a in range(3)] for j in range(TB)
    ]
    live = [jnp.max(wins[j]) >= 0.0 for j in range(TB)]
    any_live = functools.reduce(jnp.logical_or, live)

    @pl.when(any_live)
    def _body():
        # ---- gate: super-AABB pre-pass → per-chunk scalar predicates ------
        if gated:
            spc = CHUNK // gate_g  # supers per 128-cluster chunk
            Ksp = supT_ref.shape[0]
            supT = supT_ref[:, :]
            sup_any = jnp.zeros((Ksp, 1), jnp.float32)
            for j in range(TB):
                # Dead tiles' windows are negative, so their slab test hits
                # nothing — no masking needed, and the super pass is too
                # small to be worth a per-tile skip.
                sup_hit, _ = _slab_rows(o_rows[j], d_rows[j], supT, wins[j])
                sup_any = jnp.maximum(
                    sup_any,
                    jnp.max(sup_hit.astype(jnp.float32), axis=1,
                            keepdims=True),
                )
            # counts[c] = # hit supers in chunk c: one (128, Ksp) 0/1 matmul
            # (rows past nch select no supers → gate 0 → chunk never runs).
            row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, Ksp), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, Ksp), 1)
            sel = ((col >= row * spc) & (col < (row + 1) * spc)).astype(
                jnp.float32
            )
            counts = jax.lax.dot_general(
                sel, sup_any, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (128, 1)
            gcol = (counts > 0).astype(jnp.float32)
            gw = jax.lax.dot_general(
                w16_ref[:, :], gcol, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (16, 1)
            gw_vmem[:, :] = (gw[:8] + 256.0 * gw[8:]).astype(jnp.int32)
            copy = pltpu.make_async_copy(gw_vmem, gw_smem, gw_sem)
            copy.start()
            copy.wait()
            # Ungated chunks contribute no words; zero the panel once.
            words_vmem[:, :] = jnp.zeros((Kw, TB), jnp.int32)

        # ---- cull + pack, one 128-column chunk at a time -------------------
        def do_chunk(c: int):
            lo = c * CHUNK
            boxT = aabbT_ref[lo:lo + CHUNK, :]
            acols_vmem[:, :] = jnp.zeros((CHUNK, acols_vmem.shape[1]),
                                         jnp.float32)
            for j in range(TB):
                @pl.when(live[j])
                def _(j=j, lo=lo, boxT=boxT, c=c):
                    hit, tmin_run = _slab_rows(
                        o_rows[j], d_rows[j], boxT, wins[j]
                    )
                    ent = jnp.where(hit, tmin_run, inf)
                    if pack == 1:
                        ent_vmem[j, lo:lo + CHUNK, :] = ent
                    else:
                        # Split-plane chunk layout: rows [0, BPC) are the
                        # chunk's blocks' half-0 boxes, [BPC, 2*BPC) half-1,
                        # so the per-BLOCK entry (min over hit halves — the
                        # skip test's conservative per-ray bound) folds with
                        # contiguous sublane slices.
                        eb = ent[0:BPC, :]
                        for h in range(1, pack):
                            eb = jnp.minimum(eb, ent[h * BPC:(h + 1) * BPC, :])
                        ent_vmem[j, c * BPC:(c + 1) * BPC, :] = eb
                    any_col = jnp.max(
                        hit.astype(jnp.float32), axis=1, keepdims=True
                    )  # (128, 1)
                    if pack > 1:
                        # Padding boxes (rows past K) are far points that
                        # only degenerate exact-tie rays can slab-hit; their
                        # block halves don't exist. The split-plane row
                        # permutation makes the natural-index compare
                        # awkward in-kernel, so the mask rides in as a
                        # permuted 0/1 column.
                        any_col = any_col * vmask_ref[lo:lo + CHUNK, :]
                    elif (c + 1) * CHUNK > K:
                        # Same mask, natural order: one iota compare.
                        kcol = jax.lax.broadcasted_iota(
                            jnp.int32, (CHUNK, 1), 0
                        ) + lo
                        any_col = jnp.where(kcol < K, any_col, 0.0)
                    acols_vmem[:, j:j + 1] = any_col
            wcol = jax.lax.dot_general(
                w16_ref[:, :], acols_vmem[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (16, TB)
            words_vmem[c * 8:(c + 1) * 8, :] = (
                wcol[:8] + 256.0 * wcol[8:]
            ).astype(jnp.int32)

        for c in range(nch):
            if gated:
                gbit = (
                    jax.lax.shift_right_logical(
                        gw_smem[c // 16, 0], jnp.int32(c % 16)
                    )
                    & 1
                )

                @pl.when(gbit != 0)
                def _(c=c):
                    do_chunk(c)
            else:
                do_chunk(c)

        copy = pltpu.make_async_copy(words_vmem, words_smem, words_sem)
        copy.start()
        copy.wait()

        # ---- per tile: walk the word column, sweep the pair ring -----------
        for j in range(TB):
            @pl.when(live[j])
            def _(j=j):
                if pack == 1:
                    def word_body(w, rc):
                        def bit_cond(cy):
                            word, _ = cy
                            return word != 0

                        def bit_body(cy):
                            word, rc = cy
                            tz = _ctz16(word)
                            pk_smem[rc] = w * 16 + tz
                            return word & (word - 1), rc + 1

                        word0 = words_smem[w, j]
                        _, rc = jax.lax.while_loop(
                            bit_cond, bit_body, (word0, rc)
                        )
                        return rc

                    rc = jax.lax.fori_loop(0, Kw, word_body, jnp.int32(0))
                else:
                    # pack == 2: one ring entry per BLOCK with a 2-bit
                    # half-mask. The split-plane word panel puts a chunk's
                    # half-0 bits in word rows [8c, 8c+4) and half-1 bits in
                    # [8c+4, 8c+8), so block-word g pairs rows (c*8 + s,
                    # c*8 + 4 + s) with c = g // 4, s = g % 4.
                    wpc = CHUNK // 16 // pack  # block words per chunk (4)

                    def word_body(g, rc):
                        s = g & (wpc - 1)  # wpc is a power of two
                        c8 = (g - s) * pack  # g // wpc * (CHUNK // 16)
                        w0 = words_smem[c8 + s, j]
                        w1 = words_smem[c8 + wpc + s, j]

                        def bit_cond(cy):
                            word, _ = cy
                            return word != 0

                        def bit_body(cy):
                            word, rc = cy
                            tz = _ctz16(word)
                            h0 = jax.lax.shift_right_logical(w0, tz) & 1
                            h1 = jax.lax.shift_right_logical(w1, tz) & 1
                            pk_smem[rc] = (g * 16 + tz) * 4 + h0 + h1 * 2
                            return word & (word - 1), rc + 1

                        _, rc = jax.lax.while_loop(
                            bit_cond, bit_body, (w0 | w1, rc)
                        )
                        return rc

                    rc = jax.lax.fori_loop(
                        0, Kw // pack, word_body, jnp.int32(0)
                    )

                @pl.when(rc > 0)
                def _():
                    raysT = od8_ref[j][:, :tile].T  # (tile, 8)
                    row = pl.ds(blk * TB + j, 1)
                    win = wins[j]
                    acc_best[:, :] = t_out_ref[row, :]
                    acc_tri[:, :] = tri_out_ref[row, :]
                    n_groups = pl.cdiv(rc, B)

                    C_blk = blocks_ref.shape[2]

                    def group_body(g, _):
                        base = g * B
                        bound = jnp.minimum(acc_best[:, :], win)
                        needv = jnp.zeros((1, tile), jnp.bool_)
                        for b in range(B):
                            p = jnp.minimum(base + b, rc - 1)
                            k = pk_smem[p]
                            if pack > 1:
                                k = jax.lax.shift_right_logical(k, 2)
                            # +inf where the ray misses the box ⇒ never
                            # demands a sweep. (pack > 1: entry is the min
                            # over the block's HIT halves — conservative.)
                            ent_k = ent_vmem[j, pl.ds(k, 1), :]  # (1, tile)
                            needv = needv | (
                                bound >= ent_k * jnp.float32(SKIP_SLACK)
                            )
                        need = jnp.any(needv)

                        @pl.when(need)
                        def _():
                            masks = []
                            for b in range(B):
                                p = jnp.minimum(base + b, rc - 1)
                                e = pk_smem[p]
                                if pack > 1:
                                    kb = jax.lax.shift_right_logical(e, 2)
                                    # Lane window of the HIT halves: unhit
                                    # halves mask to MISS so the effective
                                    # pair set stays at sub-cluster
                                    # granularity (bit-equal to a C_sub
                                    # table on any backend).
                                    half = C_blk // pack
                                    lo_b = jnp.where((e & 1) != 0, 0, half)
                                    hi_b = jnp.where((e & 2) != 0, C_blk, half)
                                    lane = jax.lax.broadcasted_iota(
                                        jnp.int32, (1, 1, C_blk), 2
                                    )
                                    masks.append(
                                        (lane >= lo_b) & (lane < hi_b)
                                    )
                                else:
                                    kb = e
                                blkB_buf[pl.ds(b, 1)] = blocks_ref[
                                    pl.ds(kb, 1)
                                ]
                            lane_valid = (
                                jnp.concatenate(masks, axis=0)
                                if pack > 1 else None
                            )
                            b_g, tr_g = _mt_batch(
                                raysT, blkB_buf[:, :, :], tile, C_blk,
                                lane_valid,
                            )
                            best = acc_best[:, :]
                            tri = acc_tri[:, :]
                            upd = (b_g < best) | ((b_g == best) & (tr_g > tri))
                            acc_best[:, :] = jnp.where(upd, b_g, best)
                            acc_tri[:, :] = jnp.where(upd, tr_g, tri)

                        return 0

                    jax.lax.fori_loop(0, n_groups, group_body, 0)
                    t_out_ref[row, :] = acc_best[:, :]
                    tri_out_ref[row, :] = acc_tri[:, :]


def _pack_weights16() -> jnp.ndarray:
    """Shared chunk packing weights (16, 128): rows 0-7 are the low-byte
    halves, rows 8-15 the high-byte halves — W[w, k] = 2^(k%16 - byte*8)
    when k//16 == w%8 and k%16 lies in the byte. One constant table packs
    every 128-column chunk (and the chunk-gate column)."""
    import numpy as np

    k = np.arange(128)
    w = np.arange(8)
    sel = (k[None, :] // 16) == w[:, None]
    lo = np.where(sel & (k[None, :] % 16 < 8), 2.0 ** (k[None, :] % 16), 0.0)
    hi = np.where(sel & (k[None, :] % 16 >= 8), 2.0 ** (k[None, :] % 16 - 8), 0.0)
    return jnp.asarray(np.concatenate([lo, hi], axis=0), jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("tile", "gate_g", "interpret", "pack")
)
def fused1_closest_hit(
    od8: jnp.ndarray,  # (T + 1, 8, L) f32 component-row tiles — dummy row T
    aabb: jnp.ndarray,  # (8, K) f32 — rows [min xyz, max xyz, 0, 0]
    blocks: jnp.ndarray,  # (>= K/pack, 16, C) f32 — rows past K/pack unread
    tile: int,
    sup_aabb: jnp.ndarray = None,  # (8, Ks) super boxes — enables gating
    gate_g: int = 0,  # boxes per super (static; 0 = flat cull)
    interpret: bool = False,
    pack: int = 1,  # cull boxes per block (cluster_pack; 1 or 2)
):
    """→ (t_tile (T+1, tile) f32, tri_tile (T+1, tile) int32): exact closest
    hits over every (tile, box) pair whose AABB some ray slab-hits, computed
    in one kernel launch. The per-ray slab-entry early-out is always on (it
    costs nothing extra here — per-ray entries are already in VMEM).
    ``sup_aabb``/``gate_g`` enable the chunk-gated cull (conservative,
    bit-equal results). ``pack=2`` is the paired-sub-cluster design
    (PERF_NOTES roadmap item 0): boxes at C/2-triangle granularity, two
    boxes' triangles per 128-lane block, unhit halves lane-masked at the
    sweep — the effective pair set equals an exact C/2 cull. The caller
    shards tables above the VMEM budget and merges (packet_intersect),
    exactly like the fused backend."""
    T1, _, L = od8.shape
    T = T1 - 1
    C = blocks.shape[2]
    K = aabb.shape[1]
    if K > MAX_K:
        raise ValueError(f"fused1 shard K={K} exceeds MAX_K={MAX_K}")
    if gate_g and CHUNK % gate_g:
        raise ValueError(f"gate_g={gate_g} must divide {CHUNK}")
    if gate_g and sup_aabb is None:
        raise ValueError("gate_g > 0 requires sup_aabb")
    if pack not in (1, 2):
        raise ValueError(f"pack={pack} unsupported (1 or 2)")
    if pack > 1 and (K % pack or C % pack):
        raise ValueError(f"pack={pack} must divide K={K} and C={C}")
    nch = -(-K // CHUNK)
    Kp = nch * CHUNK
    Kw = Kp // 16
    # Pad the tile axis to a TILE_BLOCK multiple with DEAD tiles (window row
    # -1): padded tiles then never cull, walk or sweep. od8's dummy row T
    # (zero tile) is dropped — this kernel has no sentinel pairs to feed it.
    TB = TILE_BLOCK
    tpad = (-T) % TB
    pad_tile = jnp.zeros((tpad, 8, L), jnp.float32)
    if tpad:
        pad_tile = pad_tile.at[:, 6, :].set(-1.0)
    od8k = jnp.concatenate([od8[:T], pad_tile], axis=0)
    n_blocks = (T + tpad) // TB
    # Output rows: T real tiles + the dummy row (padded tile rows write
    # nothing — they are dead — but keep the buffer TB-aligned + 1).
    T1p = T + tpad + 1

    # Box columns (Kp, 8): padded clusters get far point boxes (never hit by
    # non-degenerate rays; degenerate exact-tie hits are masked at pack).
    aabbT = jnp.full((Kp, 8), 1e17, jnp.float32).at[:K].set(aabb.T[:K])
    aabbT = aabbT.at[:K, 6:8].set(0.0)
    if pack > 1:
        # Split-plane chunk layout: within each 128-box chunk, rows
        # [h*BPC, (h+1)*BPC) hold half h of the chunk's BPC blocks — the
        # kernel's per-block entry fold and dual word planes then use only
        # contiguous slices. The real-box mask rides along, permuted the
        # same way (the kernel can't cheaply recompute natural indices).
        BPC = CHUNK // pack
        perm = (
            lambda x: x.reshape(nch, BPC, pack, x.shape[-1])
            .transpose(0, 2, 1, 3)
            .reshape(Kp, x.shape[-1])
        )
        aabbT = perm(aabbT)
        vmask = perm(
            (jnp.arange(Kp) < K).astype(jnp.float32).reshape(Kp, 1)
        )
    else:
        vmask = jnp.ones((8, 1), jnp.float32)
    gated = bool(gate_g) and sup_aabb is not None
    if gated:
        Ks = sup_aabb.shape[1]
        Ksp = max(8, -(-Ks // 8) * 8)
        supT = jnp.full((Ksp, 8), 1e17, jnp.float32).at[:Ks].set(sup_aabb.T[:Ks])
        supT = supT.at[:Ks, 6:8].set(0.0)
    else:
        supT = jnp.full((8, 8), 1e17, jnp.float32)
    w16 = _pack_weights16()

    B = _mt_batch_for(tile, C)
    kernel = functools.partial(
        _fused1_kernel, tile=tile, K=K, gate_g=gate_g if gated else 0,
        pack=pack,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((TB, 8, L), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
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
            pltpu.VMEM((Kw, TB), jnp.int32),
            pltpu.SMEM((Kw, TB), jnp.int32),
            pltpu.VMEM((8, 1), jnp.int32),
            pltpu.SMEM((8, 1), jnp.int32),
            pltpu.SMEM((MAX_K,), jnp.int32),
            pltpu.VMEM((TB, Kp // pack, tile), jnp.float32),
            pltpu.VMEM((CHUNK, TB), jnp.float32),
            pltpu.VMEM((B, 16, C), jnp.float32),
            pltpu.VMEM((1, tile), jnp.float32),
            pltpu.VMEM((1, tile), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    t_tile, tri_tile = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T1p, tile), jnp.float32),
            jax.ShapeDtypeStruct((T1p, tile), jnp.float32),
        ),
        interpret=interpret,
    )(od8k, aabbT, supT, w16, vmask, blocks)
    # Restore the caller's (T + 1, tile) shape: real rows [0, T) plus a
    # MISS dummy row (padded rows are untouched MISS rows anyway).
    t_tile = jnp.concatenate([t_tile[:T], t_tile[-1:]], axis=0)
    tri_tile = jnp.concatenate([tri_tile[:T], tri_tile[-1:]], axis=0)
    return t_tile, tri_tile.astype(jnp.int32)
