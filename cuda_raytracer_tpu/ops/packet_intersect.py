"""Packet (ray-tile) clustered closest-hit — the fast path.

A per-ray clustered intersector (round 1; since removed) spent ~90% of each
bounce on pair machinery: a per-ray top-k, a sort of R·H ray-cluster pairs,
and large scatters (measured on TPU v5e: 10.8 + 12.7 + 28.7 + ~24 ms of an
83 ms bounce at R=131k on teapot, vs ~7 ms of actual intersection).
Exploiting ray coherence at *tile* granularity removes all of it:

  A. cull   — slab-test rays against all K cluster AABBs, reducing each
              128-ray tile's hits with a lane-wise OR so only a (T, K) bool
              mask ever materialises. No top-k, no per-ray lists.
  B. pairs  — the (tile, cluster) work list is the mask's nonzero set in
              tile-major order (already grouped by tile — no sort), each
              pair tagged with its *rank* within its tile; pairs past the
              per-tile ``cap`` are counted as overflow. One cumsum + one
              sorted/unique scatter over T·K elements (≈190k for teapot —
              thousands of times smaller than the per-ray pair stream).
  C. sweep  — a while_loop with a **dynamic trip count** walks the compacted
              pair prefix in chunks; each pair runs Möller–Trumbore of the
              tile's 128 rays against the cluster's (16, C) block, dense on
              the VPU. Results land in a (T, cap, tile) candidate buffer at
              the pair's (tile, rank) slot.
  D. reduce — closest hit per ray is a *dense* min over the cap axis plus an
              equality-masked max for the triangle id. No segment ops, no
              large scatters (XLA TPU scatter costs ~1 µs per 128-lane row —
              measured dominating an earlier segment-based variant).

Work per tile is |clusters hit by any ray in tile| · 128 · C triangle tests —
more raw intersection math than the per-ray version (a tile's cluster union
is a superset of each ray's), but dense VPU math is the cheap part; coherence
(primary rays by construction, bounced rays via the Morton reorder, reference
raytracing.cu:238-247) keeps the union small.

Reference behaviour covered: Scene::bvh_closest_hit_distance semantics
(scene.cu:134-241) — closest triangle hit with epsilon 0.005, shared
sphere/triangle hit-index space (hit index offset by sphere_count,
scene.cu:190).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.models.scene import Scene
from cuda_raytracer_tpu.ops.intersect import HIT_EPS, MISS
from cuda_raytracer_tpu.ops.traverse import _safe_inv_dir

DEFAULT_TILE = 128
# Per-tile hit-cluster capacity (candidate-buffer depth). Teapot primary
# tiles peak at ~6; bounced-but-Morton-sorted tiles at ~16. Overflow is
# counted and surfaced, never silent.
DEFAULT_CAP = 16
DEFAULT_SWEEP_CHUNK = 64
# Ray rows per cull step: bounds the transient (rows, K) slab matrix.
CULL_ROWS = 1 << 13
# Pallas path round-1 sweep width: nearest clusters per tile by slab entry
# (0 disables the two-round front-to-back sweep).
ROUND1_NEAREST = 4


def _cull_tile_mask(
    origin: jnp.ndarray,  # (r, 3)
    inv_dir: jnp.ndarray,  # (r, 3)
    tmax: jnp.ndarray,  # (r,)
    cmin: jnp.ndarray,  # (K, 3)
    cmax: jnp.ndarray,  # (K, 3)
    tile: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-test a ray chunk against every cluster, reduced per 128-ray tile:
    OR of the hit mask and min of the entry distance over the tile's lanes →
    ((r // tile, K) bool, (r // tile, K) float32 entry, +inf where unhit).
    Branchless Tavian slab test with a [0, tmax] window (reference
    ray_aabb_intersection, scene.cu:107-132); dead rays carry tmax < 0,
    rejecting every box."""
    K = cmin.shape[0]
    tmin_run = jnp.zeros(origin.shape[:1] + (K,), jnp.float32)
    tmax_run = jnp.broadcast_to(tmax[:, None], tmin_run.shape)
    for axis in range(3):
        t1 = (cmin[None, :, axis] - origin[:, None, axis]) * inv_dir[:, None, axis]
        t2 = (cmax[None, :, axis] - origin[:, None, axis]) * inv_dir[:, None, axis]
        tmin_run = jnp.minimum(jnp.maximum(t1, tmin_run), jnp.maximum(t2, tmin_run))
        tmax_run = jnp.maximum(jnp.minimum(t1, tmax_run), jnp.minimum(t2, tmax_run))
    mask = tmin_run <= tmax_run
    entry = jnp.where(mask, tmin_run, jnp.inf).reshape(-1, tile, K).min(axis=1)
    return mask.reshape(-1, tile, K).any(axis=1), entry


def _mt_tile_blocks(
    po: jnp.ndarray,  # (g, tile, 3)
    pd: jnp.ndarray,  # (g, tile, 3)
    blocks: jnp.ndarray,  # (g, 16, C) — rows 0-8: p1/e1/e2 components
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense Möller–Trumbore of each tile's rays against its cluster block
    (scene.cu:163-195 semantics) → per-ray (best_t, best_slot).

    Division-free acceptance: u/v/t tests compare the *scaled* barycentrics
    (u·det etc.) against |det| with the determinant's sign folded in — one
    VPU divide per candidate instead of three (measured 1.53 vs 1.73 µs per
    128×1024 tile on v5e). The reported t = t_scaled/det is bit-identical to
    the divided form; accept decisions can differ from it by one ulp at
    exact u,v ∈ {0,1} boundaries (measure-zero set)."""
    p1x, p1y, p1z = (blocks[:, i, None, :] for i in range(0, 3))
    e1x, e1y, e1z = (blocks[:, i, None, :] for i in range(3, 6))
    e2x, e2y, e2z = (blocks[:, i, None, :] for i in range(6, 9))
    dx = pd[..., 0:1]
    dy = pd[..., 1:2]
    dz = pd[..., 2:3]
    ox = po[..., 0:1]
    oy = po[..., 1:2]
    oz = po[..., 2:3]
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
        (det != 0) & (us >= 0) & (us <= ad) & (vs >= 0) & (us + vs <= ad)
        & (ts >= HIT_EPS * ad)
    )
    t = jnp.where(ok, td / jnp.where(det == 0, 1.0, det), MISS)  # (g, tile, C)
    best = jnp.min(t, axis=-1)
    slot = jnp.argmin(t, axis=-1).astype(jnp.int32)
    return best, slot


@partial(
    jax.jit,
    static_argnames=("tile", "cap", "sweep_chunk", "backend", "two_round", "skip"),
)
def closest_hit_packet(
    scene: Scene,
    origin: jnp.ndarray,  # (R, 3)
    direction: jnp.ndarray,  # (R, 3)
    closest: jnp.ndarray,  # (R,) incoming best (spheres); negative for dead rays
    hit_index: jnp.ndarray,  # (R,) int32
    tile: int = DEFAULT_TILE,
    cap: int = DEFAULT_CAP,
    sweep_chunk: int = DEFAULT_SWEEP_CHUNK,
    backend: str = "xla",  # "xla" | "pallas" | "pallas_interpret"
    two_round: bool = False,  # pallas path: front-to-back two-round sweep
    skip: bool = False,  # fused path: slab-entry early-out (fused.SKIP_SLACK)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Update (closest, hit_index) with the nearest triangle hit.

    Returns (closest, hit_index, overflow); overflow counts (tile, cluster)
    pairs dropped past the per-tile ``cap`` (each may hide a hit — monitor
    and raise the cap if it ever goes non-zero).

    ``backend`` selects the phase C+D engine: "xla" (while_loop sweep +
    dense reduce) or "pallas" (the hand-pipelined TPU kernel,
    ops/pallas/sweep.py; "pallas_interpret" runs it in interpreter mode for
    CPU tests)."""
    R = origin.shape[0]
    K = scene.num_clusters
    C = scene.cluster_tris
    if getattr(scene.config, "cluster_pack", 1) > 1 and backend not in (
        "fused1", "fused1_interpret"
    ):
        # Packed tables break the box↔block 1:1 map every other engine
        # indexes by — fail fast instead of sweeping the wrong triangles.
        raise ValueError(
            f"cluster_pack > 1 requires the fused1 backend, got {backend!r}"
        )
    # Two-level cull (models/cluster.split_aabbs): the box tables hold S
    # tight chunk boxes per cluster; masks/entries reduce to block
    # granularity (OR / min) right after each cull.
    S = scene.cluster_min.shape[0] // max(K, 1) if K else 1

    pad = (-R) % tile
    Rp = R + pad
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(direction, ((0, pad), (0, 0)), constant_values=1.0)
        closest_p = jnp.pad(closest, (0, pad), constant_values=-1.0)
    else:
        closest_p = closest
    T = Rp // tile

    if backend in ("fused1", "fused1_interpret"):
        # Single-program closest-hit (ops/pallas/fused1.py): cull + pack +
        # walk + sweep in one kernel launch per table shard — no (T, K)
        # entry/mask arrays, no XLA pack glue. Requires cull_split == 1
        # (the in-kernel cull is flat) and a VMEM-resident table shard;
        # larger tables run as merged shards exactly like the fused path.
        from cuda_raytracer_tpu.ops.pallas import fused1 as pallas_fused1

        if S != 1:
            raise ValueError("fused1 backend requires cull_split == 1")
        pack = getattr(scene.config, "cluster_pack", 1)
        interpret = backend == "fused1_interpret"
        comps = [
            origin[:, 0], origin[:, 1], origin[:, 2],
            direction[:, 0], direction[:, 1], direction[:, 2],
            closest_p, jnp.zeros((Rp,), jnp.float32),
        ]
        od8 = jnp.stack([v.reshape(T, tile) for v in comps], axis=1)
        od8 = jnp.pad(od8, ((0, 1), (0, 0), (0, max(0, 128 - tile))))
        aabb8 = jnp.concatenate(
            [scene.cluster_min.T, scene.cluster_max.T,
             jnp.zeros((2, K), jnp.float32)], axis=0,
        )  # (8, K)
        # Shard count accounts for fused1's own VMEM residents (per-ray
        # entry scratch, box table, packing weights) on top of the block
        # table — fused.resident_budget alone under-counts them.
        # Cap at the BLOCK count: shard bounds are block-aligned, so more
        # shards than blocks would produce empty (zero-K) kernel calls.
        n_shards = min(
            pallas_fused1.plan_shards(T, tile, C, K, pack=pack),
            max(1, K // pack),
        )

        # In-kernel chunk-gated cull (config.cull_hier = G clusters per
        # tight super box, BVH-cut DFS order so siblings group): the shard's
        # dense slab matrix is computed 128 columns at a time, each chunk
        # only when one of its supers is hit. Conservative ⇒ bit-equal.
        # cull_hier == 0 means AUTO here (G = 16, measured: 83.2 → 78.3 ms
        # bench grad step at C=256, and the full-res win depends on it);
        # pass -1 to force the flat cull.
        G = getattr(scene.config, "cull_hier", 0) or 16
        if G < 0:
            G = 0
        if G and pallas_fused1.CHUNK % G:
            raise ValueError(f"cull_hier={G} must divide {pallas_fused1.CHUNK}")

        def shard_supers(lo, hi):
            ks = hi - lo
            n_sup = -(-ks // G)
            pad = n_sup * G - ks
            smin = jnp.pad(
                scene.cluster_min[lo:hi], ((0, pad), (0, 0)),
                constant_values=jnp.inf,
            ).reshape(n_sup, G, 3)
            smax = jnp.pad(
                scene.cluster_max[lo:hi], ((0, pad), (0, 0)),
                constant_values=-jnp.inf,
            ).reshape(n_sup, G, 3)
            # Padding clusters are far point boxes (1e17); exclude them from
            # the tight union so supers stay tight (an all-padding group
            # keeps the far point box).
            is_pad = smin[:, :, 0] >= 1e16
            gmin = jnp.where(is_pad[:, :, None], jnp.inf, smin).min(axis=1)
            gmax = jnp.where(is_pad[:, :, None], -jnp.inf, smax).max(axis=1)
            empty = jnp.all(is_pad, axis=1)[:, None]
            gmin = jnp.where(empty, 1e17, gmin)
            gmax = jnp.where(empty, 1e17, gmax)
            return jnp.concatenate(
                [gmin.T, gmax.T, jnp.zeros((2, n_sup), jnp.float32)], axis=0
            )  # (8, n_sup)

        out = None
        for s in range(n_shards):
            # Shard bounds in whole BLOCKS (pack boxes each), so paired
            # halves never split across shards.
            Kb = K // pack
            lo = (Kb * s // n_shards) * pack
            hi = (Kb * (s + 1) // n_shards) * pack
            if hi <= lo:
                continue
            gate = G if (G and hi - lo > pallas_fused1.CHUNK) else 0
            t_s, tri_s = pallas_fused1.fused1_closest_hit(
                od8, aabb8[:, lo:hi],
                scene.cluster_blocks[lo // pack:hi // pack],
                tile=tile, interpret=interpret, gate_g=gate,
                sup_aabb=shard_supers(lo, hi) if gate else None,
                pack=pack,
            )
            if out is None:
                out = (t_s, tri_s)
            else:
                # Blocks carry GLOBAL triangle ids (row 9), so the shard
                # merge is the same fold as the in-kernel accumulate.
                t_p, tri_p = out
                upd = (t_s < t_p) | ((t_s == t_p) & (tri_s > tri_p))
                out = (jnp.where(upd, t_s, t_p), jnp.where(upd, tri_s, tri_p))
        t_tile, tri_tile = out
        cutoff = jnp.full((T,), jnp.inf)
        return _finalize(
            scene, t_tile[:T], tri_tile[:T], cutoff, closest, hit_index,
            R, Rp, tile,
        )

    if backend in ("pallas", "pallas_interpret", "fused", "fused_interpret"):
        # Pallas path: cull kernel (phase A) + cumsum pair extraction
        # (phase B, no cap/ranking — the sweep folds any number of pairs per
        # tile into its VMEM accumulators, so results are EXACT while the
        # global pair budget holds; `overflow` counts budget drops) + the
        # pipelined sweep kernel (phases C+D).
        from cuda_raytracer_tpu.ops.pallas import cull as pallas_cull
        from cuda_raytracer_tpu.ops.pallas import sweep as pallas_sweep

        interpret = backend in ("pallas_interpret", "fused_interpret")

        def make_od8(window):
            """Kernel ray layout: (T + 1, 8, L) component-row tiles
            [ox oy oz dx dy dz tmax pad], built by stacking per-component
            reshapes — no transpose op. The per-ray search window rides
            row 6 so tightened-window re-culls need no extra operand; row T
            is a zero dummy tile for sentinel pairs (zero directions ⇒
            every MT test misses)."""
            comps = [
                origin[:, 0], origin[:, 1], origin[:, 2],
                direction[:, 0], direction[:, 1], direction[:, 2],
                window, jnp.zeros((Rp,), jnp.float32),
            ]
            od8 = jnp.stack([v.reshape(T, tile) for v in comps], axis=1)
            return jnp.pad(od8, ((0, 1), (0, 0), (0, max(0, 128 - tile))))

        od8 = make_od8(closest_p)
        KS = scene.cluster_min.shape[0]
        aabb = jnp.concatenate(
            [
                scene.cluster_min.T,
                scene.cluster_max.T,
                jnp.zeros((2, KS), jnp.float32),
            ],
            axis=0,
        )  # (8, K * S)
        P = T * cap

        # Hierarchical cull (config.cull_hier = G clusters per super): a
        # cheap pre-pass culls tight super-AABBs over G consecutive
        # clusters (BVH-cut DFS order keeps siblings adjacent) and gates
        # 128-column chunks of the main cull — most of the (T, K*S) slab
        # matrix is then never computed (teapot sim: 4-9x fewer cull ops,
        # scripts/scan_skip.py measures it on hardware). Gating is
        # conservative, so entries/masks stay bit-equal to the flat cull.
        GCH = pallas_cull.GATE_CHUNK
        G = getattr(scene.config, "cull_hier", 0)
        GS = G * S
        use_hier = G > 0 and KS >= 2 * GCH
        if use_hier and (GCH % GS or GS <= 0):
            raise ValueError(
                f"cull_hier*cull_split = {GS} must divide {GCH}"
            )
        if use_hier:
            Kp = -(-KS // GCH) * GCH
            pad_cols = jnp.full((3, Kp - KS), 1e17, jnp.float32)
            aabb_p = jnp.concatenate(
                [
                    jnp.concatenate([aabb[0:3], pad_cols], axis=1),
                    jnp.concatenate([aabb[3:6], pad_cols], axis=1),
                    jnp.zeros((2, Kp), jnp.float32),
                ],
                axis=0,
            )  # (8, Kp)
            # Tight super boxes: union of each group's real sub-boxes
            # (padding point boxes at 1e17 excluded; all-padding groups
            # get a far point box — an inverted box would ALWAYS hit the
            # windowed slab test, models/cluster.split_aabbs).
            smin, smax = aabb_p[0:3].T, aabb_p[3:6].T  # (Kp, 3)
            is_pad = smin[:, 0] >= 1e16
            gmin = jnp.where(is_pad[:, None], jnp.inf, smin)
            gmax = jnp.where(is_pad[:, None], -jnp.inf, smax)
            gmin = gmin.reshape(-1, GS, 3).min(axis=1)  # (Kp/GS, 3)
            gmax = gmax.reshape(-1, GS, 3).max(axis=1)
            empty = jnp.all(is_pad.reshape(-1, GS), axis=1)[:, None]
            gmin = jnp.where(empty, 1e17, gmin)
            gmax = jnp.where(empty, 1e17, gmax)
            n_sup = gmin.shape[0]
            super_aabb = jnp.concatenate(
                [gmin.T, gmax.T, jnp.zeros((2, n_sup), jnp.float32)], axis=0
            )
            n_chunks = Kp // GCH
            sup_per_chunk = GCH // GS

        def cull(od8_x, want_mask=False):
            """→ (T, K) block-level slab entry (min over the S chunk boxes
            that hit; MISS_ENTRY where none does). ``want_mask=True`` also
            returns the (T, W, K) per-ray hit bitmask (OR over chunk
            boxes) for the fused kernel's per-ray early-out."""
            if use_hier:
                e_sup = pallas_cull.cull_tiles(
                    od8_x, super_aabb, tile=tile, interpret=interpret
                )  # (T, n_sup)
                hit_sup = e_sup < jnp.float32(pallas_cull.MISS_ENTRY * 0.5)
                gate = jnp.any(
                    hit_sup.reshape(T, n_chunks, sup_per_chunk), axis=2
                )  # (T, n_chunks)
                Wg = -(-n_chunks // 32)
                bits = jnp.pad(
                    gate, ((0, 0), (0, Wg * 32 - n_chunks))
                ).astype(jnp.int32)
                gates = jnp.sum(
                    bits.reshape(T, Wg, 32)
                    << jnp.arange(32, dtype=jnp.int32),
                    axis=2,
                    dtype=jnp.int32,
                ).reshape(-1)  # flat (T * Wg,) — see cull_tiles_gated
                out = pallas_cull.cull_tiles_gated(
                    od8_x, aabb_p, gates, tile=tile, interpret=interpret,
                    with_mask=want_mask,
                )
                if want_mask:
                    e, mw = out[0][:, :KS], out[1][:, :, :KS]
                else:
                    e, mw = out[:, :KS], None
            else:
                out = pallas_cull.cull_tiles(
                    od8_x, aabb, tile=tile, interpret=interpret,
                    with_mask=want_mask,
                )
                e, mw = out if want_mask else (out, None)
            if S > 1:
                e = e.reshape(T, K, S).min(axis=2)
                if mw is not None:
                    mw4 = mw.reshape(T, mw.shape[1], K, S)
                    mw = functools.reduce(
                        jnp.bitwise_or, [mw4[..., s] for s in range(S)]
                    )
            return (e, mw) if want_mask else e

        want_mask = skip and backend in ("fused", "fused_interpret")
        if want_mask:
            entry, maskw = cull(od8, want_mask=True)
        else:
            entry, maskw = cull(od8), None
        # (T, K) slab entry, MISS_ENTRY where the tile can't hit
        hit_thresh = jnp.float32(pallas_cull.MISS_ENTRY * 0.5)
        mask = entry < hit_thresh

        if backend in ("fused", "fused_interpret"):
            # Fused walk+sweep kernel: pair extraction happens in-kernel on
            # the scalar core (ops/pallas/fused.py) — no cumsum/scatter glue,
            # no pair budget, EXACT by construction (overflow ≡ 0).
            from cuda_raytracer_tpu.ops.pallas import fused as pallas_fused

            # Cluster tables too big for VMEM residency are split into
            # resident shards, each swept independently and min-merged —
            # hits in different clusters combine exactly like phase-D's
            # reduction, and sentinel pairs are harmless in any shard (the
            # zero dummy ray tile makes every MT test miss). This keeps the
            # batched resident kernel on scenes like lamp (~28 MB of
            # blocks) instead of falling back to the slower DMA-wave path.
            # Shard to the call-shape-aware VMEM budget (the (T+1, tile)
            # outputs are lane-padded to 128, so small tiles leave less room
            # for the table — fused.resident_budget; RESIDENT_BYTES = 0
            # forces the DMA-wave path via the same check downstream).
            budget = (
                pallas_fused.resident_budget(T, tile, C)
                if pallas_fused.RESIDENT_BYTES > 0 else 0
            )
            n_shards = (
                max(1, -(-scene.cluster_blocks.size * 4 // budget))
                if budget > 0 else 1  # budget <= 0 = force the DMA-wave path
            )
            n_shards = min(n_shards, K)
            bounds = [
                (K * s // n_shards, K * (s + 1) // n_shards)
                for s in range(n_shards)
            ] if n_shards > 1 else [(0, K + 1)]  # single shard keeps the dummy row

            def fused_sweep(sel, ent=None, mw=None):
                """``ent``/``mw``: the (T, K) cull entry table and (T, W, K)
                per-ray hit bitmask backing ``sel`` — enable the in-kernel
                per-ray slab-entry early-out (skip flag)."""
                out = None
                for lo, hi in bounds:
                    meta, words = pallas_fused.pack_words(sel[:, lo:hi])
                    t_s, tri_s = pallas_fused.fused_closest_hit(
                        od8, scene.cluster_blocks[lo:hi], meta, words,
                        tile=tile, interpret=interpret,
                        entry=ent[:, lo:hi] if ent is not None else None,
                        hitmask=mw[:, :, lo:hi] if mw is not None else None,
                    )
                    if out is None:
                        out = (t_s, tri_s)
                    else:
                        t_p, tri_p = out
                        upd = (t_s < t_p) | ((t_s == t_p) & (tri_s > tri_p))
                        out = (
                            jnp.where(upd, t_s, t_p),
                            jnp.where(upd, tri_s, tri_p),
                        )
                return out

            ent = entry if skip else None
            if not two_round or K <= 1:
                t_tile, tri_tile = fused_sweep(mask, ent, maskw)
            else:
                # Front-to-back two-round sweep (exact; see the legacy path
                # below for the argument): round 1 sweeps only each tile's
                # nearest-entry cluster(s); round 2 re-culls with the
                # per-ray window tightened to round 1's hits — a cluster
                # whose [0, t_best] slab misses cannot contain a closer
                # hit. Extraction is in-kernel and cheap, so the second
                # pass costs one extra cull + kernel launch and typically
                # halves the swept pair count on incoherent bounces.
                entry_min = jnp.min(entry, axis=1, keepdims=True)
                sel1 = mask & (entry <= entry_min)
                t1, tri1 = fused_sweep(sel1, ent, maskw)

                window2 = jnp.minimum(
                    closest_p.reshape(T, tile), t1[:T]
                ).reshape(Rp)
                if want_mask:
                    entry2, maskw2 = cull(make_od8(window2), want_mask=True)
                else:
                    entry2, maskw2 = cull(make_od8(window2)), None
                sel2 = (entry2 < hit_thresh) & ~sel1
                t2, tri2 = fused_sweep(
                    sel2, entry2 if skip else None, maskw2
                )

                upd = (t2 < t1) | ((t2 == t1) & (tri2 > tri1))
                t_tile = jnp.where(upd, t2, t1)
                tri_tile = jnp.where(upd, tri2, tri1)

            cutoff = jnp.full((T,), jnp.inf)
            return _finalize(
                scene, t_tile[:T], tri_tile[:T], cutoff, closest, hit_index,
                R, Rp, tile,
            )

        # Legacy sweep-kernel path keeps the tile-major ray layout.
        rays_tiles = (
            jnp.concatenate([origin, direction], axis=1)
            .reshape(T, tile, 6)
            .transpose(0, 2, 1)
        )
        rays_tiles = jnp.pad(rays_tiles, ((0, 1), (0, 2), (0, max(0, 128 - tile))))

        def extract_and_sweep(sel_flat):
            """(T·K,) bool pair selection → swept (t, tri) tile maps +
            overflow count (pairs dropped past the global budget P)."""
            dest = jnp.cumsum(sel_flat) - 1
            total = jnp.sum(sel_flat)
            ovf = jnp.maximum(total - P, 0)
            dest = jnp.where(sel_flat & (dest < P), dest, P)
            dest = jax.lax.optimization_barrier(dest)
            # No sortedness/uniqueness hints: the dropped sentinels (dest=P)
            # interleave among the increasing kept destinations, so the
            # promise would be false — implementation-defined per XLA scatter
            # semantics (it happened to work on the current TPU toolchain).
            pair_flat = (
                jnp.full((P,), T * K, jnp.int32)
                .at[dest]
                .set(jnp.arange(T * K, dtype=jnp.int32), mode="drop")
            )
            pairs = jnp.stack([pair_flat // K, pair_flat % K])  # sentinel → (T, 0)
            t_tile, tri_tile = pallas_sweep.sweep_pairs(
                rays_tiles,
                scene.cluster_blocks,
                pairs,
                jnp.minimum(total, P),
                tile=tile,
                interpret=interpret,
            )
            return t_tile, tri_tile, ovf

        if not two_round or K <= ROUND1_NEAREST or ROUND1_NEAREST == 0:
            # Small scenes / coherent or sparse wavefronts: one exact sweep
            # of every culled pair (the two-round machinery costs two extra
            # kernel launches + a pair extraction, which only the large
            # incoherent early-bounce wavefronts repay).
            t_tile, tri_tile, overflow = extract_and_sweep(mask.reshape(T * K))
        else:
            # Two-round front-to-back sweep. Round 1 sweeps only each
            # tile's ROUND1_NEAREST nearest clusters by slab entry — for
            # coherent tiles these almost always contain the closest hit.
            # Round 2 re-culls with the per-ray tmax tightened to round 1's
            # hits: a cluster whose slab window [0, t_best] misses cannot
            # contain a closer hit (triangle hits lie within the box's
            # [entry, exit]), so skipping it is exact. On teapot bounce-1
            # rays this prunes the pair list ~2× vs a single full sweep.
            nth = jnp.sort(entry, axis=1)[:, ROUND1_NEAREST - 1 : ROUND1_NEAREST]
            sel1 = mask & (entry <= nth)
            t1, tri1, ovf1 = extract_and_sweep(sel1.reshape(T * K))

            window2 = jnp.minimum(closest_p.reshape(T, tile), t1[:T])
            entry2 = cull(make_od8(window2.reshape(Rp)))
            sel2 = (entry2 < hit_thresh) & ~sel1
            t2, tri2, ovf2 = extract_and_sweep(sel2.reshape(T * K))

            # Merge with the sweep kernel's tie rule (larger tri id wins).
            upd = (t2 < t1) | ((t2 == t1) & (tri2 > tri1))
            t_tile = jnp.where(upd, t2, t1)
            tri_tile = jnp.where(upd, tri2, tri1)
            overflow = ovf1 + ovf2

        cutoff = jnp.where(overflow > 0, -jnp.inf, jnp.inf)  # all-or-nothing
        cutoff = jnp.broadcast_to(cutoff, (T,))
        return _finalize(
            scene, t_tile[:T], tri_tile[:T], cutoff, closest, hit_index, R, Rp, tile
        )

    inv_dir = _safe_inv_dir(direction)

    # ---- Phase A: tile-level cull mask + entry distances (T, K) -----------
    def cull_chunk(o, i, c):
        """_cull_tile_mask reduced from sub-box to block granularity."""
        m, e = _cull_tile_mask(
            o, i, c, scene.cluster_min, scene.cluster_max, tile
        )
        if S > 1:
            m = m.reshape(-1, K, S).any(axis=2)
            e = e.reshape(-1, K, S).min(axis=2)
        return m, e

    rows = max(min(CULL_ROWS, Rp) // tile * tile, tile)
    if Rp <= rows:
        tile_mask, tile_entry = cull_chunk(origin, inv_dir, closest_p)
    else:
        rpad = (-Rp) % rows
        o = jnp.pad(origin, ((0, rpad), (0, 0)))
        i = jnp.pad(inv_dir, ((0, rpad), (0, 0)), constant_values=1.0)
        c = jnp.pad(closest_p, (0, rpad), constant_values=-1.0)
        chunks = (Rp + rpad) // rows
        tile_mask, tile_entry = jax.lax.map(
            lambda args: cull_chunk(*args),
            (
                o.reshape(chunks, rows, 3),
                i.reshape(chunks, rows, 3),
                c.reshape(chunks, rows),
            ),
        )
        tile_mask = tile_mask.reshape(-1, K)[:T]
        tile_entry = tile_entry.reshape(-1, K)[:T]

    # ---- Phase B: capped pair list, nearest-first ranked ------------------
    # Each tile keeps its `cap` *nearest* hit clusters (by tile-min slab
    # entry). If a tile drops clusters, `cutoff` (the entry of its nearest
    # dropped cluster) certifies the result per ray: a final hit at
    # t < cutoff cannot live in a dropped (farther) cluster. Rays failing
    # the certificate are counted in `overflow` — exact unless it's nonzero.
    P = T * cap
    counts = tile_mask.sum(axis=1)  # (T,) hits per tile
    # Rank clusters within each tile by entry distance (stable → ties by id).
    order = jnp.argsort(tile_entry, axis=1)
    rank = jnp.argsort(order, axis=1)  # (T, K) rank of cluster k in tile t
    entry_sorted = jnp.take_along_axis(tile_entry, order, axis=1)
    cap_col = min(cap, K - 1) if cap < K else K - 1
    cutoff = jnp.where(
        counts > cap,
        entry_sorted[:, cap_col] if cap < K else jnp.inf,
        jnp.inf,
    )  # (T,)

    keep = tile_mask & (rank < cap)
    flat = keep.reshape(T * K)
    dest = jnp.cumsum(flat) - 1  # compacted prefix position
    total = jnp.sum(flat)
    dest = jnp.where(flat, dest, P)
    # Keep the chunked cull (a loop-carried gather) out of the sorted
    # scatter's fusion: XLA's SortedScatterEmitter check-fails on fused
    # non-sublane gather inputs (TPU v5e, jellyfish fusion_emitter.cc:4796).
    dest = jax.lax.optimization_barrier(dest)
    # Sentinel entries (past `total`) decode to (tile=T, cluster=0): the
    # Pallas sweep folds their (guaranteed-miss: zero dummy ray tile) output
    # into a dummy row; the XLA sweep never reaches them (dynamic trip).
    # No sortedness/uniqueness hints (see extract_and_sweep above): dropped
    # sentinels interleave among the kept destinations.
    pair_flat = (
        jnp.full((P,), T * K, jnp.int32)
        .at[dest]
        .set(jnp.arange(T * K, dtype=jnp.int32), mode="drop")
    )
    pair_slot = (
        jnp.full((P,), T * cap, jnp.int32)
        .at[dest]
        .set(
            (jnp.repeat(jnp.arange(T, dtype=jnp.int32), K) * cap
             + jnp.minimum(rank.reshape(T * K), cap - 1).astype(jnp.int32)),
            mode="drop",
        )
    )
    pair_tile = pair_flat // K
    pair_cluster = pair_flat % K

    # ---- Phase C: dynamic-trip sweep over the compacted pair prefix -------
    o_tiles = origin.reshape(T, tile, 3)
    d_tiles = direction.reshape(T, tile, 3)

    G = sweep_chunk
    gpad = (-P) % G
    pt = jnp.pad(pair_tile, (0, gpad))
    pc = jnp.pad(pair_cluster, (0, gpad))
    ps = jnp.pad(pair_slot, (0, gpad), constant_values=T * cap)
    used_chunks = (jnp.minimum(total, P) + G - 1) // G

    def cond(carry):
        i, _, _ = carry
        return i < used_chunks

    def body(carry):
        i, t_cand, tri_cand = carry
        start = i * G
        pt_c = jax.lax.dynamic_slice(pt, (start,), (G,))
        pc_c = jax.lax.dynamic_slice(pc, (start,), (G,))
        ps_c = jax.lax.dynamic_slice(ps, (start,), (G,))
        po = o_tiles[pt_c]  # (G, tile, 3)
        pd = d_tiles[pt_c]
        blocks = scene.cluster_blocks[pc_c]  # (G, 16, C)
        best, slot = _mt_tile_blocks(po, pd, blocks)
        tri = scene.cluster_slot_tri[pc_c[:, None] * C + slot]  # (G, tile)
        # Lanes past `total` (last chunk) hold sentinel slot T·cap → dropped.
        lane_valid = start + jnp.arange(G, dtype=total.dtype) < total
        ps_write = jnp.where(lane_valid, ps_c, T * cap)
        # Barrier: keep the MT fusion's gathers out of the scatter fusions
        # (jellyfish scatter emitters reject fused non-sublane gathers).
        best, tri, ps_write = jax.lax.optimization_barrier((best, tri, ps_write))
        t_cand = t_cand.at[ps_write].set(best, mode="drop", unique_indices=True)
        tri_cand = tri_cand.at[ps_write].set(tri, mode="drop", unique_indices=True)
        return i + 1, t_cand, tri_cand

    # Under shard_map the loop carries must match the body's varying-axis
    # type (rays are sharded); seed the constant inits with a zero from a
    # varying operand so they inherit its manual axes (exact: +0).
    t_cand0 = (
        jnp.full((T * cap, tile), MISS, jnp.float32)
        + 0.0 * pair_tile[0].astype(jnp.float32)
    )
    tri_cand0 = jnp.full((T * cap, tile), -1, jnp.int32) + 0 * pair_tile[0]
    _, t_cand, tri_cand = jax.lax.while_loop(
        cond, body, (jnp.zeros((), total.dtype), t_cand0, tri_cand0)
    )

    # ---- Phase D: dense per-tile reduction over the cap axis --------------
    t_cand = t_cand.reshape(T, cap, tile)
    tri_cand = tri_cand.reshape(T, cap, tile)
    t_tile = jnp.min(t_cand, axis=1)  # (T, tile)
    matched = (t_cand < MISS) & (t_cand == t_tile[:, None, :])
    tri_tile = jnp.max(jnp.where(matched, tri_cand, -1), axis=1)
    return _finalize(scene, t_tile, tri_tile, cutoff, closest, hit_index, R, Rp, tile)


def _finalize(scene, t_tile, tri_tile, cutoff, closest, hit_index, R, Rp, tile):
    t_ray = t_tile.reshape(Rp)[:R]
    tri_ray = tri_tile.reshape(Rp)[:R]

    better = (t_ray < closest) & (tri_ray >= 0)
    new_closest = jnp.where(better, t_ray, closest)
    new_index = jnp.where(better, scene.sphere_count + tri_ray, hit_index)

    # Exactness certificate: a ray is suspect only if its final closest hit
    # (triangle OR incoming sphere/window bound) is at or beyond its tile's
    # nearest dropped cluster. `>=` because an equal-t hit in a dropped
    # cluster could win the deterministic tie-break.
    cutoff_ray = jnp.repeat(cutoff, tile)[:R]
    overflow = jnp.sum(new_closest >= cutoff_ray)
    return new_closest, new_index, overflow
