"""Clustered closest-hit: dense cull + grouped block intersection.

The TPU-native replacement for per-ray BVH traversal (see models/cluster.py
for the structure). Three phases, all static-shaped:

  A. cull   — slab-test rays against all K cluster AABBs, dense and
              gather-free; select up to H hit clusters per ray (top-k by
              cluster id; H overflow is counted and surfaced).
  B. group  — flatten (ray, cluster) pairs, sort by cluster, and pad each
              cluster's run to a multiple of the pair-tile so every tile is
              cluster-uniform. One contiguous triangle block per tile.
  C. sweep  — Möller–Trumbore of each tile's rays against its cluster's
              (16, C) block; masked min + index; scatter-min back per ray.

Work per ray is H·C triangle tests (teapot ≈ 4k vs 126k brute) with zero
per-ray gathers in the inner loop — the block fetch amortises over the whole
tile, which is what the Pallas kernel turns into pipelined scalar-prefetch
DMA (ops/pallas/cluster_mt.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cuda_raytracer_tpu.models.scene import Scene
from cuda_raytracer_tpu.ops.intersect import HIT_EPS, MISS
from cuda_raytracer_tpu.ops.traverse import _safe_inv_dir

# Default per-ray hit-cluster budget: shipped scenes max out at ~21 primary-
# ray cluster hits (lamp); 32 leaves margin. Phase C's dynamic trip count
# means an unused budget costs sort width, not intersection work.
DEFAULT_H = 32
DEFAULT_PAIR_TILE = 128
CULL_CHUNK = 1 << 13


def _cull_chunk(
    origin: jnp.ndarray,  # (r, 3)
    inv_dir: jnp.ndarray,  # (r, 3)
    tmax: jnp.ndarray,  # (r,)
    cmin: jnp.ndarray,  # (K, 3)
    cmax: jnp.ndarray,  # (K, 3)
    h_budget: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense slab test of a ray chunk vs all clusters → (cluster_list (r, H)
    with sentinel K, hit_count (r,))."""
    K = cmin.shape[0]
    tmin_run = jnp.zeros(origin.shape[:1] + (K,), jnp.float32)
    tmax_run = jnp.broadcast_to(tmax[:, None], tmin_run.shape)
    for axis in range(3):
        t1 = (cmin[None, :, axis] - origin[:, None, axis]) * inv_dir[:, None, axis]
        t2 = (cmax[None, :, axis] - origin[:, None, axis]) * inv_dir[:, None, axis]
        tmin_run = jnp.minimum(
            jnp.maximum(t1, tmin_run), jnp.maximum(t2, tmin_run)
        )
        tmax_run = jnp.maximum(
            jnp.minimum(t1, tmax_run), jnp.minimum(t2, tmax_run)
        )
    mask = tmin_run <= tmax_run
    hit_count = mask.sum(axis=1).astype(jnp.int32)
    # Keep the H *nearest* hit clusters (by slab entry distance): if the list
    # truncates, only the farthest boxes are dropped, and the caller can
    # certify the result — a final hit at t <= cutoff (the farthest kept
    # entry) cannot live in a dropped (farther) cluster.
    scores = jnp.where(mask, -tmin_run, -jnp.inf)
    top, idx = jax.lax.top_k(scores, min(h_budget, K))
    cluster_list = jnp.where(top > -jnp.inf, idx, K).astype(jnp.int32)
    truncated = hit_count > cluster_list.shape[1]
    cutoff = jnp.where(truncated, -top[:, -1], jnp.inf)
    if h_budget > K:
        pad = jnp.full(cluster_list.shape[:1] + (h_budget - K,), K, jnp.int32)
        cluster_list = jnp.concatenate([cluster_list, pad], axis=1)
    return cluster_list, hit_count, cutoff


@partial(
    jax.jit,
    static_argnames=("h_budget", "pair_tile", "chunk_tiles", "pair_budget_factor"),
)
def closest_hit_clustered(
    scene: Scene,
    origin: jnp.ndarray,  # (R, 3)
    direction: jnp.ndarray,  # (R, 3)
    closest: jnp.ndarray,  # (R,) incoming best (e.g. spheres); 0 for dead rays
    hit_index: jnp.ndarray,  # (R,) int32
    h_budget: int = DEFAULT_H,
    pair_tile: int = DEFAULT_PAIR_TILE,
    chunk_tiles: int = 64,
    pair_budget_factor: int = 6,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Update (closest, hit_index) with the nearest triangle hit.

    Returns (closest, hit_index, overflow) — overflow counts rays whose
    hit-cluster list was truncated at H plus pairs dropped past the
    ``pair_budget_factor * R`` pair budget (either may cause a missed hit;
    callers monitor it and raise the budgets if non-zero)."""
    R = origin.shape[0]
    K = scene.num_clusters
    C = scene.cluster_tris
    H = min(h_budget, K) if K < h_budget else h_budget
    inv_dir = _safe_inv_dir(direction)

    # ---- Phase A: cull (chunked so the (r, K) slab matrix stays small) ----
    if R <= CULL_CHUNK:
        cluster_list, hit_count, cutoff = _cull_chunk(
            origin, inv_dir, closest, scene.cluster_min, scene.cluster_max, H
        )
    else:
        pad = (-R) % CULL_CHUNK
        o = jnp.pad(origin, ((0, pad), (0, 0)))
        i = jnp.pad(inv_dir, ((0, pad), (0, 0)), constant_values=1.0)
        c = jnp.pad(closest, (0, pad), constant_values=-1.0)  # pads: no hits
        chunks = (R + pad) // CULL_CHUNK
        cluster_list, hit_count, cutoff = jax.lax.map(
            lambda args: _cull_chunk(
                *args, scene.cluster_min, scene.cluster_max, H
            ),
            (
                o.reshape(chunks, CULL_CHUNK, 3),
                i.reshape(chunks, CULL_CHUNK, 3),
                c.reshape(chunks, CULL_CHUNK),
            ),
        )
        cluster_list = cluster_list.reshape(-1, cluster_list.shape[-1])[:R]
        hit_count = hit_count.reshape(-1)[:R]
        cutoff = cutoff.reshape(-1)[:R]
    H_eff = cluster_list.shape[1]

    # ---- Phase B: group pairs by cluster into tile-aligned runs -----------
    # One multi-operand sort both compacts and groups: sentinel (no-hit)
    # slots carry cluster id K, so after sorting by cluster all real pairs
    # form a prefix, grouped by cluster. The prefix is a *static* slice of
    # size pair_budget_factor * R (actual pairs average 2-4 per ray); pairs
    # beyond it are counted as overflow.
    P = min(pair_budget_factor * R, R * H_eff)
    pair_cluster_raw = cluster_list.reshape(R * H_eff)
    pair_ray_raw = jax.lax.broadcasted_iota(jnp.int32, (R, H_eff), 0).reshape(
        R * H_eff
    )
    pc_sorted, pr_sorted = jax.lax.sort(
        (pair_cluster_raw, pair_ray_raw), num_keys=1
    )
    pc = pc_sorted[:P]
    pr = pr_sorted[:P]
    total_valid = jnp.sum(jnp.minimum(hit_count, H_eff))
    budget_drops = jnp.maximum(total_valid - P, 0)
    counts = jnp.bincount(pc, length=K + 1)[:K]
    padded_counts = ((counts + pair_tile - 1) // pair_tile) * pair_tile
    padded_start = jnp.concatenate(
        [jnp.zeros(1, counts.dtype), jnp.cumsum(padded_counts)]
    )[:K]
    run_start = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)])[:K]

    P_pad = P + K * pair_tile  # static upper bound
    pc_safe = jnp.minimum(pc, K - 1)
    dest = padded_start[pc_safe] + (
        jnp.arange(P, dtype=counts.dtype) - run_start[pc_safe]
    )
    dest = jnp.where(pc < K, dest, P_pad)  # sentinel pairs dropped
    # dest is strictly increasing over valid pairs (sorted clusters, ranked
    # within runs) — tell XLA so the scatter vectorises.
    slot_ray = (
        jnp.full((P_pad,), R, jnp.int32)
        .at[dest]
        .set(pr, mode="drop", unique_indices=True, indices_are_sorted=True)
    )

    n_tiles = P_pad // pair_tile
    tile_cluster = jnp.clip(
        jnp.searchsorted(
            padded_start,
            jnp.arange(n_tiles, dtype=padded_start.dtype) * pair_tile,
            side="right",
        )
        - 1,
        0,
        K - 1,
    ).astype(jnp.int32)

    # ---- Phase C: dense Möller–Trumbore per cluster-uniform tile ----------
    # Only the tiles that actually hold pairs are processed: a while_loop
    # with a *dynamic* trip count walks the used prefix of the grouped pair
    # array, so per-ray work scales with the real hit count (mean ~2-4
    # clusters), not with the worst-case H budget.
    ray_safe = jnp.minimum(slot_ray, R - 1)
    rays_packed = jnp.concatenate([origin, direction], axis=1)  # (R, 6)
    pair_rays = rays_packed[ray_safe]  # one gather instead of two
    po = pair_rays[:, 0:3]
    pd = pair_rays[:, 3:6]

    def tile_group(po_g, pd_g, cluster_g):
        # (g, tile, 3) x2, (g,)
        blocks = scene.cluster_blocks[cluster_g]  # (g, 16, C)
        p1x, p1y, p1z = (blocks[:, i, None, :] for i in range(0, 3))
        e1x, e1y, e1z = (blocks[:, i, None, :] for i in range(3, 6))
        e2x, e2y, e2z = (blocks[:, i, None, :] for i in range(6, 9))
        dx = pd_g[..., 0:1]
        dy = pd_g[..., 1:2]
        dz = pd_g[..., 2:3]
        ox = po_g[..., 0:1]
        oy = po_g[..., 1:2]
        oz = po_g[..., 2:3]
        # h = d × e2
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        det = hx * e1x + hy * e1y + hz * e1z
        inv_det = jnp.where(det == 0, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))
        fx = ox - p1x
        fy = oy - p1y
        fz = oz - p1z
        u = (fx * hx + fy * hy + fz * hz) * inv_det
        # q = f × e1
        qx = fy * e1z - fz * e1y
        qy = fz * e1x - fx * e1z
        qz = fx * e1y - fy * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = (
            (det != 0) & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
            & (t >= HIT_EPS)
        )
        t = jnp.where(ok, t, MISS)  # (g, tile, C)
        slot = jnp.argmin(t, axis=-1).astype(jnp.int32)
        best = jnp.take_along_axis(t, slot[..., None], axis=-1)[..., 0]
        return best, slot

    group = max(1, chunk_tiles)
    groups_cap = -(-n_tiles // group)
    span = group * pair_tile
    # Pad the pair arrays so every group slice is full-size.
    cap = groups_cap * span
    po = jnp.pad(po, ((0, cap - P_pad), (0, 0)))
    pd = jnp.pad(pd, ((0, cap - P_pad), (0, 0)), constant_values=1.0)
    tile_cluster_p = jnp.pad(
        tile_cluster, (0, groups_cap * group - n_tiles)
    )
    total_padded = jnp.sum(padded_counts)
    used_groups = (total_padded + span - 1) // span

    def cond(carry):
        i, _, _ = carry
        return i < used_groups

    def body(carry):
        i, best_t, best_slot = carry
        start = i * span
        po_g = jax.lax.dynamic_slice(po, (start, 0), (span, 3))
        pd_g = jax.lax.dynamic_slice(pd, (start, 0), (span, 3))
        cl_g = jax.lax.dynamic_slice(tile_cluster_p, (i * group,), (group,))
        t_g, s_g = tile_group(
            po_g.reshape(group, pair_tile, 3),
            pd_g.reshape(group, pair_tile, 3),
            cl_g,
        )
        best_t = jax.lax.dynamic_update_slice(best_t, t_g.reshape(span), (start,))
        best_slot = jax.lax.dynamic_update_slice(
            best_slot, s_g.reshape(span), (start,)
        )
        return i + 1, best_t, best_slot

    best_t0 = jnp.full((cap,), MISS, jnp.float32)
    best_slot0 = jnp.zeros((cap,), jnp.int32)
    _, best_t, best_slot = jax.lax.while_loop(
        cond, body, (jnp.zeros((), total_padded.dtype), best_t0, best_slot0)
    )
    best_t = best_t[:P_pad]
    best_slot = best_slot[:P_pad]

    # ---- Phase D: resolve per-ray minimum -----------------------------------
    global_slot = tile_cluster.repeat(pair_tile) * C + best_slot
    t_ray = jnp.full((R,), jnp.inf, jnp.float32).at[slot_ray].min(
        best_t, mode="drop"
    )
    matched = (best_t == t_ray[ray_safe]) & (best_t < MISS) & (slot_ray < R)
    tri_candidate = jnp.where(matched, scene.cluster_slot_tri[global_slot], -1)
    tri_ray = jnp.full((R,), -1, jnp.int32).at[slot_ray].max(
        tri_candidate, mode="drop"
    )

    better = (t_ray < closest) & (tri_ray >= 0)
    new_closest = jnp.where(better, t_ray, closest)
    new_index = jnp.where(better, scene.sphere_count + tri_ray, hit_index)
    # Certificate: a ray is suspect only if its final hit is farther than the
    # entry of its nearest *dropped* cluster (cutoff); otherwise H-truncation
    # provably did not change the answer.
    suspects = jnp.sum(cutoff < new_closest)
    overflow = budget_drops + suspects
    return new_closest, new_index, overflow
