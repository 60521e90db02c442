"""Predict the two-level cull's (cull_split) pair/test reduction on CPU.

Counts, for a primary and a sorted bounce-1 wavefront, the (tile, cluster)
pairs that survive the slab cull when each cluster block is culled against
S tight sub-AABBs (models/cluster.split_aabbs) instead of its single BVH
node box, and how the tighter min-entry distances feed the group-frozen
slab-entry early-out (packet_skip). Pure NumPy; no TPU needed — the sim
mirrors the fused kernel's flush loop (MT_BATCH=4 group granularity,
frozen best per group) the way scripts/skip_sim.py validated the skip.

Usage:  python scripts/split_sim.py [scene] [cluster_tris]
"""
import sys, time
sys.path.insert(0, "/root/repo")
from cuda_raytracer_tpu.utils.backend import force_cpu; force_cpu()
import jax
import jax.numpy as jnp
import numpy as np
from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.models import cluster as cluster_mod
from cuda_raytracer_tpu.render import wavefront

SCENE = sys.argv[1] if len(sys.argv) > 1 else "teapot"
CT = int(sys.argv[2]) if len(sys.argv) > 2 else 256
WIDTH = HEIGHT = 256
RPP = 2
TILE = 64
MT_BATCH = 4
TILE_STRIDE = 8  # sample every Nth tile: statistics, not exact counts
HIT_EPS = 0.005
MISS = 1e30

scene = load_scene(
    f"/root/reference/{SCENE}.scene",
    config_overrides=dict(width=WIDTH, height=HEIGHT, rays_per_pixel=RPP, bounces=10),
    cluster_tris=CT,
)
R = scene.num_pixels * RPP
K = scene.num_clusters
C = scene.cluster_tris
ray_id = jnp.arange(R, dtype=jnp.int32)
s0 = wavefront.make_initial_state(scene, ray_id, RPP, jnp.uint32(0))
s1, _ = wavefront.process_rays(scene, s0, jnp.uint32(0), 0)
s1s = wavefront.reorder_rays(scene, s1)

blocks = np.asarray(scene.cluster_blocks)
P1 = blocks[:K, 0:3].transpose(0, 2, 1)
E1 = blocks[:K, 3:6].transpose(0, 2, 1)
E2 = blocks[:K, 6:9].transpose(0, 2, 1)


def mt_closest(o, d, k):
    p1, e1, e2 = P1[k], E1[k], E2[k]
    h = np.cross(d[:, None, :], e2[None])
    det = np.einsum("nci,ci->nc", h, e1)
    f = o[:, None, :] - p1[None]
    u = np.einsum("nci,nci->nc", f, h)
    q = np.cross(f, e1[None])
    v = np.einsum("nci,ni->nc", q, d)
    t = np.einsum("nci,ci->nc", q, e2)
    s = np.sign(det)
    ad = np.abs(det)
    ok = (det != 0) & (u * s >= 0) & (u * s <= ad) & (v * s >= 0) \
        & ((u + v) * s <= ad) & (t * s >= HIT_EPS * ad)
    tt = np.where(ok, t / np.where(det == 0, 1.0, det), MISS)
    return tt.min(axis=1)


def simulate(state, label, cmin, cmax, split):
    """cmin/cmax: (K*split, 3). Counts block pairs culled in (OR over the
    S chunk boxes) and MT tests after the group-frozen skip with entry =
    min over hitting chunk boxes."""
    o = np.asarray(state.origin, np.float64)
    d = np.asarray(state.direction, np.float64)
    alive = np.asarray(jnp.any(state.transmitted != 0.0, axis=-1))
    inv = 1.0 / np.where(d == 0, 1e-30, d)
    live = max(alive.sum(), 1)
    stats = dict(pairs=0, swept_pairs=0, tests=0)
    for t0 in range(0, R, TILE * TILE_STRIDE):
        sl = slice(t0, t0 + TILE)
        ot, dt, it_, al = o[sl], d[sl], inv[sl], alive[sl]
        if not al.any():
            continue
        t1 = (cmin[None] - ot[:, None]) * it_[:, None]
        t2 = (cmax[None] - ot[:, None]) * it_[:, None]
        near = np.maximum(np.minimum(t1, t2).max(axis=2), 0.0)  # (TILE, K*S)
        far = np.maximum(t1, t2).min(axis=2)
        hit = (near <= far) & al[:, None]  # per sub-box
        hit_b = hit.reshape(TILE, K, split).any(axis=2)
        near_b = np.where(hit, near, MISS).reshape(TILE, K, split).min(axis=2)
        entry_b = np.where(hit_b, near_b, MISS).min(axis=0)  # (K,) tile entry
        ks = np.nonzero(hit_b.any(axis=0))[0]
        if len(ks) == 0:
            continue
        stats["pairs"] += len(ks)
        best = np.full(TILE, MISS)
        win = np.where(al, MISS, -1.0)
        i = 0
        while i < len(ks):
            grp = ks[i:i + MT_BATCH]
            i += MT_BATCH
            e = entry_b[grp].min()
            bound = np.minimum(best, win)
            if not np.any(bound >= e):
                continue
            for k in grp:
                stats["swept_pairs"] += 1
                stats["tests"] += C
                best = np.minimum(best, mt_closest(ot, dt, k))
    print(
        f"{SCENE} C={C} K={K} S={split} {label}: "
        f"pairs/tile={stats['pairs'] / (R // TILE // TILE_STRIDE):6.1f} "
        f"swept_pairs/tile={stats['swept_pairs'] / (R // TILE // TILE_STRIDE):6.1f} "
        f"tests/ray={stats['tests'] / live * TILE * TILE_STRIDE:7.0f}",
        flush=True,
    )
    return stats


def main():
    # Rebuild cluster start/count from the slot→tri map (padding slots -1).
    slot_tri = np.asarray(scene.cluster_slot_tri).reshape(K, C)
    counts = (slot_tri >= 0).sum(axis=1)
    # split_aabbs wants contiguous per-cluster slices of the triangle
    # arrays; the packer used BVH-permuted arrays, and slot_tri maps slots
    # back to original ids. Reconstruct per-cluster triangle vertex sets
    # directly from slot_tri instead.
    p1 = np.asarray(scene.tri_p1, np.float32)
    e1 = np.asarray(scene.tri_e1, np.float32)
    e2 = np.asarray(scene.tri_e2, np.float32)
    v2 = p1 + e1
    v3 = p1 + e2

    def boxes(split):
        # Empty chunks: far-away POINT box (always-miss under the slab;
        # an inverted box always HITS the windowed slab form — see
        # models/cluster.split_aabbs).
        mins = np.full((K * split, 3), 1e17, np.float32)
        maxs = np.full((K * split, 3), 1e17, np.float32)
        chunk = C // split
        for k in range(K):
            tri = slot_tri[k]
            for s in range(split):
                ids = tri[s * chunk:(s + 1) * chunk]
                ids = ids[ids >= 0]
                if len(ids) == 0:
                    continue
                pts = np.concatenate([p1[ids], v2[ids], v3[ids]])
                mins[k * split + s] = pts.min(axis=0)
                maxs[k * split + s] = pts.max(axis=0)
        return mins, maxs

    node_min = np.asarray(scene.cluster_min)[:K]
    node_max = np.asarray(scene.cluster_max)[:K]
    for split in (1, 2, 4, 8):
        if C % split:
            continue
        if split == 1:
            cmin, cmax = node_min, node_max
        else:
            cmin, cmax = boxes(split)
        simulate(s0, "primary ", cmin, cmax, split)
        simulate(s1s, "b1_sorted", cmin, cmax, split)


main()
