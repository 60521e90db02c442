"""Simulate fused-kernel perf levers on CPU: tile size x skip formulation.

For each packet tile size and slab-entry skip variant, counts MT tests/ray
and cull work (tile x cluster slab tests) on a primary and a Morton-sorted
bounce-1 wavefront. Skip variants, all group-of-MT_BATCH granular with the
frozen-best the kernel uses:

  none    — sweep every culled (tile, cluster) pair (packet_skip=False).
  shipped — skip a group iff NO live ray's bound reaches the group's min
            entry (the kernel's current scalar test: a single never-hit
            ray (bound=MISS) in the tile forces every sweep).
  masked  — skip a group iff no ray that slab-HITS one of its clusters has
            bound >= that cluster's tile entry (needs a per-(tile,cluster)
            ray bitmask in-kernel; upper-bounds the shipped test).

Usage:  python scripts/lever_sim.py [scene] [cluster_tris]
"""
import sys
sys.path.insert(0, "/root/repo")
from cuda_raytracer_tpu.utils.backend import force_cpu; force_cpu()
import jax
import jax.numpy as jnp
import numpy as np
from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.render import wavefront

SCENE = sys.argv[1] if len(sys.argv) > 1 else "teapot"
CT = int(sys.argv[2]) if len(sys.argv) > 2 else 256
REPACK = True  # repack experiment removed: tests/ray unchanged (PERF_NOTES)
import os
TILES = tuple(int(t) for t in os.environ.get("SIM_TILES", "64,32,16").split(","))
MODES = tuple(os.environ.get("SIM_MODES", "none,shipped,masked").split(","))
WIDTH = HEIGHT = 256
RPP = 2
MT_BATCH = int(os.environ.get("SIM_GROUP", "4"))
TILE_STRIDE = 8  # sample every Nth tile: statistics, not exact counts
HIT_EPS = 0.005
MISS = 1e30

scene = load_scene(
    f"/root/reference/{SCENE}.scene",
    config_overrides=dict(width=WIDTH, height=HEIGHT, rays_per_pixel=RPP,
                          bounces=10),
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
cmin = np.asarray(scene.cluster_min)[:K]
cmax = np.asarray(scene.cluster_max)[:K]


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


def simulate(state, label, tile, mode):
    o = np.asarray(state.origin, np.float64)
    d = np.asarray(state.direction, np.float64)
    alive = np.asarray(jnp.any(state.transmitted != 0.0, axis=-1))
    inv = 1.0 / np.where(d == 0, 1e-30, d)
    live = max(alive.sum(), 1)
    tests = 0
    pairs = 0
    cull_ops = 0
    n_tiles = 0
    for t0 in range(0, R, tile * TILE_STRIDE):
        sl = slice(t0, t0 + tile)
        ot, dt, it_, al = o[sl], d[sl], inv[sl], alive[sl]
        n_tiles += 1
        cull_ops += K
        if not al.any():
            continue
        t1 = (cmin[None] - ot[:, None]) * it_[:, None]
        t2 = (cmax[None] - ot[:, None]) * it_[:, None]
        near = np.maximum(np.minimum(t1, t2).max(axis=2), 0.0)  # (tile, K)
        far = np.maximum(t1, t2).min(axis=2)
        hit = (near <= far) & al[:, None]
        entry = np.where(hit, near, MISS).min(axis=0)  # (K,)
        ks = np.nonzero(hit.any(axis=0))[0]
        if len(ks) == 0:
            continue
        pairs += len(ks)
        best = np.full(tile, MISS)
        win = np.where(al, MISS, -1.0)
        i = 0
        while i < len(ks):
            grp = ks[i:i + MT_BATCH]
            i += MT_BATCH
            bound = np.minimum(best, win)
            if mode == "shipped":
                need = np.any(bound >= entry[grp].min())
            elif mode == "masked":
                need = any(
                    np.any(hit[:, k] & (bound >= entry[k])) for k in grp
                )
            else:
                need = True
            if not need:
                continue
            for k in grp:
                tests += C
                best = np.minimum(best, mt_closest(ot, dt, k))
    print(
        f"{SCENE} C={C} K={K} rp={int(REPACK)} tile={tile:3d} {mode:7s} {label}: "
        f"pairs/tile={pairs / max(n_tiles, 1):6.1f} "
        f"tests/ray={tests * TILE_STRIDE / live:7.0f} "
        f"cull/ray={cull_ops * TILE_STRIDE / live:6.0f}",
        flush=True,
    )


for tile in TILES:
    for mode in MODES:
        simulate(s0, "primary ", tile, mode)
        simulate(s1s, "b1_sorted", tile, mode)
