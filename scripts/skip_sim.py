import sys, time
sys.path.insert(0, "/root/repo")
from cuda_raytracer_tpu.utils.backend import force_cpu; force_cpu()
import jax
import jax.numpy as jnp
import numpy as np
from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.render import wavefront

SCENE = sys.argv[1] if len(sys.argv) > 1 else "teapot"
CT = int(sys.argv[2]) if len(sys.argv) > 2 else 512
WIDTH = HEIGHT = 256
RPP = 2
TILE = 64
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
cmin = np.asarray(scene.cluster_min); cmax = np.asarray(scene.cluster_max)
blocks = np.asarray(scene.cluster_blocks)
P1 = blocks[:K, 0:3].transpose(0, 2, 1); E1 = blocks[:K, 3:6].transpose(0, 2, 1); E2 = blocks[:K, 6:9].transpose(0, 2, 1)
HIT_EPS = 0.005; MISS = 1e30

def mt_closest(o, d, k):
    p1, e1, e2 = P1[k], E1[k], E2[k]
    h = np.cross(d[:, None, :], e2[None])
    det = np.einsum("nci,ci->nc", h, e1)
    f = o[:, None, :] - p1[None]
    u = np.einsum("nci,nci->nc", f, h)
    q = np.cross(f, e1[None])
    v = np.einsum("nci,ni->nc", q, d)
    t = np.einsum("nci,ci->nc", q, e2)
    s = np.sign(det); ad = np.abs(det)
    ok = (det != 0) & (u*s >= 0) & (u*s <= ad) & (v*s >= 0) & ((u+v)*s <= ad) & (t*s >= HIT_EPS*ad)
    tt = np.where(ok, t / np.where(det == 0, 1.0, det), MISS)
    return tt.min(axis=1)

def simulate_group(state, label):
    o = np.asarray(state.origin, np.float64); d = np.asarray(state.direction, np.float64)
    alive = np.asarray(jnp.any(state.transmitted != 0.0, axis=-1))
    stats = dict(base=0, skipE=0, pairs=0, swept=0)
    inv = 1.0 / np.where(d == 0, 1e-30, d)
    live = max(alive.sum(), 1)
    for t0 in range(0, R, TILE):
        sl = slice(t0, t0 + TILE)
        ot, dt, it_, al = o[sl], d[sl], inv[sl], alive[sl]
        if not al.any(): continue
        t1 = (cmin[None] - ot[:, None]) * it_[:, None]
        t2 = (cmax[None] - ot[:, None]) * it_[:, None]
        near = np.maximum(np.minimum(t1, t2).max(axis=2), 0.0)
        far = np.maximum(t1, t2).min(axis=2)
        hitm = (near <= far) & al[:, None]
        ks = np.nonzero(hitm.any(axis=0))[0]
        if len(ks) == 0: continue
        stats["base"] += len(ks) * C
        stats["pairs"] += len(ks)
        best = np.full(TILE, MISS)
        i = 0
        while i < len(ks):
            grp = ks[i:i+4]; i += 4
            frozen = best.copy()
            for k in grp:
                h = hitm[:, k]
                if np.all(~h | (frozen <= near[:, k])): continue
                stats["skipE"] += C; stats["swept"] += 1
                best = np.minimum(best, mt_closest(ot, dt, k))
    print(f"{SCENE} C={C} K={K} {label}: pairs/tile={stats['pairs']/(R//TILE):5.1f} "
          f"base_tests={stats['base']/live*TILE:7.0f}/ray skip_ratio={stats['base']/max(stats['skipE'],1):.2f}x "
          f"swept_tests={stats['skipE']/live*TILE:7.0f}/ray", flush=True)

simulate_group(s0, "primary")
simulate_group(s1s, "b1_sorted")
