"""Simulate alternative wavefront sort keys against the tile-union cost model.

The packet intersector's cost is the per-tile UNION of slab-hit clusters
(PERF_NOTES: the structural residual of lockstep SIMD). The shipped sort key
is Morton(origin) << 16 | Morton(direction) (scene.cu:484 semantics) — a
*proxy* for "rays that hit the same clusters end up in the same tile". This
script measures, on the real bounce-1 wavefront, how much tighter the union
gets when rays are sorted by cull-derived keys instead:

  morton     — the shipped key (baseline)
  firsthit   — smallest slab-hit cluster index (one extra R*K slab pass)
  argmin     — cluster index with the smallest slab entry-t
  hitpos     — Morton of the *estimated hit point* (origin + entry_min * dir)
  signature  — lexicographic sort of the full K-bit hit mask (upper bound:
               groups identical cull rows perfectly, too wide to productionise)

Counts use the kernel's real economy: group-of-4-frozen best, per-ray slab
masked skip (the packet_skip formulation), C-wide sweeps.

Usage: python scripts/cullsort_sim.py [scene] [cluster_tris] [tile]
"""
import sys
sys.path.insert(0, "/root/repo")
from cuda_raytracer_tpu.utils.backend import force_cpu; force_cpu()
import jax.numpy as jnp
import numpy as np
from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.render import wavefront

SCENE = sys.argv[1] if len(sys.argv) > 1 else "teapot"
CT = int(sys.argv[2]) if len(sys.argv) > 2 else 256
TILE = int(sys.argv[3]) if len(sys.argv) > 3 else 64
WIDTH = HEIGHT = 256
RPP = 2
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
cmin = np.asarray(scene.cluster_min, np.float64)
cmax = np.asarray(scene.cluster_max, np.float64)
blocks = np.asarray(scene.cluster_blocks)
P1 = blocks[:K, 0:3].transpose(0, 2, 1)
E1 = blocks[:K, 3:6].transpose(0, 2, 1)
E2 = blocks[:K, 6:9].transpose(0, 2, 1)
HIT_EPS = 0.005
MISS = 1e30


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


def slab_entries(o, d):
    """Per-ray (R, K) slab entry-t (near, clamped at 0) and hit mask."""
    inv = 1.0 / np.where(d == 0, 1e-30, d)
    near = np.empty((o.shape[0], K), np.float64)
    far = np.empty((o.shape[0], K), np.float64)
    for c0 in range(0, o.shape[0], 8192):
        sl = slice(c0, c0 + 8192)
        t1 = (cmin[None] - o[sl, None]) * inv[sl, None]
        t2 = (cmax[None] - o[sl, None]) * inv[sl, None]
        near[sl] = np.maximum(np.minimum(t1, t2).max(axis=2), 0.0)
        far[sl] = np.maximum(t1, t2).min(axis=2)
    return near, near <= far


def tile_cost(o, d, alive, near, hitm, label):
    """Kernel-economy cost of the wavefront in its CURRENT physical order:
    per-tile union sweeps with group-of-4-frozen best + per-ray slab masked
    skip (packet_skip), real Möller–Trumbore best tracking — the exact
    economy skip_sim.py validated against the kernel."""
    live = max(alive.sum(), 1)
    base = swept = pairs = 0
    for t0 in range(0, R, TILE):
        sl = slice(t0, t0 + TILE)
        al = alive[sl]
        if not al.any():
            continue
        hm = hitm[sl] & al[:, None]
        ks = np.nonzero(hm.any(axis=0))[0]
        base += len(ks) * C
        pairs += len(ks)
        best = np.full(TILE, MISS)
        i = 0
        while i < len(ks):
            grp = ks[i:i + 4]
            i += 4
            frozen = best.copy()
            for k in grp:
                h = hm[:, k]
                if np.all(~h | (frozen <= near[sl, k])):
                    continue
                swept += 1
                best = np.minimum(best, mt_closest(o[sl], d[sl], k))
    print(
        f"{SCENE} C={C} K={K} tile={TILE} {label:10s}: "
        f"pairs/tile={pairs / (R // TILE):6.1f} "
        f"base={base / live * TILE:8.0f}/ray "
        f"swept={swept * C / live * TILE:8.0f}/ray",
        flush=True,
    )
    return swept * C / live * TILE


def run(order, label, o, d, alive, near, hitm):
    p = order
    tile_cost(o[p], d[p], alive[p], near[p], hitm[p], label)


o1 = np.asarray(s1s.origin, np.float64)
d1 = np.asarray(s1s.direction, np.float64)
alive1 = np.asarray(jnp.any(s1s.transmitted != 0.0, axis=-1))
near1, hitm1 = slab_entries(o1, d1)

# Baseline: the shipped Morton order (state already sorted by it).
tile_cost(o1, d1, alive1, near1, hitm1, "morton")

hit_any = hitm1.any(axis=1)
BIG = np.int64(K + 1)

# firsthit: smallest hit cluster index; no-hit/dead rays last.
fh = np.where(hit_any, np.argmax(hitm1, axis=1), BIG)
fh = np.where(alive1, fh, BIG + 1)
run(np.argsort(fh, kind="stable"), "firsthit", o1, d1, alive1, near1, hitm1)

# argmin: cluster with the smallest entry-t among hits.
nm = np.where(hitm1, near1, MISS)
am = np.where(hit_any, np.argmin(nm, axis=1), BIG)
am = np.where(alive1, am, BIG + 1)
run(np.argsort(am, kind="stable"), "argmin", o1, d1, alive1, near1, hitm1)

# hitpos: Morton of origin + entry_min * direction (estimated hit point),
# production-cheap (needs only the per-ray min entry, not the argmin).
tmin = np.where(hit_any, nm.min(axis=1), 0.0)
hp = o1 + tmin[:, None] * d1
mn = np.asarray(scene.min_coord, np.float64)
inv_ext = np.asarray(scene.inv_extent, np.float64)
hpu = np.clip((hp - mn) * inv_ext, 0.0, 1.0)
q = (hpu * 31.99).astype(np.uint64)


def interleave(x):
    x = x.astype(np.uint64)
    x = (x | (x << 8)) & np.uint64(0x100F)
    x = (x | (x << 4)) & np.uint64(0x10C3)
    x = (x | (x << 2)) & np.uint64(0x1249)
    return x


mk = (interleave(q[:, 0]) << 2) | (interleave(q[:, 1]) << 1) | interleave(q[:, 2])
mk = np.where(alive1 & hit_any, mk, np.uint64(1 << 40))
run(np.argsort(mk, kind="stable"), "hitpos", o1, d1, alive1, near1, hitm1)

# hitpos+dir: estimated hit point high, direction Morton low.
du = 0.5 * (d1 + 1.0)
qd = (np.clip(du, 0, 1) * 31.99).astype(np.uint64)
dk = (interleave(qd[:, 0]) << 2) | (interleave(qd[:, 1]) << 1) | interleave(qd[:, 2])
mk2 = (mk << np.uint64(15)) | dk
mk2 = np.where(alive1 & hit_any, mk2, np.uint64(1) << np.uint64(60))
run(np.argsort(mk2, kind="stable"), "hitpos+dir", o1, d1, alive1, near1, hitm1)

# first2: (first hit cluster, second hit cluster) — two argmax passes.
h2 = hitm1.copy()
h2[np.arange(R), np.where(hit_any, np.argmax(hitm1, axis=1), 0)] = False
sh = np.where(h2.any(axis=1), np.argmax(h2, axis=1), BIG)
k2 = np.where(alive1 & hit_any, fh * (K + 2) + sh, (BIG + 1) * (K + 2))
run(np.argsort(k2, kind="stable"), "first2", o1, d1, alive1, near1, hitm1)

# firsthit+hitpos: group by entry cluster, Morton hit point within.
k3 = np.where(alive1 & hit_any,
              (fh.astype(np.uint64) << np.uint64(16)) | mk.astype(np.uint64),
              np.uint64(1) << np.uint64(40))
run(np.argsort(k3, kind="stable"), "fh+hitpos", o1, d1, alive1, near1, hitm1)

# hash: 64-bit mix of the full mask — groups IDENTICAL signatures only
# (no locality between near-identical rows); productionisable as a packed
# xor/mul reduction over the cull's mask words.
words64 = np.packbits(hitm1, axis=1).astype(np.uint64)
hsh = np.zeros(R, np.uint64)
for i in range(words64.shape[1]):
    hsh = (hsh * np.uint64(0x9E3779B97F4A7C15) + words64[:, i] * np.uint64(i * 2 + 1)) & np.uint64(0xFFFFFFFFFFFFFFFF)
hsh = np.where(alive1 & hit_any, hsh, np.uint64(0xFFFFFFFFFFFFFFFF))
run(np.argsort(hsh, kind="stable"), "hash", o1, d1, alive1, near1, hitm1)

# signature: lexicographic over the packed hit bitmask (upper bound).
words = np.packbits(hitm1, axis=1)
keys_list = [words[:, i] for i in range(words.shape[1] - 1, -1, -1)]
keys_list.append((~alive1).astype(np.uint8))
sig_order = np.lexsort(keys_list)
run(sig_order, "signature", o1, d1, alive1, near1, hitm1)
