"""Morton (Z-order) sort keys for wavefront ray reordering.

TPU equivalent of the reference's ray-coherence keys (scene.cu:42-60,480-485):
5 bits per axis for origin and direction, interleaved into 15-bit codes, packed
as ``origin_code << 16 | direction_code`` in a 32-bit key. Dead rays get key
0xFFFFFFFF so an ascending sort groups them at the tail (scene.cu:480-484).

Divergences from the reference (deliberate, quality-only — SURVEY.md quirks):
  * Q1: the reference's middle interleave mask is the hex literal
    0x1000010100011 that was clearly meant as binary (scene.cu:47), which
    zeroes most key bits. We implement the correct 3-way bit spread
    (masks 0x100F / 0x10C3 / 0x1249).
  * Q5: the reference normalises origins by 1/max_coord instead of
    1/(max-min) (scene.cu:830). We use the correct extent normalisation.
Both bugs only degrade sort quality, never correctness; images are unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cuda_raytracer_tpu.ops import vecmath

DEAD_RAY_KEY = np.uint32(0xFFFFFFFF)


def interleave_5(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 5 bits of ``x`` to every 3rd bit: 0bABCDE →
    0b A00B00C00D00E. Input/output uint32."""
    x = x & np.uint32(0x1F)
    x = (x | (x << 8)) & np.uint32(0x100F)
    x = (x | (x << 4)) & np.uint32(0x10C3)
    x = (x | (x << 2)) & np.uint32(0x1249)
    return x


def morton_code(v: jnp.ndarray) -> jnp.ndarray:
    """15-bit Morton code of points ``v`` in [0, 1]^3, shape (..., 3) →
    (...,) uint32. Matches the reference quantisation ``(ushort)(x * 31.99)``
    (scene.cu:53-60)."""
    q = (v * np.float32(31.99)).astype(jnp.uint32)
    return (
        interleave_5(q[..., 0])
        | (interleave_5(q[..., 1]) << 1)
        | (interleave_5(q[..., 2]) << 2)
    )


def ray_sort_keys(
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    alive: jnp.ndarray,
    min_coord: jnp.ndarray,
    inv_extent: jnp.ndarray,
) -> jnp.ndarray:
    """32-bit coherence keys for a ray batch (scene.cu:484 semantics):
    high half = Morton code of the normalised origin, low half = Morton code
    of the direction mapped from [-1,1] to [0,1]. Dead rays → 0xFFFFFFFF.

    Key-layout note (measured on teapot, v5e): adaptive live-wavefront
    origin bounds and direction-major layouts were both tried and LOSE
    (fwd+bwd step 130 → 147 / 179 ms) — finer origin sorting scatters
    directions within ray tiles, growing each tile's hit-cluster union.
    The reference layout with static scene bounds stays."""
    origin_unit = vecmath.clamp01((origin - min_coord) * inv_extent)
    dir_unit = 0.5 * (direction + 1.0)
    keys = (morton_code(origin_unit) << 16) | morton_code(dir_unit)
    return jnp.where(alive, keys, DEAD_RAY_KEY)


# Cluster-box chunk width for the first2 key pass: bounds the fused (R, KC)
# slab intermediate (~64 MB f32 at R=131k) while keeping the unrolled
# Python loop short (3 chunks on teapot, 7 on lamp at C=256).
_FIRST2_CHUNK = 256


def first2_cluster_keys(
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    alive: jnp.ndarray,
    cluster_min: jnp.ndarray,
    cluster_max: jnp.ndarray,
    num_clusters: int,
    cull_split: int,
) -> jnp.ndarray:
    """Cull-derived coherence keys: (first, second) slab-hit cluster index.

    The packet intersector's cost is the per-tile UNION of slab-hit clusters
    (the lockstep-SIMD residual, PERF_NOTES.md), which the Morton key above
    only proxies through origin/direction locality. Sorting instead by the
    ray's first two hit cluster indices groups rays that will sweep the same
    blocks into the same tiles — measured in simulation at the full
    hit-signature upper bound (scripts/cullsort_sim.py: teapot b1 swept MT
    tests 2996 → 1262/ray vs Morton's proxy; first-hit alone only reaches
    2665, and hashing full signatures LOSES by destroying cluster-index
    locality between near-identical rows).

    Cluster indices are BVH-cut DFS order (models/cluster.py), so ascending
    index is itself a spatial walk — lexicographic (fh, sh) order inherits
    that. Keys pack as ``fh11 << 21 | sh11 << 10`` (indices scaled to 11
    bits when K+1 > 2048, sentinel K = "no hit" pinned to 2047): the
    counting engine's bucket bits 30..23 then carry fh at 4-cluster
    granularity, and its stable pass keeps the previous bounce's fine order
    within buckets. Alive rays that hit nothing sort after all hitters
    (they still need env-map shading); dead rays keep DEAD_RAY_KEY last.

    One extra (R, K·split) slab pass per sorted bounce, chunked to bound
    intermediates; reference has no analogue (its per-thread walk has no
    tile-union cost to attack — scene.cu:134-241)."""
    o = jax.lax.stop_gradient(origin)
    d = jax.lax.stop_gradient(direction)
    rows = num_clusters * cull_split
    boxes_min = cluster_min[:rows]
    boxes_max = cluster_max[:rows]
    pad = (-rows) % _FIRST2_CHUNK
    if pad:
        # Far-away POINT boxes (the split_aabbs convention): a point box can
        # only slab-hit when all three axis parameters tie exactly — an
        # inverted min>max box would always hit under windowed slab forms.
        boxes_min = jnp.pad(boxes_min, ((0, pad), (0, 0)), constant_values=3e30)
        boxes_max = jnp.pad(boxes_max, ((0, pad), (0, 0)), constant_values=3e30)
    inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)
    K = num_clusters
    fh = jnp.full(o.shape[0], K, jnp.int32)
    sh = jnp.full(o.shape[0], K, jnp.int32)
    for r0 in range(0, rows, _FIRST2_CHUNK):
        bmin = boxes_min[r0 : r0 + _FIRST2_CHUNK]  # (kc, 3)
        bmax = boxes_max[r0 : r0 + _FIRST2_CHUNK]
        t1 = (bmin[None] - o[:, None]) * inv[:, None]  # (R, kc, 3)
        t2 = (bmax[None] - o[:, None]) * inv[:, None]
        near = jnp.maximum(jnp.minimum(t1, t2).max(axis=2), 0.0)
        far = jnp.maximum(t1, t2).min(axis=2)
        hit = near <= far  # (R, kc)
        # Sub-box rows map down to their cluster id; first two DISTINCT ids.
        ids = (r0 + jnp.arange(bmin.shape[0], dtype=jnp.int32)) // cull_split
        idx = jnp.where(hit, ids[None], K)
        m1 = idx.min(axis=1)
        m2 = jnp.where(idx == m1[:, None], K, idx).min(axis=1)
        # Chunks ascend in cluster index, so every new candidate id is >= any
        # previously found one; the merge is a fill-in. A chunk boundary can
        # only re-present fh's own id (sub-rows of one cluster when
        # cull_split > 1), guarded by c1.
        c1 = jnp.where(m1 == fh, m2, m1)
        sh = jnp.where(fh == K, m2, jnp.minimum(sh, c1))
        fh = jnp.minimum(fh, m1)
    if K + 1 > 2048:
        fh = (fh * 2047) // K  # monotone squeeze; sentinel K → exactly 2047
        sh = (sh * 2047) // K
    keys = (fh.astype(jnp.uint32) << 21) | (sh.astype(jnp.uint32) << 10)
    return jnp.where(alive, keys, DEAD_RAY_KEY)
