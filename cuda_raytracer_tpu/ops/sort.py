"""Stable bucket (counting) sort for ray-coherence keys, in matmul form.

The per-bounce Morton reorder only needs LOCALITY, not total order: the
packet intersector consumes coherence at ray-tile granularity, the
live-prefix compaction needs dead rays last, and correctness needs any
deterministic permutation (the RNG is keyed by ray id and the final unsort
restores ray order, so every permutation renders bit-identically — the CUB
radix-sort step, raytracing.cu:238-247, redesigned for the MXU).

XLA's comparator sort is a bitonic network — O(n log^2 n) compare-exchange
passes (~3 ms per 131k-key argsort on v5e, the wavefront loop's largest
non-intersection cost). This module instead computes a stable counting-sort
*destination map* on the top byte of the key in one pass of dense matmul
arithmetic, with NO data-dependent control flow or gathers:

  * block-local one-hot M (BLK, B) of each key's bucket;
  * within-block stable rank via a strictly-lower-triangular matmul
    (rank_i = #earlier rows in my bucket = (tril @ M) . M_i) — MXU work;
  * bucket/block bases via two small cumsums over the (nb, B) histogram;
  * dest_i = base[bucket] + block_offset + rank — all recovered from M by
    fused multiply-reduces, so the only materialised intermediates are M
    (bf16) and the rank matmul product.

Exactness: every count fits integer-exactly — M entries are 0/1 (exact in
bf16), matmuls accumulate in f32, and all values stay below 2^24.

Stability is the secret weapon: after bounce b's sort the wavefront is
already in Morton order, so bounce b+1's 256-bucket stable pass preserves
the previous fine order *within* buckets — effective coherence is much
finer than 8 bits.

Enabled by RenderConfig.sort_engine = "count" (default "argsort" until the
hardware A/B in scripts/scan_sort.py lands).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.ops.morton import DEAD_RAY_KEY

# Rows per rank block: the tril matmul is (BLK, BLK) @ (BLK, B) per block.
BLK = 256
# Bucket count. Live keys bucket on bits 30..23 — the full 8 high bits of
# the 15-bit origin Morton code (ray_sort_keys puts it at bits 30..16), so
# ~2.7 octree levels of origin locality at bucket granularity — clamped to
# [0, B-2] (a corner-of-scene key can reach 255 and must not mix into the
# dead bucket, or dead-last breaks); bucket B-1 is exclusively dead rays.
BUCKETS = 256
BUCKET_SHIFT = 23


def bucket_sort_dest(keys: jnp.ndarray) -> jnp.ndarray:
    """→ (n,) int32 stable counting-sort destinations of ``keys`` by
    bucket: element i moves to position dest[i]; buckets ascend, dead rays
    (DEAD_RAY_KEY) land strictly last, ties keep source order."""
    n = keys.shape[0]
    # The exactness argument above requires every cumsum'd count (and so
    # every destination) to stay below 2^24, where f32 integers are exact.
    # Chunked reorders keep n ≤ 262144, but the global-sort fallback
    # (wavefront.sort_chunk_size) can pass a whole wavefront — fail loudly
    # rather than let a rounded f32 dest silently drop rays in the scatter.
    if n >= 1 << 24:
        raise ValueError(
            f"bucket_sort_dest: {n} keys ≥ 2^24 — f32 rank arithmetic would "
            "round; sort in chunks (RenderConfig.sort_chunk_size)"
        )
    pad = (-n) % BLK
    kp = jnp.pad(keys, (0, pad), constant_values=DEAD_RAY_KEY)
    dead = kp == DEAD_RAY_KEY
    b = jnp.minimum(
        jax.lax.shift_right_logical(kp, jnp.uint32(BUCKET_SHIFT)),
        jnp.uint32(BUCKETS - 2),
    ).astype(jnp.int32)
    b = jnp.where(dead, BUCKETS - 1, b)

    nb = (n + pad) // BLK
    kb = b.reshape(nb, BLK)
    iota = jnp.arange(BUCKETS, dtype=jnp.int32)
    m_bool = kb[:, :, None] == iota  # (nb, BLK, B), fusible one-hot
    m16 = m_bool.astype(jnp.bfloat16)
    mf = m_bool.astype(jnp.float32)

    # Within-block stable rank: (tril @ M)[i, b] = # rows j < i in bucket b.
    tril = jnp.tril(jnp.ones((BLK, BLK), jnp.bfloat16), k=-1)
    prior = jnp.einsum(
        "rs,nsb->nrb", tril, m16, preferred_element_type=jnp.float32
    )
    rank = (prior * mf).sum(-1)  # (nb, BLK)

    hist = mf.sum(1)  # (nb, B)
    block_off = jnp.cumsum(hist, axis=0) - hist  # exclusive over blocks
    totals = hist.sum(0)
    base = jnp.cumsum(totals) - totals  # exclusive over buckets
    table = base[None, :] + block_off  # (nb, B)
    dest = ((table[:, None, :] * mf).sum(-1) + rank).astype(jnp.int32)
    # Padding rows are dead keys appended last, so stability parks them at
    # the very end — dest[:n] is a permutation of [0, n).
    return dest.reshape(-1)[:n]
