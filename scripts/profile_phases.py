"""Phase-level timing of the clustered intersector on real TPU shapes.

Times (a) full fwd pass, (b) fwd+bwd step, (c) isolated phases of
closest_hit_clustered: cull, pair sort/group, MT sweep — to find where the
1.75 s/step of bench.py actually goes.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.ops import cluster_intersect as ci
from cuda_raytracer_tpu.ops.traverse import _safe_inv_dir
from cuda_raytracer_tpu.render import diff, wavefront

WIDTH = HEIGHT = 256
RPP = 2
BOUNCES = 10

scene = load_scene(
    "/root/reference/teapot.scene",
    config_overrides=dict(width=WIDTH, height=HEIGHT, rays_per_pixel=RPP, bounces=BOUNCES),
)
R = scene.num_pixels * RPP
print(f"R={R} tris={scene.triangle_count} K={scene.num_clusters} C={scene.cluster_tris}")


def timeit(label, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt*1e3:9.2f} ms")
    return dt


# Primary rays for realistic distribution
ray_id = jnp.arange(R, dtype=jnp.int32)
state = wavefront.make_initial_state(scene, ray_id, RPP, jnp.uint32(0))
origin, direction = state.origin, state.direction
closest0 = jnp.full((R,), 1e30, jnp.float32)
hit0 = jnp.full((R,), -1, jnp.int32)

# --- full closest_hit_clustered ---
f_full = jax.jit(lambda o, d: ci.closest_hit_clustered(scene, o, d, closest0, hit0))
timeit("closest_hit_clustered (1 bounce)", f_full, origin, direction)

# --- phase A: cull only ---
H = min(scene.config.cluster_h, scene.num_clusters)


@jax.jit
def cull_only(o, d):
    inv = _safe_inv_dir(d)
    return ci._cull_chunk(o, inv, closest0, scene.cluster_min, scene.cluster_max, H)


cl_list, hit_count, cutoff = cull_only(origin, direction)
timeit("phase A cull (R x K slab + top_k)", cull_only, origin, direction)
print(f"  mean clusters hit/ray: {hit_count.mean():.2f}  max: {hit_count.max()}")

# --- phase B: pair sort/group only ---
H_eff = cl_list.shape[1]


@jax.jit
def group_only(cluster_list):
    Rn = cluster_list.shape[0]
    P = min(6 * Rn, Rn * H_eff)
    pair_cluster_raw = cluster_list.reshape(Rn * H_eff)
    pair_ray_raw = jax.lax.broadcasted_iota(jnp.int32, (Rn, H_eff), 0).reshape(Rn * H_eff)
    pc_sorted, pr_sorted = jax.lax.sort((pair_cluster_raw, pair_ray_raw), num_keys=1)
    return pc_sorted[:P], pr_sorted[:P]


timeit("phase B pair sort (R*H multi-op sort)", group_only, cl_list)

# --- phase B2: bincount/scatter part ---
pc, pr = group_only(cl_list)
K = scene.num_clusters
pair_tile = 128


@jax.jit
def scatter_part(pc, pr):
    P = pc.shape[0]
    counts = jnp.bincount(pc, length=K + 1)[:K]
    padded_counts = ((counts + pair_tile - 1) // pair_tile) * pair_tile
    padded_start = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(padded_counts)])[:K]
    run_start = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)])[:K]
    P_pad = P + K * pair_tile
    pc_safe = jnp.minimum(pc, K - 1)
    dest = padded_start[pc_safe] + (jnp.arange(P, dtype=counts.dtype) - run_start[pc_safe])
    dest = jnp.where(pc < K, dest, P_pad)
    slot_ray = (
        jnp.full((P_pad,), R, jnp.int32)
        .at[dest].set(pr, mode="drop", unique_indices=True, indices_are_sorted=True)
    )
    return slot_ray


timeit("phase B2 bincount+scatter", scatter_part, pc, pr)

# --- phase C via full-minus: time sweep by building inputs then while_loop ---
# (approximate: full - A - B - B2)

import os

if os.environ.get("PROFILE_FULL"):
    # --- forward pass and fwd+bwd ---
    params, _ = diff.split_params(scene)
    target = jnp.zeros((scene.num_pixels, 3), jnp.float32)

    fwd = jax.jit(
        lambda p: diff.render_radiance(p, scene, jnp.uint32(0), rays_per_pixel=RPP, bounces=BOUNCES)
    )
    timeit("forward render_radiance (10 bounces)", fwd, params, n=3)

    grad_fn = jax.jit(
        jax.value_and_grad(
            lambda p: diff.loss_against_target(p, scene, target, jnp.uint32(0), RPP, BOUNCES)
        )
    )
    timeit("fwd+bwd step (10 bounces)", grad_fn, params, n=3)

# gather-heavy suspects: the per-ray scatter-min in phase D
P_pad = 6 * R + K * pair_tile
slot_ray = jnp.clip(jnp.arange(P_pad, dtype=jnp.int32) // 6, 0, R)
best_t = jnp.abs(jnp.sin(jnp.arange(P_pad, dtype=jnp.float32)))


@jax.jit
def scatter_min(slot_ray, best_t):
    return jnp.full((R,), jnp.inf, jnp.float32).at[slot_ray].min(best_t, mode="drop")


timeit("phase D scatter-min (P_pad -> R)", scatter_min, slot_ray, best_t)
