"""BVH traversal on TPU (reference: scene.cu:134-241).

The reference walks the BVH with a per-thread dual stack (node index + entry
distance), popping the nearest child first and skipping nodes whose entry
distance already exceeds the closest hit. A TPU has no per-lane control flow,
so the walk here is *lockstep-vectorised*: a tile of rays advances through one
``lax.while_loop`` together, each ray carrying its own stack as a row of a
(rays, depth+1) array. Pops/pushes are masked gathers/scatters; rays whose
stack is empty idle until the whole tile finishes. Morton reordering
(ops/morton.py) keeps tiles coherent so the lockstep walk wastes little work.

Leaf intersection is batched: every pop gathers up to ``max_leaf_size``
triangles per ray as an (R, L, 3) tile and runs Möller–Trumbore on the VPU.

Memory: tiles of ``tile_size`` rays bound the stack working set
(tile_size × 31 × 8 bytes); the ray batch is processed with ``lax.map`` over
tiles so XLA pipelines tile t+1's gathers against tile t's compute.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cuda_raytracer_tpu.models.bvh import MAX_BVH_DEPTH
from cuda_raytracer_tpu.models.scene import Scene
from cuda_raytracer_tpu.ops import intersect

STACK_DEPTH = MAX_BVH_DEPTH + 1  # reference: unsigned node_index_stack[31]
DEFAULT_TILE = 1 << 15


def _safe_inv_dir(direction: jnp.ndarray) -> jnp.ndarray:
    """1/direction that never produces NaN in the slab test. The reference
    relies on IEEE min/max dropping NaNs from 0 * inf (hardware fminf/fmaxf);
    jnp.minimum propagates NaNs instead, so we replace ±inf with a huge
    finite value (0 * 1e30 = 0 keeps the same accept/reject behaviour)."""
    tiny = np.float32(1e-30)
    huge = np.float32(1e30)
    small = jnp.abs(direction) < tiny
    return jnp.where(
        small,
        jnp.where(direction < 0, -huge, huge),
        1.0 / jnp.where(small, 1.0, direction),
    )


def _traverse_tile(
    scene: Scene,
    origin: jnp.ndarray,  # (R, 3)
    direction: jnp.ndarray,  # (R, 3)
    closest: jnp.ndarray,  # (R,) initial closest hit (e.g. from spheres)
    hit_index: jnp.ndarray,  # (R,) int32 initial hit index
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    rays = origin.shape[0]
    leaf_span = max(scene.max_leaf_size, 1)
    rows = jnp.arange(rays)
    inv_dir = _safe_inv_dir(direction)

    stack_node = jnp.zeros((rays, STACK_DEPTH), jnp.int32)
    stack_dist = jnp.zeros((rays, STACK_DEPTH), jnp.float32)
    stack_size = jnp.ones((rays,), jnp.int32)

    def cond(state):
        _, _, stack_size, _, _ = state
        return jnp.any(stack_size > 0)

    def body(state):
        stack_node, stack_dist, stack_size, closest, hit_index = state
        active = stack_size > 0
        top = jnp.maximum(stack_size - 1, 0)
        node = stack_node[rows, top]
        dist = stack_dist[rows, top]
        stack_size = jnp.where(active, stack_size - 1, stack_size)
        # Skip stale entries: a closer hit may have been found since the node
        # was pushed (scene.cu:150-153).
        process = active & (dist < closest)

        child1 = scene.bvh_child1[node]
        child2 = scene.bvh_child2[node]
        is_leaf = child2 <= child1

        # --- Leaf: batched Möller–Trumbore over the leaf's triangle span ---
        leaf_do = process & is_leaf
        tri_ids = child2[:, None] + jnp.arange(leaf_span, dtype=jnp.int32)[None, :]
        tri_valid = leaf_do[:, None] & (tri_ids < child1[:, None])
        tri_clamped = jnp.clip(tri_ids, 0, scene.tri_p1.shape[0] - 1)
        t = intersect.moller_trumbore(
            origin[:, None, :],
            direction[:, None, :],
            scene.tri_p1[tri_clamped],
            scene.tri_e1[tri_clamped],
            scene.tri_e2[tri_clamped],
        )  # (R, L)
        t = jnp.where(tri_valid, t, intersect.MISS)
        best = jnp.argmin(t, axis=1)
        best_t = jnp.take_along_axis(t, best[:, None], axis=1)[:, 0]
        better = best_t < closest
        closest = jnp.where(better, best_t, closest)
        hit_index = jnp.where(
            better,
            scene.sphere_count
            + jnp.take_along_axis(tri_clamped, best[:, None], axis=1)[:, 0],
            hit_index,
        )

        # --- Inner: slab-test both children, push far then near ------------
        inner_do = process & ~is_leaf
        hit1, t1 = intersect.ray_aabb(
            origin, inv_dir, scene.bvh_min[child1], scene.bvh_max[child1], closest
        )
        hit2, t2 = intersect.ray_aabb(
            origin, inv_dir, scene.bvh_min[child2], scene.bvh_max[child2], closest
        )
        hit1 = hit1 & inner_do
        hit2 = hit2 & inner_do
        both = hit1 & hit2
        c1_near = t1 < t2
        # First pushed entry (popped last): the farther child when both hit,
        # else whichever single child hit.
        far_node = jnp.where(both, jnp.where(c1_near, child2, child1),
                             jnp.where(hit1, child1, child2))
        far_dist = jnp.where(both, jnp.maximum(t1, t2), jnp.where(hit1, t1, t2))
        near_node = jnp.where(c1_near, child1, child2)
        near_dist = jnp.minimum(t1, t2)

        push_a = hit1 | hit2
        push_b = both
        slot_a = jnp.where(push_a, stack_size, STACK_DEPTH)
        slot_b = jnp.where(push_b, stack_size + 1, STACK_DEPTH)
        stack_node = stack_node.at[rows, slot_a].set(far_node, mode="drop")
        stack_dist = stack_dist.at[rows, slot_a].set(far_dist, mode="drop")
        stack_node = stack_node.at[rows, slot_b].set(near_node, mode="drop")
        stack_dist = stack_dist.at[rows, slot_b].set(near_dist, mode="drop")
        stack_size = stack_size + push_a.astype(jnp.int32) + push_b.astype(jnp.int32)

        return stack_node, stack_dist, stack_size, closest, hit_index

    state = (stack_node, stack_dist, stack_size, closest, hit_index)
    *_, closest, hit_index = jax.lax.while_loop(cond, body, state)
    return closest, hit_index


@partial(jax.jit, static_argnames=("tile_size",))
def bvh_closest_hit(
    scene: Scene,
    origin: jnp.ndarray,  # (R, 3)
    direction: jnp.ndarray,  # (R, 3)
    closest: jnp.ndarray,  # (R,)
    hit_index: jnp.ndarray,  # (R,) int32
    tile_size: int = DEFAULT_TILE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Update (closest, hit_index) with the nearest triangle hit via the BVH.
    Triangle hits are recorded as ``sphere_count + triangle_index`` to share
    one index space with spheres (scene.cu:194)."""
    rays = origin.shape[0]
    if rays <= tile_size:
        return _traverse_tile(scene, origin, direction, closest, hit_index)

    pad = (-rays) % tile_size
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(
            direction, ((0, pad), (0, 0)), constant_values=1.0
        )
        closest = jnp.pad(closest, (0, pad), constant_values=0.0)
        hit_index = jnp.pad(hit_index, (0, pad), constant_values=-1)
    tiles = (rays + pad) // tile_size

    def run_tile(args):
        return _traverse_tile(scene, *args)

    o = origin.reshape(tiles, tile_size, 3)
    d = direction.reshape(tiles, tile_size, 3)
    c = closest.reshape(tiles, tile_size)
    h = hit_index.reshape(tiles, tile_size)
    closest_t, hit_t = jax.lax.map(run_tile, (o, d, c, h))
    return closest_t.reshape(-1)[:rays], hit_t.reshape(-1)[:rays]
