"""Scan packet-intersector configs (cluster size C, tile, cap) on TPU.

For each config: time closest-hit on teapot primary rays and bounce-1
(Morton-sorted) rays, and report certified-suspect counts.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.ops import packet_intersect as pi
from cuda_raytracer_tpu.render import wavefront

SCENE = sys.argv[1] if len(sys.argv) > 1 else "teapot"
WIDTH = HEIGHT = 256
RPP = 2


def states_for(scene):
    R = scene.num_pixels * RPP
    ray_id = jnp.arange(R, dtype=jnp.int32)
    s0 = wavefront.make_initial_state(scene, ray_id, RPP, jnp.uint32(0))
    s1, _ = wavefront.process_rays(scene, s0, jnp.uint32(0), 0)
    s1s = wavefront.reorder_rays(scene, s1)
    s2, _ = wavefront.process_rays(scene, s1s, jnp.uint32(0), 1)
    s2s = wavefront.reorder_rays(scene, s2)
    return {"primary": s0, "b1_sorted": s1s, "b2_sorted": s2s}


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


for C in (256, 512, 1024):
    scene = load_scene(
        f"/root/reference/{SCENE}.scene",
        config_overrides=dict(width=WIDTH, height=HEIGHT, rays_per_pixel=RPP, bounces=10),
        cluster_tris=C,
    )
    R = scene.num_pixels * RPP
    states = states_for(scene)
    closest0 = jnp.full((R,), 1e30, jnp.float32)
    hit0 = jnp.full((R,), -1, jnp.int32)
    for tile in (32, 64, 128):
        for cap in (32,):
            cap_eff = min(cap, scene.num_clusters)
            f = jax.jit(
                lambda o, d, c, tile=tile, cap=cap_eff: pi.closest_hit_packet(
                    scene, o, d, c, hit0, tile=tile, cap=cap
                )
            )
            line = f"C={C:5d} K={scene.num_clusters:4d} tile={tile:3d} cap={cap:3d}:"
            for name, st in states.items():
                alive = jnp.any(st.transmitted != 0.0, axis=-1)
                cl = jnp.where(alive, closest0, -1.0)
                try:
                    dt, (t, i, sus) = timeit(f, st.origin, st.direction, cl)
                    line += f"  {name} {dt*1e3:7.2f}ms sus={int(sus):6d}"
                except Exception as e:
                    line += f"  {name} FAIL({type(e).__name__})"
            print(line, flush=True)
