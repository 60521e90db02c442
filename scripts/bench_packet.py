"""Compare packet-intersector backends on TPU: speed + agreement, for
primary rays and for post-bounce (less coherent) rays.

Backends: "xla" (while_loop sweep), "pallas" (cull + extraction + sweep
kernels), and "fused" (single-program closest-hit kernel) when present.
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
C = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
WIDTH = HEIGHT = 256
RPP = 2
scene = load_scene(
    f"/root/reference/{SCENE}.scene",
    config_overrides=dict(width=WIDTH, height=HEIGHT, rays_per_pixel=RPP, bounces=10),
    cluster_tris=C,
)
R = scene.num_pixels * RPP
print(f"{SCENE}: R={R} tris={scene.triangle_count} K={scene.num_clusters} C={scene.cluster_tris}")

ray_id = jnp.arange(R, dtype=jnp.int32)
state0 = wavefront.make_initial_state(scene, ray_id, RPP, jnp.uint32(0))

# post-bounce states (realistic incoherent rays), with and without reorder
states = {"primary": state0}
s = state0
for b in range(3):
    s, _ = wavefront.process_rays(scene, s, jnp.uint32(0), b)
    if b == 0:
        states["bounce1_sorted"] = wavefront.reorder_rays(scene, s)
    if b == 2:
        states["bounce3_nosort"] = s
        states["bounce3_sorted"] = wavefront.reorder_rays(scene, s)


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


closest0 = jnp.full((R,), 1e30, jnp.float32)
hit0 = jnp.full((R,), -1, jnp.int32)
cap = min(scene.config.packet_cap, scene.num_clusters)

backends = ["xla", "pallas"]

for name, st in states.items():
    alive = jnp.any(st.transmitted != 0.0, axis=-1)
    cl = jnp.where(alive, closest0, -1.0)
    results = {}
    line = f"{name:16s} alive={int(alive.sum()):7d}"
    for backend in backends:
        f = jax.jit(
            lambda o, d, c, b=backend: pi.closest_hit_packet(
                scene, o, d, c, hit0, cap=cap, backend=b
            )
        )
        dt, (t, i, sus) = timeit(f, st.origin, st.direction, cl)
        results[backend] = (t, i)
        line += f" | {backend} {dt*1e3:7.2f}ms sus={int(sus):5d}"
    t_a, i_a = results[backends[0]]
    for b in backends[1:]:
        t_b, i_b = results[b]
        agree_t = float(jnp.mean(jnp.isclose(t_a, t_b, rtol=1e-5, atol=1e-6)))
        line += f" agree({backends[0]},{b})={agree_t:.6f}"
    print(line, flush=True)
