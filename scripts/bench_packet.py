"""Compare packet vs clustered intersector on TPU: speed + agreement,
for primary rays and for post-bounce (less coherent) rays."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.ops import cluster_intersect as ci
from cuda_raytracer_tpu.ops import packet_intersect as pi
from cuda_raytracer_tpu.render import wavefront

SCENE = sys.argv[1] if len(sys.argv) > 1 else "teapot"
WIDTH = HEIGHT = 256
RPP = 2
scene = load_scene(
    f"/root/reference/{SCENE}.scene",
    config_overrides=dict(width=WIDTH, height=HEIGHT, rays_per_pixel=RPP, bounces=10),
)
R = scene.num_pixels * RPP
print(f"{SCENE}: R={R} tris={scene.triangle_count} K={scene.num_clusters} C={scene.cluster_tris}")

ray_id = jnp.arange(R, dtype=jnp.int32)
state0 = wavefront.make_initial_state(scene, ray_id, RPP, jnp.uint32(0))

# post-bounce states (realistic incoherent rays), with and without reorder
states = {"primary": state0}
s = state0
for b in range(3):
    s = wavefront.process_rays(scene, s, jnp.uint32(0), b)
    if b == 0:
        states["bounce1_nosort"] = s
        states["bounce1_sorted"] = wavefront.reorder_rays(scene, s)
    if b == 2:
        states["bounce3_nosort"] = s
        states["bounce3_sorted"] = wavefront.reorder_rays(scene, s)


def timeit(label, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    return dt, out


closest0 = jnp.full((R,), 1e30, jnp.float32)
hit0 = jnp.full((R,), -1, jnp.int32)

f_clustered = jax.jit(
    lambda o, d, c: ci.closest_hit_clustered(scene, o, d, c, hit0)
)
f_packet = jax.jit(
    lambda o, d, c, ppt: pi.closest_hit_packet(scene, o, d, c, hit0, cap=ppt),
    static_argnums=(3,),
)

for name, st in states.items():
    alive = jnp.any(st.transmitted != 0.0, axis=-1)
    cl = jnp.where(alive, closest0, -1.0)
    dt_c, (t_c, i_c, ov_c) = timeit(f"clustered", f_clustered, st.origin, st.direction, cl)
    for ppt in (8, 16, 32):
        dt_p, (t_p, i_p, ov_p) = timeit("packet", f_packet, st.origin, st.direction, cl, ppt)
        agree_t = jnp.mean(jnp.isclose(t_p, t_c, rtol=1e-5, atol=1e-6))
        agree_i = jnp.mean((i_p == i_c).astype(jnp.float32))
        alive_n = int(alive.sum())
        print(
            f"{name:16s} alive={alive_n:7d} clustered {dt_c*1e3:7.2f}ms (ovf {int(ov_c)})"
            f" | packet ppt={ppt:2d} {dt_p*1e3:7.2f}ms (ovf {int(ov_p)})"
            f" agree_t={float(agree_t):.6f} agree_i={float(agree_i):.6f}"
        )
