"""Equal-area projection + environment sampling tests (scene.cu:281-395)."""

import numpy as np
import jax.numpy as jnp

from cuda_raytracer_tpu.models import procedural
from cuda_raytracer_tpu.ops import envmap

from oracle import equal_area_project


def random_unit(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


def test_projection_matches_oracle():
    dirs = random_unit(500)
    ours = np.asarray(envmap.equal_area_sphere_to_square(jnp.asarray(dirs)))
    for i in range(dirs.shape[0]):
        u, v = equal_area_project(dirs[i].astype(np.float64))
        assert abs(ours[i, 0] - u) < 1e-5 and abs(ours[i, 1] - v) < 1e-5, i


def test_projection_in_unit_square():
    uv = np.asarray(envmap.equal_area_sphere_to_square(jnp.asarray(random_unit(2000))))
    assert uv.min() >= 0.0 and uv.max() <= 1.0


def test_projection_roundtrip_with_inverse():
    # procedural.equal_area_square_to_sphere is the analytic inverse; the
    # composition must return the original direction (in map space).
    dirs = random_unit(300, seed=5)
    uv = np.asarray(envmap.equal_area_sphere_to_square(jnp.asarray(dirs)))
    back = procedural.equal_area_square_to_sphere(uv[:, 0], uv[:, 1])
    assert np.abs(back - dirs).max() < 1e-3


def test_sample_1x1_sky_constant():
    # `sky r g b` scenes use a 1x1 map: every direction returns that colour
    # (scene.cu:597-608).
    env = jnp.asarray(np.array([[[0.2, 0.4, 0.9]]], np.float32))
    out = np.asarray(envmap.sample_environment(env, jnp.asarray(random_unit(64))))
    assert np.allclose(out, [0.2, 0.4, 0.9])


def test_sample_matches_oracle_on_map():
    from oracle import sample_env

    rng = np.random.default_rng(1)
    env = rng.uniform(0, 5, (17, 17, 3)).astype(np.float32)
    dirs = random_unit(200, seed=2)
    ours = np.asarray(envmap.sample_environment(jnp.asarray(env), jnp.asarray(dirs)))
    scene_np = dict(environment_map=env)
    for i in range(dirs.shape[0]):
        ref = sample_env(scene_np, dirs[i].astype(np.float64))
        assert np.allclose(ours[i], ref), i
