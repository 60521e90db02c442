"""Camera precompute + primary ray generation vs the oracle (scene.cu:62-105)."""

import numpy as np
import jax.numpy as jnp

from cuda_raytracer_tpu.models.scene import precompute_camera
from cuda_raytracer_tpu.models.scene_dsl import load_scene
from cuda_raytracer_tpu.ops import camera as camera_ops

import oracle

REF = "/root/reference"


def test_precompute_matches_reference_formula():
    cam = precompute_camera(
        position=np.array([1.0, 2.0, 3.0]),
        forward=np.array([0.0, 0.0, 1.0]),
        up=np.array([0.0, 1.0, 0.0]),
        vertical_fov=np.pi / 2,
        width=200,
        height=100,
    )
    # height 2*tan(45°) = 2; width = 2 * 200/100 = 4; right = up x forward = (1,0,0)
    assert np.allclose(np.asarray(cam.scaled_up), [0, 2, 0], atol=1e-6)
    assert np.allclose(np.asarray(cam.scaled_right), [4, 0, 0], atol=1e-6)
    assert np.allclose(
        np.asarray(cam.near_plane_top_left), [-2.0, 1.0, 1.0], atol=1e-6
    )
    assert np.isclose(float(cam.inv_width), 1 / 199)


def test_generate_rays_matches_oracle():
    scene = load_scene(
        f"{REF}/cornell.scene",
        config_overrides=dict(width=7, height=5),
        prefer_native_bvh=False,
    )
    scene_np = oracle.scene_to_numpy(scene)
    rpp = 3
    total = 7 * 5 * rpp
    ray_id = jnp.arange(total, dtype=jnp.int32)
    o, d = camera_ops.generate_rays(scene.camera, 7, rpp, ray_id, pass_seed=11)
    o, d = np.asarray(o), np.asarray(d)
    for i in range(0, total, 7):
        ro, rd = oracle.generate_ray(scene_np, i, rpp, pass_seed=11)
        assert np.allclose(o[i], ro, atol=1e-5)
        assert np.allclose(d[i], rd, atol=1e-5), i
