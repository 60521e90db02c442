"""Finite-difference validation of differentiable rendering (render/diff.py).

The north-star requirement (BASELINE.json): pixel gradients flow to material
parameters and the sky map, validated by finite differences on the CPU path
at tiny resolutions.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuda_raytracer_tpu.models.scene_dsl import assemble_scene, parse_scene_text
from cuda_raytracer_tpu.render import diff

CORNELL_MINI = """
material light diffuse 0 0 0 specular 0 0 0 emit 10 10 10
material white diffuse 0.7 0.7 0.7
material red diffuse 0.6 0.1 0.1
quad light -3 5.99 2 -3 5.99 4 -1 5.99 4 -1 5.99 2
quad white -6 0 0 0 0 0 0 0 6 -6 0 6
quad white -6 6 0 -6 6 6 0 6 6 0 6 0
quad white -6 0 6 0 0 6 0 6 6 -6 6 6
quad red -6 0 0 -6 0 6 -6 6 6 -6 6 0
sky 0.1 0.2 0.3
camera position -3 3 -8 forward 0 0 1 up 0 1 0 fov 40
image 4 4 2 3 1
"""

METAL_SPHERE = """
material shiny specular 0.9 0.9 0.9 metallicity 1 roughness 0.3
sphere shiny 0 0 4 2
sky 0.3 0.5 0.8
camera position 0 0 -2 forward 0 0 1 up 0 1 0 fov 60
image 4 4 2 2 1
"""

GLASS_SPHERE = """
material glass ior 1.5
sphere glass 0 0 4 2
sky 0.3 0.5 0.8
camera position 0 0 -2 forward 0 0 1 up 0 1 0 fov 60
image 4 4 2 3 1
"""


def _scene(text, env=None):
    scene = assemble_scene(parse_scene_text(text), prefer_native_bvh=False)
    if env is not None:
        scene = dataclasses.replace(scene, environment_map=jnp.asarray(env))
    return scene


def _smooth_env(size=16):
    """Low-frequency directional sky so scatter directions carry signal."""
    ys, xs = np.meshgrid(
        np.linspace(0, 1, size), np.linspace(0, 1, size), indexing="ij"
    )
    r = 0.2 + 0.8 * xs
    g = 0.2 + 0.8 * ys
    b = 0.5 + 0.5 * np.sin(4 * xs) * np.cos(3 * ys)
    return np.stack([r, g, b], axis=-1).astype(np.float32)


def _loss(params, scene, rpp=2, bounces=3, reparam=False):
    radiance = diff.render_radiance(
        params, scene, jnp.uint32(0), rpp, bounces, reparam=reparam
    )
    # Weighted sum (not plain mean) so gradients vary across channels.
    weights = jnp.linspace(0.5, 1.5, radiance.size).reshape(radiance.shape)
    return jnp.sum(radiance * weights)


def _fd_check(scene, get, set_, eps, reparam=False, rtol=0.05, atol=1e-3):
    """Compare autodiff gradient of one scalar against central differences."""
    params, _ = diff.split_params(scene)

    grad = jax.grad(lambda p: _loss(p, scene, reparam=reparam))(params)
    auto = float(get(grad))

    plus = float(_loss(set_(params, +eps), scene, reparam=reparam))
    minus = float(_loss(set_(params, -eps), scene, reparam=reparam))
    fd = (plus - minus) / (2 * eps)
    assert np.isclose(auto, fd, rtol=rtol, atol=atol), (auto, fd)
    return auto


def _bump_material(params, field, index, channel, delta):
    mats = params.materials
    arr = getattr(mats, field)
    if arr.ndim == 2:
        arr = arr.at[index, channel].add(delta)
    else:
        arr = arr.at[index].add(delta)
    return params._replace(materials=dataclasses.replace(mats, **{field: arr}))


def test_grad_diffuse_albedo():
    scene = _scene(CORNELL_MINI)
    auto = _fd_check(
        scene,
        get=lambda g: g.materials.diffuse_albedo[1, 0],  # white wall, red chan
        set_=lambda p, d: _bump_material(p, "diffuse_albedo", 1, 0, d),
        eps=1e-2,
    )
    assert auto != 0.0  # white walls definitely influence the image


def test_grad_emission():
    scene = _scene(CORNELL_MINI)
    auto = _fd_check(
        scene,
        get=lambda g: g.materials.emitted[0, 1],
        set_=lambda p, d: _bump_material(p, "emitted", 0, 1, d),
        eps=1e-1,
    )
    assert auto > 0.0  # more light → more radiance everywhere


def test_grad_sky():
    scene = _scene(CORNELL_MINI)

    def bump(p, d):
        return p._replace(environment_map=p.environment_map + d)

    params, _ = diff.split_params(scene)
    grad = jax.grad(lambda p: _loss(p, scene))(params)
    auto = float(jnp.sum(grad.environment_map))
    plus = float(_loss(bump(params, 1e-2), scene))
    minus = float(_loss(bump(params, -1e-2), scene))
    fd = (plus - minus) / 2e-2
    assert np.isclose(auto, fd, rtol=0.05, atol=1e-3)
    assert auto > 0.0  # escaping rays see the sky


def test_grad_specular_albedo_metal():
    scene = _scene(METAL_SPHERE)
    auto = _fd_check(
        scene,
        get=lambda g: g.materials.specular_albedo[0, 2],
        set_=lambda p, d: _bump_material(p, "specular_albedo", 0, 2, d),
        eps=1e-2,
        reparam=False,
    )
    assert auto > 0.0


def test_grad_roughness_reparam():
    # Pathwise gradient through the scatter direction: only exists with
    # reparam=True (detached mode must give exactly zero). Needs a
    # direction-dependent sky + bilinear filtering to carry signal.
    scene = _scene(METAL_SPHERE, env=_smooth_env())
    params, _ = diff.split_params(scene)
    g_detached = jax.grad(lambda p: _loss(p, scene, reparam=False))(params)
    assert float(g_detached.materials.roughness[0]) == 0.0

    auto = _fd_check(
        scene,
        get=lambda g: g.materials.roughness[0],
        set_=lambda p, d: _bump_material(p, "roughness", 0, None, d),
        eps=5e-3,
        reparam=True,
        rtol=0.1,
        atol=5e-3,
    )
    # roughness changes where the reflection lands on the sky → non-zero.
    assert auto != 0.0


def test_grad_ior_reparam():
    scene = _scene(GLASS_SPHERE, env=_smooth_env())
    _fd_check(
        scene,
        get=lambda g: g.materials.index_of_refraction[0],
        set_=lambda p, d: _bump_material(p, "index_of_refraction", 0, None, d),
        eps=2e-3,
        reparam=True,
        rtol=0.15,
        atol=5e-3,
    )


HALF_METAL_SPHERE = """
material half diffuse 0 0 0 specular 1 1 1 metallicity 0.5
sphere half 0 0 4 2
sky 0.5 0.6 0.7
camera position 0 0 -2 forward 0 0 1 up 0 1 0 fov 60
image 1 1 2048 2 1
"""


def test_grad_metallicity():
    """Score-function gradient for the discrete specular/diffuse coin.

    The fixed-seed estimator is a step function of metallicity (each ray's
    branch flips when its uniform draw crosses p), so finite differences only
    approximate the distributional derivative with MANY samples and a wide
    eps: 2048 rays through one pixel, eps=0.15, and a high-contrast material
    (black diffuse vs white specular) so the branch difference dominates the
    Monte-Carlo noise. The REINFORCE surrogate's autodiff gradient must land
    on that average (measured: auto 0.568±0.007, fd 0.550±0.016 across
    seeds)."""
    scene = _scene(HALF_METAL_SPHERE)
    params, _ = diff.split_params(scene)

    def loss(p):
        radiance = diff.render_radiance(p, scene, jnp.uint32(0), 2048, 2)
        return jnp.sum(radiance)

    auto = float(jax.grad(loss)(params).materials.metallicity[0])
    eps = 0.15
    plus = float(loss(_bump_material(params, "metallicity", 0, None, +eps)))
    minus = float(loss(_bump_material(params, "metallicity", 0, None, -eps)))
    fd = (plus - minus) / (2 * eps)
    assert fd > 0.1  # going metallic brightens: specular white vs diffuse black
    assert np.isclose(auto, fd, rtol=0.12, atol=5e-3), (auto, fd)


def test_train_step_reduces_loss():
    import optax

    scene = _scene(CORNELL_MINI)
    params, _ = diff.split_params(scene)
    # Target: the render with the TRUE parameters; start from perturbed ones.
    target = diff.render_radiance(params, scene, jnp.uint32(7), 2, 3)
    perturbed = _bump_material(params, "diffuse_albedo", 1, 0, -0.3)
    perturbed = _bump_material(perturbed, "emitted", 0, 1, 3.0)

    optimizer = optax.adam(3e-2)
    step = diff.make_train_step(scene, optimizer, rays_per_pixel=2, bounces=3)
    opt_state = optimizer.init(perturbed)
    p = perturbed
    losses = []
    for i in range(20):
        p, opt_state, loss = step(p, opt_state, target, jnp.uint32(7))
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0], losses[:3] + losses[-3:]


def test_check_radiance_exact_audit():
    """The one-shot training-configuration audit must report pair-budget
    overflow (and silence on a clean config) — it is the documented way to
    certify a training setup whose jitted loss skips the per-step check."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from test_cluster import _scene_with_clusters

    scene = _scene_with_clusters(tri_count=3000, cluster_tris=128)
    if scene.num_clusters < 3:
        pytest.skip("needs several clusters")
    clean = scene.replace(
        config=dataclasses.replace(
            scene.config, intersector="packet", sort_rays=False,
            packet_cap=scene.num_clusters, rays_per_pixel=1, bounces=2,
        )
    )
    assert diff.check_radiance_exact(clean) == 0
    tiny = scene.replace(
        config=dataclasses.replace(
            scene.config, intersector="packet", sort_rays=False,
            packet_cap=1, rays_per_pixel=1, bounces=2,
        )
    )
    assert diff.check_radiance_exact(tiny) > 0
