"""Analytic intersection kernel tests (slab, sphere, Möller–Trumbore)."""

import numpy as np
import jax.numpy as jnp

from cuda_raytracer_tpu.ops import intersect


def test_sphere_head_on():
    origin = jnp.asarray([[0.0, 0.0, 0.0]])
    direction = jnp.asarray([[0.0, 0.0, 1.0]])
    center = jnp.asarray([[0.0, 0.0, 5.0]])
    radius = jnp.asarray([1.0])
    t, i = intersect.intersect_spheres(origin, direction, center, radius)
    assert np.isclose(float(t[0]), 4.0)
    assert int(i[0]) == 0


def test_sphere_inside_takes_far_root():
    # Origin inside the sphere: near root is negative → far root accepted
    # (scene.cu:364-371).
    origin = jnp.asarray([[0.0, 0.0, 0.0]])
    direction = jnp.asarray([[0.0, 0.0, 1.0]])
    center = jnp.asarray([[0.0, 0.0, 0.0]])
    radius = jnp.asarray([2.0])
    t, i = intersect.intersect_spheres(origin, direction, center, radius)
    assert np.isclose(float(t[0]), 2.0)


def test_sphere_epsilon_rejects_self_hit():
    # A hit closer than 0.005 must be ignored (scene.cu:357).
    origin = jnp.asarray([[0.0, 0.0, 0.999]])
    direction = jnp.asarray([[0.0, 0.0, 1.0]])
    center = jnp.asarray([[0.0, 0.0, 0.0]])
    radius = jnp.asarray([1.0])
    t, i = intersect.intersect_spheres(origin, direction, center, radius)
    # Near root is behind the origin and the exit at z=1 is 0.001 away,
    # below the 0.005 epsilon → MISS.
    assert float(t[0]) >= intersect.MISS
    assert int(i[0]) == -1


def test_sphere_closest_of_many():
    origin = jnp.asarray([[0.0, 0.0, 0.0]])
    direction = jnp.asarray([[0.0, 0.0, 1.0]])
    center = jnp.asarray([[0.0, 0.0, 10.0], [0.0, 0.0, 4.0], [0.0, 0.0, 7.0]])
    radius = jnp.asarray([1.0, 1.0, 1.0])
    t, i = intersect.intersect_spheres(origin, direction, center, radius)
    assert int(i[0]) == 1 and np.isclose(float(t[0]), 3.0)


def test_moller_trumbore_basic():
    origin = jnp.asarray([[0.25, 0.25, -1.0]])
    direction = jnp.asarray([[0.0, 0.0, 1.0]])
    p1 = jnp.asarray([[0.0, 0.0, 0.0]])
    e1 = jnp.asarray([[1.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 1.0, 0.0]])
    t = intersect.moller_trumbore(origin, direction, p1, e1, e2)
    assert np.isclose(float(t[0]), 1.0)


def test_moller_trumbore_outside_barycentric():
    origin = jnp.asarray([[0.9, 0.9, -1.0]])  # u+v > 1
    direction = jnp.asarray([[0.0, 0.0, 1.0]])
    p1 = jnp.asarray([[0.0, 0.0, 0.0]])
    e1 = jnp.asarray([[1.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 1.0, 0.0]])
    t = intersect.moller_trumbore(origin, direction, p1, e1, e2)
    assert float(t[0]) == intersect.MISS


def test_moller_trumbore_parallel_ray():
    origin = jnp.asarray([[0.0, 0.0, 1.0]])
    direction = jnp.asarray([[1.0, 0.0, 0.0]])  # parallel to the plane
    p1 = jnp.asarray([[0.0, 0.0, 0.0]])
    e1 = jnp.asarray([[1.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 1.0, 0.0]])
    t = intersect.moller_trumbore(origin, direction, p1, e1, e2)
    assert float(t[0]) == intersect.MISS


def test_aabb_slab():
    origin = jnp.asarray([[0.0, 0.0, -5.0]])
    # Axis-aligned ray: zero components become huge-but-finite inverses.
    inv_dir = jnp.asarray([[1e30, 1e30, 1.0]])
    box_min = jnp.asarray([[-1.0, -1.0, -1.0]])
    box_max = jnp.asarray([[1.0, 1.0, 1.0]])
    hit, tmin = intersect.ray_aabb(
        origin, inv_dir, box_min, box_max, jnp.asarray([1e30])
    )
    assert bool(hit[0]) and np.isclose(float(tmin[0]), 4.0)


def test_aabb_slab_behind():
    origin = jnp.asarray([[0.0, 0.0, 5.0]])
    inv_dir = jnp.asarray([[1e30, 1e30, 1.0]])  # pointing +z, box behind
    box_min = jnp.asarray([[-1.0, -1.0, -1.0]])
    box_max = jnp.asarray([[1.0, 1.0, 1.0]])
    hit, _ = intersect.ray_aabb(
        origin, inv_dir, box_min, box_max, jnp.asarray([1e30])
    )
    assert not bool(hit[0])


def test_aabb_inside_tmin_zero():
    origin = jnp.asarray([[0.0, 0.0, 0.0]])
    inv_dir = jnp.asarray([[1.0, 1.0, 1.0]])
    box_min = jnp.asarray([[-1.0, -1.0, -1.0]])
    box_max = jnp.asarray([[1.0, 1.0, 1.0]])
    hit, tmin = intersect.ray_aabb(
        origin, inv_dir, box_min, box_max, jnp.asarray([1e30])
    )
    assert bool(hit[0]) and float(tmin[0]) == 0.0
