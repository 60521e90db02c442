"""Scalar NumPy oracle renderer for matched-seed parity tests.

An independent, deliberately slow and simple reimplementation of the reference
renderer's per-ray semantics (scene.cu:78-487, random.cuh) in pure Python /
NumPy scalars. The JAX wavefront renderer must agree with this oracle ray-by-
ray when driven with the same seeding scheme — the ported form of the
reference's CPU-vs-GPU dual-backend cross-check (SURVEY.md §4).

All geometry arithmetic is dtype-generic (``dtype`` param, default float64):

* float64 — the semantic oracle: "what the math means", tolerant comparison.
* float32 — the precision-matched oracle: same rounding regime as the JAX
  renderer, so agreement should be near-total; residual divergence isolates
  genuine *order*-of-operations branch flips (closest-hit ties, Schlick
  coin) rather than precision-width ones.

This file is test infrastructure: it trades all performance for obviousness.
"""

from __future__ import annotations

import math

import numpy as np

M64 = (1 << 64) - 1
MULT = 6364136223846793005
INC = 820957824423429
SEED_MULT = 6839056345687307

HIT_EPS = 0.005
MISS = 1e30


class PcgOracle:
    def __init__(self, seed32: int):
        self.state = ((seed32 & 0xFFFFFFFF) * SEED_MULT) & M64
        self.next32()

    def next32(self) -> int:
        old = self.state
        self.state = (old * MULT + INC) & M64
        xorshifted = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF

    def random01(self) -> np.float32:
        return np.float32(np.float32(self.next32()) * (np.float32(1.0) / np.float32(4294967295.0)))

    def random02(self) -> np.float32:
        return np.float32(np.float32(self.next32()) * (np.float32(2.0) / np.float32(4294967295.0)))

    def random_radians(self) -> np.float32:
        return np.float32(
            np.float32(self.next32()) * (np.float32(2.0 * math.pi) / np.float32(4294967295.0))
        )

    def on_sphere(self, dt=np.float64) -> np.ndarray:
        r1 = dt(self.random_radians())
        r2 = dt(self.random02())
        x = np.sqrt(np.maximum(r2 * (dt(2.0) - r2), dt(0.0)))
        return np.array([np.cos(r1) * x, np.sin(r1) * x, dt(1.0) - r2], dt)


def normalise(v):
    return v / np.sqrt(np.dot(v, v))


def generate_ray(scene_np, ray_index, rays_per_pixel, pass_seed):
    """scene.cu:78-105 semantics on a dict of numpy scene data (arrays carry
    the oracle dtype; all arithmetic stays in it via NEP-50 weak promotion)."""
    rng = PcgOracle((ray_index * 2239826922 + 709579 * pass_seed) & 0xFFFFFFFF)
    pixel = ray_index // rays_per_pixel
    x_pix = pixel % scene_np["width"]
    y_pix = pixel // scene_np["width"]
    x = (x_pix + rng.random01().astype(scene_np["dtype"])) * scene_np["inv_width"]
    y = (y_pix + rng.random01().astype(scene_np["dtype"])) * scene_np["inv_height"]
    direction = normalise(
        scene_np["near_plane_top_left"]
        + x * scene_np["scaled_right"]
        - y * scene_np["scaled_up"]
    )
    return scene_np["camera_position"].copy(), direction


def intersect_sphere(origin, direction, center, radius):
    offset = center - origin
    minus_half_b = np.dot(offset, direction)
    quarter_c = np.dot(offset, offset) - radius * radius
    disc = minus_half_b * minus_half_b - quarter_c
    if disc < 0:
        return MISS
    half_sqrt = np.sqrt(disc)
    near = minus_half_b - half_sqrt
    if near >= HIT_EPS:
        return near
    far = minus_half_b + half_sqrt
    if far >= HIT_EPS:
        return far
    return MISS


def intersect_triangle(origin, direction, p1, e1, e2):
    h = np.cross(direction, e2)
    det = np.dot(h, e1)
    if det == 0:
        return MISS
    inv_det = 1.0 / det
    offset = origin - p1
    u = np.dot(offset, h) * inv_det
    if u < 0 or u > 1:
        return MISS
    q = np.cross(offset, e1)
    v = np.dot(direction, q) * inv_det
    if v < 0 or u + v > 1:
        return MISS
    t = np.dot(e2, q) * inv_det
    if t < HIT_EPS:
        return MISS
    return t


def _closest_triangle_vec(scene_np, origin, direction):
    """Möller–Trumbore over the WHOLE triangle array at once — the oracle's
    only vectorised piece, required to make mesh-scene parity feasible
    (126k–620k triangles per ray; the scalar loop is ~1000x too slow).

    Same formulas, same dtype, same elementwise IEEE ops as
    intersect_triangle; every reference `if` becomes a mask. Tie-breaking is
    preserved: the scalar loop keeps the FIRST strictly-smaller t, and
    np.argmin returns the first index of the minimum. Returns (t, index)
    with t == MISS / index == -1 when nothing hits."""
    T = scene_np["triangle_count"]
    p1 = scene_np["tri_p1"][:T]
    e1 = scene_np["tri_e1"][:T]
    e2 = scene_np["tri_e2"][:T]
    h = np.cross(direction[None, :], e2)
    det = (h * e1).sum(axis=1)
    safe_det = np.where(det == 0, 1, det)
    inv_det = 1.0 / safe_det
    offset = origin[None, :] - p1
    u = (offset * h).sum(axis=1) * inv_det
    q = np.cross(offset, e1)
    v = (direction[None, :] * q).sum(axis=1) * inv_det
    t = (e2 * q).sum(axis=1) * inv_det
    miss = (det == 0) | (u < 0) | (u > 1) | (v < 0) | (u + v > 1) | (t < HIT_EPS)
    t = np.where(miss, scene_np["dtype"](MISS), t)
    i = int(np.argmin(t))
    return float(t[i]), i


def closest_hit(scene_np, origin, direction):
    closest = MISS
    index = -1
    for i in range(scene_np["sphere_count"]):
        t = intersect_sphere(
            origin, direction, scene_np["sphere_center"][i], scene_np["sphere_radius"][i]
        )
        if t < closest:
            closest = t
            index = i
    tri_count = scene_np["triangle_count"]
    if tri_count and scene_np.get("vectorized", tri_count > 512):
        # Mesh scenes: dense vectorised MT (identical elementwise math; the
        # per-triangle Python loop is infeasible at 126k+ triangles).
        t, i = _closest_triangle_vec(scene_np, origin, direction)
        if t < closest:
            closest = t
            index = scene_np["sphere_count"] + i
        return closest, index
    for i in range(tri_count):
        t = intersect_triangle(
            origin,
            direction,
            scene_np["tri_p1"][i],
            scene_np["tri_e1"][i],
            scene_np["tri_e2"][i],
        )
        if t < closest:
            closest = t
            index = scene_np["sphere_count"] + i
    return closest, index


def equal_area_project(direction, dt=np.float64):
    """scene.cu:284-318."""
    x, y, z = np.abs(direction)
    r = np.sqrt(np.maximum(dt(1.0) - np.minimum(z, dt(1.0)), dt(0.0)))
    a = np.maximum(x, y)
    b = np.minimum(x, y)
    b = dt(0.0) if a == 0 else dt(b / a)
    phi = dt(2.0 / math.pi) * np.arctan(b)
    if x < y:
        phi = dt(1.0) - phi
    v = phi * r
    u = r - v
    if direction[2] < 0:
        u, v = dt(1.0) - v, dt(1.0) - u
    u = np.copysign(u, direction[0])
    v = np.copysign(v, direction[1])
    return (u + dt(1.0)) * dt(0.5), (v + dt(1.0)) * dt(0.5)


def sample_env(scene_np, direction):
    dt = scene_np.get("dtype", np.float64)
    dx = direction[0] * dt(-0.386527) + direction[2] * dt(0.922278)
    dy = direction[0] * dt(-0.922278) + direction[2] * dt(-0.386527)
    dz = direction[1]
    u, v = equal_area_project(np.array([dx, dy, dz], dt), dt)
    env = scene_np["environment_map"]
    h, w = env.shape[0], env.shape[1]
    tx = int(min(max(u, 0.0), 1.0) * (w - 1) + 0.5)
    ty = int(min(max(v, 0.0), 1.0) * (h - 1) + 0.5)
    return env[min(ty, h - 1), min(tx, w - 1)].astype(dt)


def process_ray(scene_np, state, rng: PcgOracle):
    """One bounce; ``state`` is a dict with origin/direction/transmitted/
    collected (numpy arrays in the oracle dtype). Mirrors scene.cu:320-487."""
    dt = scene_np["dtype"]
    if not state["transmitted"].any():
        return
    origin = state["origin"]
    direction = state["direction"]
    closest, index = closest_hit(scene_np, origin, direction)

    if index == -1:
        sky = sample_env(scene_np, direction)
        state["collected"] = state["collected"] + sky * state["transmitted"]
        state["transmitted"] = np.zeros(3, dt)
        return

    hit_point = origin + dt(closest) * direction
    state["origin"] = hit_point
    if index < scene_np["sphere_count"]:
        center = scene_np["sphere_center"][index]
        radius = scene_np["sphere_radius"][index]
        normal = (hit_point - center) / radius
    else:
        normal = scene_np["tri_normal"][index - scene_np["sphere_count"]].astype(dt)

    m = scene_np["material_index"][index]
    diffuse = scene_np["mat_diffuse"][m].astype(dt)
    specular = scene_np["mat_specular"][m].astype(dt)
    emitted = scene_np["mat_emitted"][m].astype(dt)
    metallicity = scene_np["mat_metallicity"][m].astype(dt)
    roughness = scene_np["mat_roughness"][m].astype(dt)
    ior0 = scene_np["mat_ior"][m].astype(dt)

    state["collected"] = state["collected"] + emitted * state["transmitted"]

    front_face = np.dot(normal, direction) < 0
    if not front_face:
        normal = -normal

    rough_normal = normalise(normal + roughness * rng.on_sphere(dt))
    cos_theta = np.dot(rough_normal, direction)

    if ior0 == 0:
        if rng.random01() <= metallicity:
            state["transmitted"] = state["transmitted"] * specular
            state["direction"] = direction - dt(2.0) * cos_theta * rough_normal
        else:
            state["transmitted"] = state["transmitted"] * diffuse
            state["direction"] = normalise(normal + rng.on_sphere(dt))
    else:
        ior = ior0
        inv_ior = dt(1.0) / ior
        if front_face:
            ior, inv_ior = inv_ior, ior
        sin_theta_sq = dt(1.0) - cos_theta * cos_theta
        r0 = (dt(1.0) - ior) / (dt(1.0) + ior)
        r0 = r0 * r0
        cosine = dt(1.0) + cos_theta
        reflectance = r0 + (dt(1.0) - r0) * cosine**5
        if sin_theta_sq > inv_ior * inv_ior or rng.random01() < reflectance:
            state["transmitted"] = state["transmitted"] * specular
            state["direction"] = direction - dt(2.0) * cos_theta * rough_normal
        else:
            state["transmitted"] = state["transmitted"] * diffuse
            r_out_perp = ior * (direction - cos_theta * rough_normal)
            r_out_par = -np.sqrt(
                np.maximum(dt(1.0) - np.dot(r_out_perp, r_out_perp), dt(0.0))
            ) * rough_normal
            state["direction"] = normalise(r_out_par + r_out_perp)


def scene_to_numpy(scene, dtype=np.float64) -> dict:
    """Convert a device Scene pytree to plain numpy for the oracle."""
    cam = scene.camera
    dt = np.dtype(dtype).type
    return dict(
        dtype=dt,
        width=scene.config.width,
        height=scene.config.height,
        inv_width=dt(float(cam.inv_width)),
        inv_height=dt(float(cam.inv_height)),
        camera_position=np.asarray(cam.position, dt),
        near_plane_top_left=np.asarray(cam.near_plane_top_left, dt),
        scaled_right=np.asarray(cam.scaled_right, dt),
        scaled_up=np.asarray(cam.scaled_up, dt),
        sphere_count=scene.sphere_count,
        triangle_count=scene.triangle_count,
        sphere_center=np.asarray(scene.sphere_center, dt),
        sphere_radius=np.asarray(scene.sphere_radius, dt),
        tri_p1=np.asarray(scene.tri_p1, dt),
        tri_e1=np.asarray(scene.tri_e1, dt),
        tri_e2=np.asarray(scene.tri_e2, dt),
        tri_normal=np.asarray(scene.tri_normal, dt),
        material_index=np.asarray(scene.material_index),
        mat_diffuse=np.asarray(scene.materials.diffuse_albedo),
        mat_specular=np.asarray(scene.materials.specular_albedo),
        mat_emitted=np.asarray(scene.materials.emitted),
        mat_metallicity=np.asarray(scene.materials.metallicity),
        mat_roughness=np.asarray(scene.materials.roughness),
        mat_ior=np.asarray(scene.materials.index_of_refraction),
        environment_map=np.asarray(scene.environment_map),
    )


def render_oracle(scene, rays_per_pixel, bounces, pass_seed=0, dtype=np.float64):
    """Render every ray with the oracle; returns collected (R, 3) in
    ``dtype``. Seeds match the JAX renderer: generate seed =
    id*2239826922 + 709579*pass_seed; bounce seed = id*4137874753 +
    279220567*(pass_seed*20 + bounce)."""
    scene_np = scene_to_numpy(scene, dtype)
    dt = scene_np["dtype"]
    total = scene_np["width"] * scene_np["height"] * rays_per_pixel
    collected = np.zeros((total, 3), dt)
    for i in range(total):
        origin, direction = generate_ray(scene_np, i, rays_per_pixel, pass_seed)
        state = dict(
            origin=origin,
            direction=direction,
            transmitted=np.ones(3, dt),
            collected=np.zeros(3, dt),
        )
        for b in range(bounces):
            seed = (i * 4137874753 + 279220567 * (pass_seed * 20 + b)) & 0xFFFFFFFF
            process_ray(scene_np, state, PcgOracle(seed))
        collected[i] = state["collected"]
    return collected
