"""Whole-pass bounce megakernel for brute-force scenes.

The reference's CUDA megakernel loops bounces per thread with early exit
(raytracing.cu:83-94, scene.cu:320-487); SIMT gives dead-thread skipping for
free. The XLA wavefront path cannot skip dead rays without a physical
permutation — measured ~4.5 ms per 262k-ray sort against ~0.6 ms for a whole
bounce, so sort-based compaction can never pay on simple scenes — which left
brute scenes (spheres / cornell / cornell_plus) running every bounce at full
wavefront width, 2-4x behind the reference GPU at 100 spp (PROFILE_r05).

This kernel restores the SIMT economy at vector-tile granularity, TPU-style:
the whole pass — camera ray generation, per-bounce sphere + triangle
intersection, shading, and the PCG chain — runs in ONE Pallas kernel over
(ROWS, 128)-ray tiles. Each tile checks one scalar live reduction per bounce
and skips the entire bounce body when dead (pl.when): sky tiles die at
bounce 1, so a spheres-style scene does ~2-3 effective bounces instead of 10.
Ray state never round-trips HBM between bounces (the XLA path pays ~16
floats/ray/bounce both ways), and the wavefront's per-bounce glue (state
merge fusions, materialised draws) disappears.

Numerics: every formula mirrors the wavefront path expression-for-expression
(ops/camera.generate_rays, ops/intersect.intersect_spheres /
moller_trumbore + _closest's first-min tie rule, render/wavefront.
process_rays scene.cu:320-487 semantics, ops/rng.py's 16-bit-limb PCG). The
only Mosaic-specific rewrite is uint32→float32 conversion (unsupported cast),
rebuilt exactly as hi16·65536.0 + lo16 — the f32 rounding of the exact sum
equals XLA's direct convert, so draws are bit-identical. In interpret mode
the kernel therefore reproduces the XLA path bit-for-bit
(tests/test_megakernel.py); on hardware, transcendental lowering (sin/cos)
may differ by ulps, which the oracle-style gates absorb.

Eligibility (megakernel_eligible): brute triangle intersector, constant
(1x1) sky, forward (non-reparam) rendering, small primitive/material counts
(SMEM-resident tables). Everything else keeps the wavefront path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_raytracer_tpu.ops import rng
from cuda_raytracer_tpu.ops.intersect import HIT_EPS, MISS

# Ray rows (of 128 lanes) per grid step: the dead-skip granularity is
# ROWS*128 rays — small enough that object regions die as whole tiles,
# large enough that per-step fixed costs stay negligible. v5e scan on
# spheres 1000²×100 spp (warm, s): rows=32 0.94 / rows=16 0.79 / rows=8
# 1.23 — finer tiles skip more dead work until per-step fixed costs win.
# Env override for hardware scans.
import os as _os

ROWS = int(_os.environ.get("RT_MK_ROWS", "16"))
# SMEM table limits (scalar-broadcast unrolled loops; cornell_plus is 34
# prims and every shipped brute scene fits with slack).
MAX_SPHERES = 32
MAX_TRIS = 128
MAX_MATS = 16

_TWO_PI_INV = np.float32(2.0 * np.pi) / np.float32(4294967295.0)
_TWO_INV = np.float32(2.0) / np.float32(4294967295.0)
_ONE_INV = np.float32(1.0) / np.float32(4294967295.0)


def _u32_to_f32(u):
    """Exact uint32 → float32 value conversion (Mosaic has no u32→f32 cast):
    split into 16-bit halves, convert each exactly, recombine. The single
    f32 rounding happens at the final add — identical to XLA's convert."""
    hi = jax.lax.bitcast_convert_type(
        jax.lax.shift_right_logical(u, jnp.uint32(16)), jnp.int32
    ).astype(jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF), jnp.int32
    ).astype(jnp.float32)
    return hi * jnp.float32(65536.0) + lo


def _normalise3(x, y, z):
    """Mirror vecmath.normalise: v / sqrt(sum(v*v)) with left-assoc sum."""
    m = jnp.sqrt(x * x + y * y + z * z)
    return x / m, y / m, z / m


def _normalise3_safe(x, y, z):
    m = jnp.maximum(jnp.sqrt(x * x + y * y + z * z), jnp.float32(1e-20))
    return x / m, y / m, z / m


def _shade_kernel(
    pf_smem,  # SMEM (24,) f32 — cam pos/top_left/right/up, inv_w/h, sky
    pi_smem,  # SMEM (16,) u32 — [0] camera seed term, [1 + b] bounce terms
    sph_smem,  # SMEM (6, Sp) f32 — cx cy cz radius mat pad
    tri_smem,  # SMEM (14, Tp) f32 — p1 e1 e2 normal mat pad
    mat_smem,  # SMEM (12, Mp) f32 — dr dg db sr sg sb er eg eb met rough ior
    pxx_ref,  # (ROWS, 128) f32 — pixel x coordinate
    pxy_ref,  # (ROWS, 128) f32 — pixel y
    rid_ref,  # (ROWS, 128) i32 — global ray id (-1 = padding lane)
    cx_out,  # (ROWS, 128) f32 — collected r
    cy_out,
    cz_out,
    o_scr,  # VMEM (3, ROWS, 128) f32 — origin
    d_scr,  # VMEM (3, ROWS, 128) f32 — direction
    t_scr,  # VMEM (3, ROWS, 128) f32 — transmitted
    *,
    bounces: int,
    S: int,
    T: int,
    M: int,
):
    f32 = jnp.float32
    u32 = jnp.uint32

    rid = rid_ref[:, :]
    lane_ok = rid >= 0
    rid_u = jax.lax.bitcast_convert_type(rid, u32)

    # ---- camera ray generation (ops/camera.generate_rays) -----------------
    # Seed TERMS (709579·seed and the per-bounce 279220567·(seed·20+b)) are
    # precomputed outside: Mosaic has no scalar bitcast/u32 scalar algebra.
    seed0 = rid_u * u32(2239826922) + pi_smem[0]
    st = rng.srand(seed0)
    st, ja = rng.pcg_next(st)
    st, jb = rng.pcg_next(st)
    x = (pxx_ref[:, :] + _u32_to_f32(ja) * _ONE_INV) * pf_smem[12]
    y = (pxy_ref[:, :] + _u32_to_f32(jb) * _ONE_INV) * pf_smem[13]
    dx = pf_smem[3] + x * pf_smem[6] - y * pf_smem[9]
    dy = pf_smem[4] + x * pf_smem[7] - y * pf_smem[10]
    dz = pf_smem[5] + x * pf_smem[8] - y * pf_smem[11]
    dx, dy, dz = _normalise3(dx, dy, dz)
    d_scr[0], d_scr[1], d_scr[2] = dx, dy, dz
    zero = jnp.zeros_like(dx)
    o_scr[0] = zero + pf_smem[0]
    o_scr[1] = zero + pf_smem[1]
    o_scr[2] = zero + pf_smem[2]
    one_live = jnp.where(lane_ok, f32(1.0), f32(0.0))
    t_scr[0], t_scr[1], t_scr[2] = one_live, one_live, one_live
    cx_out[:, :] = zero
    cy_out[:, :] = zero
    cz_out[:, :] = zero

    sky_r, sky_g, sky_b = pf_smem[14], pf_smem[15], pf_smem[16]

    for b in range(bounces):
        # One scalar reduction gates the whole bounce: a dead tile (every
        # transmitted component zero) skips intersection + shading + RNG.
        tx, ty, tz = t_scr[0], t_scr[1], t_scr[2]
        alive = (tx != 0.0) | (ty != 0.0) | (tz != 0.0)
        tile_live = jnp.max(jnp.abs(tx) + jnp.abs(ty) + jnp.abs(tz)) > 0.0

        @pl.when(tile_live)
        def _(b=b, alive=alive):
            ox, oy, oz = o_scr[0], o_scr[1], o_scr[2]
            dx, dy, dz = d_scr[0], d_scr[1], d_scr[2]
            tx, ty, tz = t_scr[0], t_scr[1], t_scr[2]
            cr, cg, cb = cx_out[:, :], cy_out[:, :], cz_out[:, :]

            # ---- closest hit: spheres then triangles, first-min ties ------
            best = jnp.full(ox.shape, MISS, f32)
            kind = jnp.zeros(ox.shape, f32)  # 0 miss, 1 sphere, 2 triangle
            h_mat = jnp.zeros(ox.shape, f32)
            h_cx = zero
            h_cy = zero
            h_cz = zero
            h_inv_r = zero
            h_nx = zero
            h_ny = zero
            h_nz = zero
            for i in range(S):
                scx, scy, scz = sph_smem[0, i], sph_smem[1, i], sph_smem[2, i]
                rad, smat = sph_smem[3, i], sph_smem[4, i]
                offx = scx - ox
                offy = scy - oy
                offz = scz - oz
                mhb = offx * dx + offy * dy + offz * dz
                qc = offx * offx + offy * offy + offz * offz - rad * rad
                qd = mhb * mhb - qc
                ok = qd >= 0.0
                hs = jnp.sqrt(jnp.maximum(qd, 0.0))
                near = mhb - hs
                far = mhb + hs
                t = jnp.where(near >= HIT_EPS, near,
                              jnp.where(far >= HIT_EPS, far, MISS))
                t = jnp.where(ok, t, MISS)
                upd = t < best
                best = jnp.where(upd, t, best)
                kind = jnp.where(upd, f32(1.0), kind)
                h_mat = jnp.where(upd, smat, h_mat)
                h_cx = jnp.where(upd, scx, h_cx)
                h_cy = jnp.where(upd, scy, h_cy)
                h_cz = jnp.where(upd, scz, h_cz)
                h_inv_r = jnp.where(upd, f32(1.0) / rad, h_inv_r)
            for j in range(T):
                p1x, p1y, p1z = tri_smem[0, j], tri_smem[1, j], tri_smem[2, j]
                e1x, e1y, e1z = tri_smem[3, j], tri_smem[4, j], tri_smem[5, j]
                e2x, e2y, e2z = tri_smem[6, j], tri_smem[7, j], tri_smem[8, j]
                # h = cross(d, e2) (jnp.cross component order)
                hx = dy * e2z - dz * e2y
                hy = dz * e2x - dx * e2z
                hz = dx * e2y - dy * e2x
                det = hx * e1x + hy * e1y + hz * e1z
                det_ok = det != 0.0
                inv_det = jnp.where(
                    det_ok, f32(1.0) / jnp.where(det_ok, det, f32(1.0)), f32(0.0)
                )
                fx = ox - p1x
                fy = oy - p1y
                fz = oz - p1z
                uu = (fx * hx + fy * hy + fz * hz) * inv_det
                qx = fy * e1z - fz * e1y
                qy = fz * e1x - fx * e1z
                qz = fx * e1y - fy * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                valid = (
                    det_ok & (uu >= 0.0) & (uu <= 1.0) & (vv >= 0.0)
                    & (uu + vv <= 1.0) & (t >= HIT_EPS)
                )
                t = jnp.where(valid, t, MISS)
                upd = t < best
                best = jnp.where(upd, t, best)
                kind = jnp.where(upd, f32(2.0), kind)
                h_mat = jnp.where(upd, tri_smem[12, j], h_mat)
                h_nx = jnp.where(upd, tri_smem[9, j], h_nx)
                h_ny = jnp.where(upd, tri_smem[10, j], h_ny)
                h_nz = jnp.where(upd, tri_smem[11, j], h_nz)

            miss = kind == 0.0
            t = jnp.where(miss, f32(0.0), best)

            # ---- per-bounce PCG draws (rng.uniforms semantics) ------------
            seedb = rid_u * u32(4137874753) + pi_smem[1 + b]
            stb = rng.srand(seedb)
            stb, d0 = rng.pcg_next(stb)
            stb, d1 = rng.pcg_next(stb)
            stb, d2 = rng.pcg_next(stb)
            stb, d3 = rng.pcg_next(stb)
            stb, d4 = rng.pcg_next(stb)
            # on_sphere_from_bits, componentwise
            r1a = _u32_to_f32(d0) * _TWO_PI_INV
            r2a = _u32_to_f32(d1) * _TWO_INV
            xa = jnp.sqrt(r2a * (2.0 - r2a))
            sa_x = jnp.cos(r1a) * xa
            sa_y = jnp.sin(r1a) * xa
            sa_z = 1.0 - r2a
            branch_u = _u32_to_f32(d2) * _ONE_INV
            r1b = _u32_to_f32(d3) * _TWO_PI_INV
            r2b = _u32_to_f32(d4) * _TWO_INV
            xb = jnp.sqrt(r2b * (2.0 - r2b))
            sb_x = jnp.cos(r1b) * xb
            sb_y = jnp.sin(r1b) * xb
            sb_z = 1.0 - r2b

            # ---- miss: constant sky (env 1x1) -----------------------------
            cm_r = cr + sky_r * tx
            cm_g = cg + sky_g * ty
            cm_b = cb + sky_b * tz

            # ---- hit: material fetch (where-chain over the tiny table) ----
            hpx = ox + t * dx
            hpy = oy + t * dy
            hpz = oz + t * dz
            ch = [zero] * 12
            for m in range(M):
                sel = h_mat == f32(m)
                for c in range(12):
                    ch[c] = jnp.where(sel, mat_smem[c, m], ch[c])
            dif_r, dif_g, dif_b = ch[0], ch[1], ch[2]
            spc_r, spc_g, spc_b = ch[3], ch[4], ch[5]
            emi_r, emi_g, emi_b = ch[6], ch[7], ch[8]
            metallicity, roughness, ior0 = ch[9], ch[10], ch[11]

            is_sphere = kind == 1.0
            nx = jnp.where(is_sphere, (hpx - h_cx) * h_inv_r, h_nx)
            ny = jnp.where(is_sphere, (hpy - h_cy) * h_inv_r, h_ny)
            nz = jnp.where(is_sphere, (hpz - h_cz) * h_inv_r, h_nz)
            front = nx * dx + ny * dy + nz * dz < 0.0
            nx = jnp.where(front, nx, -nx)
            ny = jnp.where(front, ny, -ny)
            nz = jnp.where(front, nz, -nz)

            rnx, rny, rnz = _normalise3_safe(
                nx + roughness * sa_x, ny + roughness * sa_y,
                nz + roughness * sa_z,
            )
            cos_theta = rnx * dx + rny * dy + rnz * dz

            ch_r = cr + emi_r * tx
            ch_g = cg + emi_g * ty
            ch_b = cb + emi_b * tz

            spec_dx = dx - 2.0 * cos_theta * rnx
            spec_dy = dy - 2.0 * cos_theta * rny
            spec_dz = dz - 2.0 * cos_theta * rnz
            dif_dx, dif_dy, dif_dz = _normalise3_safe(
                nx + sb_x, ny + sb_y, nz + sb_z
            )
            take_spec = branch_u <= metallicity

            ior_nz = jnp.where(ior0 == 0.0, f32(1.0), ior0)
            ior = jnp.where(front, f32(1.0) / ior_nz, ior0)
            inv_ior = jnp.where(front, ior0, f32(1.0) / ior_nz)
            sin_sq = 1.0 - cos_theta * cos_theta
            r0 = (1.0 - ior) / (1.0 + ior)
            r0 = r0 * r0
            cosine = 1.0 + cos_theta
            reflectance = r0 + (1.0 - r0) * cosine**5
            take_refl = (sin_sq > inv_ior * inv_ior) | (branch_u < reflectance)
            rp_x = ior * (dx - cos_theta * rnx)
            rp_y = ior * (dy - cos_theta * rny)
            rp_z = ior * (dz - cos_theta * rnz)
            mag_rp = rp_x * rp_x + rp_y * rp_y + rp_z * rp_z
            par = 1.0 - mag_rp
            par_s = jnp.where(par > 0.0, par, f32(1.0))
            rpar = jnp.where(par > 0.0, jnp.sqrt(par_s), f32(0.0))
            rf_x, rf_y, rf_z = _normalise3_safe(
                -rpar * rnx + rp_x, -rpar * rny + rp_y, -rpar * rnz + rp_z
            )

            is_diel = ior0 > 0.0
            # Boolean select written as logic: Mosaic lowers jnp.where on
            # i1 vectors through an unsupported i8→i1 truncation.
            spec_like = (is_diel & take_refl) | (~is_diel & take_spec)
            tint_r = jnp.where(spec_like, spc_r, dif_r)
            tint_g = jnp.where(spec_like, spc_g, dif_g)
            tint_b = jnp.where(spec_like, spc_b, dif_b)
            nd_x = jnp.where(spec_like, spec_dx,
                             jnp.where(is_diel, rf_x, dif_dx))
            nd_y = jnp.where(spec_like, spec_dy,
                             jnp.where(is_diel, rf_y, dif_dy))
            nd_z = jnp.where(spec_like, spec_dz,
                             jnp.where(is_diel, rf_z, dif_dz))
            # score_w (REINFORCE weight) is exactly 1.0 in value — identity.
            th_r = tx * tint_r
            th_g = ty * tint_g
            th_b = tz * tint_b

            # ---- merge (process_rays update semantics) --------------------
            update = alive
            hit_upd = update & ~miss
            o_scr[0] = jnp.where(hit_upd, hpx, ox)
            o_scr[1] = jnp.where(hit_upd, hpy, oy)
            o_scr[2] = jnp.where(hit_upd, hpz, oz)
            d_scr[0] = jnp.where(hit_upd, nd_x, dx)
            d_scr[1] = jnp.where(hit_upd, nd_y, dy)
            d_scr[2] = jnp.where(hit_upd, nd_z, dz)
            t_scr[0] = jnp.where(update, jnp.where(miss, f32(0.0), th_r), tx)
            t_scr[1] = jnp.where(update, jnp.where(miss, f32(0.0), th_g), ty)
            t_scr[2] = jnp.where(update, jnp.where(miss, f32(0.0), th_b), tz)
            cx_out[:, :] = jnp.where(update, jnp.where(miss, cm_r, ch_r), cr)
            cy_out[:, :] = jnp.where(update, jnp.where(miss, cm_g, ch_g), cg)
            cz_out[:, :] = jnp.where(update, jnp.where(miss, cm_b, ch_b), cb)


def megakernel_eligible(scene, reparam: bool = False) -> bool:
    """True when the whole-pass megakernel can trace this scene: brute
    triangle path, constant sky, SMEM-sized tables, forward rendering."""
    from cuda_raytracer_tpu.render.wavefront import resolved_intersector

    cfg = scene.config
    engine = getattr(cfg, "shade_engine", "auto")
    if engine == "xla" or reparam:
        return False
    if engine == "auto" and jax.default_backend() != "tpu":
        # Interpret-mode megakernels trace every grid step (10 unrolled
        # bounces each) — pointless off-TPU; tests opt in explicitly with
        # shade_engine="megakernel".
        return False
    if resolved_intersector(scene) != "brute":
        return False
    env = scene.environment_map
    if env.shape[0] * env.shape[1] != 1:
        return False
    return (
        scene.sphere_count <= MAX_SPHERES
        and scene.triangle_count <= MAX_TRIS
        and scene.material_count <= MAX_MATS
    )


@functools.partial(
    jax.jit,
    static_argnames=("rays_per_pixel", "bounces", "interpret"),
)
def shade_trace(
    scene,
    ray_id: jnp.ndarray,  # (R,) int32 — global ray ids (whole-pixel runs)
    rays_per_pixel: int,
    pass_seed,
    bounces: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Trace ``ray_id``'s rays through the whole pass in one kernel →
    collected radiance (R, 3), bit-compatible with the wavefront path's
    accumulation input (pipeline._render_block)."""
    R = ray_id.shape[0]
    cfg = scene.config
    cam = scene.camera
    S = scene.sphere_count
    T = scene.triangle_count
    M = scene.material_count

    pixel = ray_id // rays_per_pixel
    pxx = (pixel % cfg.width).astype(jnp.float32)
    pxy = (pixel // cfg.width).astype(jnp.float32)

    step = ROWS * 128
    pad = (-R) % step
    Rp = R + pad
    if pad:
        pxx = jnp.pad(pxx, (0, pad))
        pxy = jnp.pad(pxy, (0, pad))
        ray_id = jnp.pad(ray_id, (0, pad), constant_values=-1)
    shape2 = (Rp // 128, 128)
    pxx = pxx.reshape(shape2)
    pxy = pxy.reshape(shape2)
    rid = ray_id.reshape(shape2)

    pf = jnp.concatenate([
        cam.position, cam.near_plane_top_left, cam.scaled_right,
        cam.scaled_up,
        jnp.stack([cam.inv_width.astype(jnp.float32),
                   cam.inv_height.astype(jnp.float32)]),
        scene.environment_map.reshape(-1)[:3],
        jnp.zeros((7,), jnp.float32),
    ]).astype(jnp.float32)  # (24,)
    # Seed terms, precomputed in XLA (wavefront.bounce_seeds /
    # camera.initial_ray_seeds constants): [0] = 709579·seed; [1+b] =
    # 279220567·(seed·20 + b). Sized 16 to keep the SMEM shape static for
    # any bounces ≤ 15; deeper bounce counts extend it.
    if bounces > 15:
        raise ValueError(f"megakernel supports <= 15 bounces, got {bounces}")
    seed_u = jnp.uint32(pass_seed)
    pi = jnp.zeros((16,), jnp.uint32)
    pi = pi.at[0].set(jnp.uint32(709579) * seed_u)
    for b in range(bounces):
        pi = pi.at[1 + b].set(
            jnp.uint32(279220567) * (seed_u * jnp.uint32(20) + jnp.uint32(b))
        )

    Sp = max(8, S)
    sph = jnp.zeros((6, Sp), jnp.float32)
    if S:
        sph = sph.at[0:3, :S].set(scene.sphere_center[:S].T)
        sph = sph.at[3, :S].set(scene.sphere_radius[:S])
        sph = sph.at[4, :S].set(
            scene.material_index[:S].astype(jnp.float32)
        )
    Tp = max(8, T)
    tri = jnp.zeros((14, Tp), jnp.float32)
    if T:
        tri = tri.at[0:3, :T].set(scene.tri_p1[:T].T)
        tri = tri.at[3:6, :T].set(scene.tri_e1[:T].T)
        tri = tri.at[6:9, :T].set(scene.tri_e2[:T].T)
        tri = tri.at[9:12, :T].set(scene.tri_normal[:T].T)
        tri = tri.at[12, :T].set(
            scene.material_index[S:S + T].astype(jnp.float32)
        )
    Mp = max(8, M)
    mats = scene.materials
    mat = jnp.zeros((12, Mp), jnp.float32)
    mat = mat.at[0:3, :M].set(mats.diffuse_albedo[:M].T)
    mat = mat.at[3:6, :M].set(mats.specular_albedo[:M].T)
    mat = mat.at[6:9, :M].set(mats.emitted[:M].T)
    mat = mat.at[9, :M].set(mats.metallicity[:M])
    mat = mat.at[10, :M].set(mats.roughness[:M])
    mat = mat.at[11, :M].set(mats.index_of_refraction[:M])

    kernel = functools.partial(
        _shade_kernel, bounces=bounces, S=S, T=T, M=M
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Rp // step,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, ROWS, 128), jnp.float32),
            pltpu.VMEM((3, ROWS, 128), jnp.float32),
            pltpu.VMEM((3, ROWS, 128), jnp.float32),
        ],
    )
    out_shape = jax.ShapeDtypeStruct(shape2, jnp.float32)
    cr, cg, cb = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(pf, pi, sph, tri, mat, pxx, pxy, rid)
    collected = jnp.stack(
        [cr.reshape(Rp), cg.reshape(Rp), cb.reshape(Rp)], axis=1
    )
    return collected[:R]
