"""Probe: does bf16 elementwise arithmetic run faster than f32 on the v5e
VPU at the MT sweep's shapes? If ~2x, a conservative bf16 MT pre-pass
(error-bounded accept, f32 re-test of survivors) could halve the
closest-hit's dominant cost. If ~1x, the idea is dead — record and move on.

Method: a Pallas kernel iterating the MT arithmetic chain N times over a
resident (tile, C) block in the given dtype; time per iteration isolates
sustained VPU throughput from launch/DMA overhead.

Usage: python scripts/mt_bf16_micro.py
"""

from __future__ import annotations

import functools
import json
import sys
import time
import warnings

sys.path.insert(0, "/root/repo")
warnings.filterwarnings("ignore")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rays_ref, blk_ref, out_ref, *, iters, dtype):
    raysT = rays_ref[:, :].astype(dtype)  # (tile, 8)
    blk = blk_ref[:, :].astype(dtype)  # (16, C)
    tile = raysT.shape[0]
    C = blk.shape[1]

    def col(c):
        return raysT[:, c:c + 1]

    ox, oy, oz, dx, dy, dz = (col(c) for c in range(6))
    p1x, p1y, p1z = (blk[i:i + 1, :] for i in range(0, 3))
    e1x, e1y, e1z = (blk[i:i + 1, :] for i in range(3, 6))
    e2x, e2y, e2z = (blk[i:i + 1, :] for i in range(6, 9))

    def body(i, acc):
        # the MT chain (division-free accept), ~50 elementwise ops; BOTH
        # operand sides depend on the carry so Mosaic cannot hoist the
        # h/det half of the chain out of the loop.
        eps = acc * jnp.float32(1e-7)
        oxj = ox + eps.astype(dtype)
        e2z = blk[8:9, :].astype(dtype) + eps.astype(dtype)
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        det = hx * e1x + hy * e1y + hz * e1z
        fx = oxj - p1x
        fy = oy - p1y
        fz = oz - p1z
        ud = fx * hx + fy * hy + fz * hz
        qx = fy * e1z - fz * e1y
        qy = fz * e1x - fx * e1z
        qz = fx * e1y - fy * e1x
        vd = dx * qx + dy * qy + dz * qz
        td = e2x * qx + e2y * qy + e2z * qz
        # Mosaic has no bf16 vector compare on v5e (bf16 packs 2/lane);
        # accept logic runs in f32 either way — only the MAC chain above
        # changes dtype.
        det32 = det.astype(jnp.float32)
        ud32 = ud.astype(jnp.float32)
        vd32 = vd.astype(jnp.float32)
        td32 = td.astype(jnp.float32)
        s = jnp.sign(det32)
        ad = jnp.abs(det32)
        us = ud32 * s
        vs = vd32 * s
        ts = td32 * s
        ok = (det32 != 0) & (us >= 0) & (us <= ad) & (vs >= 0) & (us + vs <= ad) & (ts >= 0)
        t = jnp.where(ok, ts, jnp.float32(1e30))
        return acc + jnp.min(t)

    acc = jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    out_ref[0, 0] = acc


@functools.partial(jax.jit, static_argnames=("tile", "C", "iters", "dtype"))
def run(rays, blk, tile, C, iters, dtype):
    return pl.pallas_call(
        functools.partial(_kernel, iters=iters, dtype=dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(rays, blk)


def main() -> int:
    import numpy as np

    rng = np.random.default_rng(0)
    for tile, C in ((64, 256), (128, 1024)):
        rays = jnp.asarray(rng.normal(size=(tile, 8)).astype(np.float32))
        blk = jnp.asarray(rng.normal(size=(16, C)).astype(np.float32))
        rows = {}
        for dtype in (jnp.float32, jnp.bfloat16):
            iters = 2000
            out = run(rays, blk, tile, C, iters, dtype)
            jax.block_until_ready(out)
            start = time.perf_counter()
            for _ in range(5):
                out = run(rays, blk, tile, C, iters, dtype)
            jax.block_until_ready(out)
            us_per_iter = (time.perf_counter() - start) / 5 / iters * 1e6
            rows[str(jnp.dtype(dtype))] = round(us_per_iter, 4)
        ratio = rows["float32"] / max(rows["bfloat16"], 1e-9)
        print(json.dumps({"scan": "mt_bf16", "tile": tile, "C": C,
                          "us_per_mt_pair": rows,
                          "f32_over_bf16": round(ratio, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
