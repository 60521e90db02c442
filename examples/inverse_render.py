"""Inverse rendering demo: recover a wall colour from a target image.

The capability the reference lacks entirely (it is a forward renderer only;
BASELINE.json north star): because the whole wavefront pipeline is
differentiable, a scalar loss on rendered radiance yields gradients for every
material channel, and plain optax gradient descent recovers scene parameters
from pixels.

This script renders the Cornell box as the *target*, greys out the red and
green walls, then optimises the grey scene's diffuse albedos until the render
matches the target — watching the walls turn red and green again.

Runs in ~2 min on CPU at the default 64x64 / 8 spp (every op is the same
jitted TPU code path, just smaller):

    python examples/inverse_render.py [--size 64] [--spp 8] [--steps 60]
            [--out /tmp/inverse]

Writes target.png / initial.png / recovered.png to --out and prints the loss
curve plus the true-vs-recovered wall albedos.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--spp", type=int, default=8)
    parser.add_argument("--steps", type=int, default=60)
    parser.add_argument("--bounces", type=int, default=4)
    parser.add_argument("--out", default="/tmp/inverse")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = parser.parse_args()

    if args.cpu:
        from cuda_raytracer_tpu.utils.backend import force_cpu

        force_cpu()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from cuda_raytracer_tpu import load_scene
    from cuda_raytracer_tpu.ops.tonemap import to_bytes, tonemap
    from cuda_raytracer_tpu.render import diff
    from cuda_raytracer_tpu.utils.png import write_png

    scene = load_scene(
        "/root/reference/cornell.scene",
        config_overrides=dict(
            width=args.size, height=args.size,
            rays_per_pixel=args.spp, bounces=args.bounces,
        ),
    )
    true_params, _ = diff.split_params(scene)

    def radiance(params, seed):
        return diff.render_radiance(
            params, scene, jnp.uint32(seed), args.spp, args.bounces
        )

    # The target is rendered with the SAME seed the optimiser uses, so the
    # true parameters are an exact zero-loss optimum even at low spp (the
    # fixed-noise-realisation trick: with per-step random seeds, the MSE's
    # variance term grows with albedo^2 and biases the recovery dark).
    target = radiance(true_params, 0)

    # Grey out every coloured diffuse surface; the optimiser must rediscover
    # the red and green walls (and leave the whites alone) from pixels.
    grey = jnp.full_like(true_params.materials.diffuse_albedo, 0.5)
    # Keep emitters' albedo untouched so the light itself is not a variable.
    is_emitter = (true_params.materials.emitted.max(axis=1) > 0)[:, None]
    init_albedo = jnp.where(is_emitter, true_params.materials.diffuse_albedo, grey)
    params = true_params._replace(
        materials=dataclasses.replace(
            true_params.materials, diffuse_albedo=init_albedo
        )
    )

    os.makedirs(args.out, exist_ok=True)

    def to_png(rad, name):
        # render_radiance is already per-ray mean, so rays_per_pixel=1 here.
        disp = tonemap(
            jnp.asarray(rad).reshape(args.size, args.size, 3),
            scene.config.exposure, 1,
        )
        write_png(os.path.join(args.out, name), np.asarray(to_bytes(disp)))

    to_png(target, "target.png")
    to_png(radiance(params, 0), "initial.png")

    optimizer = optax.adam(5e-2)
    step = diff.make_train_step(
        scene, optimizer, rays_per_pixel=args.spp, bounces=args.bounces
    )
    opt_state = optimizer.init(params)

    @jax.jit
    def project(p):
        """Keep albedos physical ([0, 1]) between steps."""
        return p._replace(
            materials=dataclasses.replace(
                p.materials,
                diffuse_albedo=jnp.clip(p.materials.diffuse_albedo, 0.0, 1.0),
            )
        )

    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, target, jnp.uint32(0))
        params = project(params)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.6f}")

    to_png(radiance(params, 0), "recovered.png")

    true_alb = np.asarray(true_params.materials.diffuse_albedo)
    got_alb = np.clip(np.asarray(params.materials.diffuse_albedo), 0.0, 1.0)
    # Report the strongly coloured materials (the walls).
    sat = true_alb.max(axis=1) - true_alb.min(axis=1)
    print("\nmaterial  true albedo          recovered")
    for m in np.argsort(-sat)[:3]:
        print(
            f"{m:8d}  {np.array2string(true_alb[m], precision=2)}"
            f"  {np.array2string(got_alb[m], precision=2)}"
        )
    err = float(np.abs(true_alb[sat > 0.2] - got_alb[sat > 0.2]).mean())
    print(f"\nmean |error| on coloured walls: {err:.3f}")
    print(f"images in {args.out}/ (target / initial / recovered)")
    return 0 if err < 0.15 else 1


if __name__ == "__main__":
    raise SystemExit(main())
