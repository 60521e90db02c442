"""Command-line driver (reference: main, raytracing.cu:305-398).

Usage mirrors the reference::

    python -m cuda_raytracer_tpu <scene.scene> [no_sort] [cpu] [no_gpu] [no_bvh]

with the same order-insensitive positional flags and exit codes (usage → 1,
no backend → 2), mapped to TPU reality: the accelerator render runs on the
default JAX backend (TPU) and ``cpu`` runs the same pipeline on the CPU
backend — the dual-backend cross-check the reference used for validation.
GNU-style extras expose framework features the reference configured by
editing the scene file (resolution/spp override, checkpointing, bloom toggle,
output path, multi-device mesh).

Divergence from quirk Q6: when both backends render, the reference stacks
both images in one PNG; we write ``<out>`` and ``<out>.cpu.png`` separately.

Divergence from quirk Q9 (deliberate): the reference applies bloom only on
its GPU branch (raytracing.cu:356-392 — the CPU image is written raw), an
artifact of where the post kernels live, not a design choice. Here both
backends share one post chain, so ``cpu`` renders get bloom too; pass
``--no-bloom`` for the reference's raw-CPU behaviour.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="cuda_raytracer_tpu",
        description="TPU-native differentiable Monte-Carlo path tracer",
    )
    parser.add_argument("scene", help="scene description file (.scene DSL)")
    parser.add_argument(
        "flags",
        nargs="*",
        help="reference-compatible flags: no_sort cpu no_gpu no_bvh",
    )
    parser.add_argument("--out", default="raytracing.png", help="output PNG path")
    parser.add_argument("--width", type=int, help="override image width")
    parser.add_argument("--height", type=int, help="override image height")
    parser.add_argument("--spp", type=int, help="override rays per pixel")
    parser.add_argument("--bounces", type=int, help="override bounce limit")
    parser.add_argument("--no-bloom", action="store_true", help="skip bloom post-pass")
    parser.add_argument(
        "--checkpoint", help="checkpoint file for resumable accumulation"
    )
    parser.add_argument(
        "--checkpoint-every", type=int, default=1, help="passes between checkpoints"
    )
    parser.add_argument(
        "--mesh",
        type=int,
        default=0,
        help="shard rays over N devices (0 = single-device render)",
    )
    parser.add_argument(
        "--metrics", action="store_true", help="emit a JSON metrics line to stderr"
    )
    parser.add_argument(
        "--packet-skip",
        action="store_true",
        help="enable the fused kernel's per-ray slab-entry early-out "
        "(exact; see ops/pallas/fused.SKIP_SLACK)",
    )
    parser.add_argument(
        "--packet-tile",
        type=int,
        help="rays per packet tile in the cluster intersector (default 64)",
    )
    parser.add_argument(
        "--cluster-tris",
        type=int,
        help="triangles per cluster block (multiple of 128; default 256)",
    )
    parser.add_argument(
        "--cull-split",
        type=int,
        help="tight sub-AABBs per cluster block in the cull "
        "(must divide cluster-tris; default 1)",
    )
    parser.add_argument(
        "--cull-hier",
        type=int,
        help="hierarchical cull: clusters per super-AABB gating 128-box "
        "chunks of the main cull (cull-hier * cull-split must divide 128; "
        "0 = flat cull, the default)",
    )
    return parser


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(f"Usage: cuda_raytracer_tpu <scene>", file=sys.stderr)
        return 1
    args = build_parser().parse_args(argv)

    from cuda_raytracer_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    unknown = set(args.flags) - {"no_sort", "cpu", "no_gpu", "no_bvh"}
    if unknown:
        print(f"Unknown flags: {sorted(unknown)}", file=sys.stderr)
        return 1
    sort_rays = "no_sort" not in args.flags
    run_cpu = "cpu" in args.flags
    run_accel = "no_gpu" not in args.flags
    use_bvh = "no_bvh" not in args.flags

    if not run_cpu and not run_accel:
        print("No raytracing hardware specified", file=sys.stderr)
        return 2

    from cuda_raytracer_tpu.models.scene_dsl import load_scene
    from cuda_raytracer_tpu.render import pipeline
    from cuda_raytracer_tpu.utils.metrics import Metrics
    from cuda_raytracer_tpu.utils.png import write_png

    metrics = Metrics()
    overrides = dict(sort_rays=sort_rays)
    if args.packet_skip:
        overrides["packet_skip"] = True
    if args.packet_tile is not None:
        overrides["packet_tile"] = args.packet_tile
    if args.cull_split is not None:
        overrides["cull_split"] = args.cull_split
    if args.cull_hier is not None:
        overrides["cull_hier"] = args.cull_hier
    for key, value in (
        ("width", args.width),
        ("height", args.height),
        ("rays_per_pixel", args.spp),
        ("bounces", args.bounces),
    ):
        if value is not None:
            overrides[key] = value

    from cuda_raytracer_tpu.models import cluster as cluster_mod

    with metrics.phase("load_scene"):
        scene = load_scene(
            args.scene, use_bvh=use_bvh, config_overrides=overrides,
            cluster_tris=args.cluster_tris or cluster_mod.DEFAULT_CLUSTER_TRIS,
        )
    print(
        f"Scene: {scene.sphere_count} spheres, {scene.triangle_count} triangles, "
        f"{scene.bvh_node_count} BVH nodes",
        file=sys.stderr,
    )

    def run_backend(label: str) -> int:
        with metrics.phase(f"render_{label}"):
            framebuffer = pipeline.render_framebuffer(
                scene,
                checkpoint_path=args.checkpoint,
                checkpoint_every=args.checkpoint_every,
                metrics=metrics,
            )
            framebuffer.block_until_ready()
        with metrics.phase(f"post_{label}"):
            image = pipeline.render_image(
                scene, apply_bloom=not args.no_bloom, framebuffer=framebuffer
            )
        rate = metrics.throughput(
            f"paths_per_s_{label}",
            scene.num_pixels * scene.config.rays_per_pixel,
            f"render_{label}",
        )
        print(
            f"{label} took {metrics.phases[f'render_{label}']:.2f}s"
            + (f" ({rate:.3e} paths/s)" if rate else ""),
            file=sys.stderr,
        )
        return image

    if args.mesh:
        from cuda_raytracer_tpu.parallel.mesh import make_mesh
        from cuda_raytracer_tpu.parallel.shard import render_framebuffer_sharded
        import jax

        mesh = make_mesh(jax.devices()[: args.mesh])
        with metrics.phase("render_sharded"):
            framebuffer = render_framebuffer_sharded(scene, mesh)
            framebuffer.block_until_ready()
        image = pipeline.render_image(
            scene, apply_bloom=not args.no_bloom, framebuffer=framebuffer
        )
        write_png(args.out, image)
    else:
        if run_accel:
            image = run_backend("accelerator")
            write_png(args.out, image)
        if run_cpu:
            import jax

            # The reference's CPU oracle run: same pipeline on the CPU backend.
            cpu = jax.devices("cpu")
            with jax.default_device(cpu[0]):
                image = run_backend("cpu")
            out = args.out if not run_accel else args.out + ".cpu.png"
            write_png(out, image)

    if args.metrics:
        metrics.emit(stream=sys.stderr, scene=args.scene)
    print(f"Wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
