"""Worker process for the 2-process jax.distributed smoke test.

Launched by tests/test_parallel.py::test_two_process_distributed_train_step
with a fresh environment (JAX_PLATFORMS=cpu, 4 virtual local devices), so the
two workers form a 2-process x 4-device = 8-device "pod" whose mesh spans a
process (DCN-analogue) boundary. Exercises parallel/mesh.initialize_distributed
— the multi-host bring-up path no single-process test can reach (SURVEY §5.8).

Each worker runs ONE sharded inverse-rendering train step on a tiny cornell
scene and prints the (replicated) loss; the parent asserts both workers exit
cleanly and agree on the loss, and that it matches the single-process value.

Inputs crossing into the jitted step are plain numpy (host-local committed
arrays are per-process and would be rejected by a global-mesh jit; numpy
values are taken as the identical-everywhere global value and sharded by jit).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--coordinator", required=True)
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--process-id", type=int, required=True)
    args = parser.parse_args()

    import jax

    # The container's sitecustomize pins JAX to the remote-TPU "axon"
    # backend; JAX_PLATFORMS in the env is not enough (see
    # .claude/skills/verify). Force real CPU before any backend init.
    jax.config.update("jax_platforms", "cpu")

    from cuda_raytracer_tpu.parallel import mesh as mesh_mod

    mesh_mod.initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import numpy as np
    import optax

    from cuda_raytracer_tpu.models.scene_dsl import load_scene
    from cuda_raytracer_tpu.parallel import shard
    from cuda_raytracer_tpu.render import diff

    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert n_global == args.num_processes * n_local, (n_global, n_local)

    scene = load_scene(
        "/root/reference/cornell.scene",
        config_overrides=dict(width=8, height=8, rays_per_pixel=2, bounces=2),
        prefer_native_bvh=False,
    )
    mesh = mesh_mod.make_mesh()  # spans both processes
    params, _ = diff.split_params(scene)
    params = jax.tree_util.tree_map(np.asarray, params)
    optimizer = optax.sgd(1e-3)
    opt_state = jax.tree_util.tree_map(np.asarray, optimizer.init(params))
    target = np.zeros((scene.num_pixels, 3), np.float32)

    step = shard.make_sharded_train_step(
        scene, mesh, optimizer, rays_per_pixel=2, bounces=2
    )
    new_params, _opt_state, loss = step(params, opt_state, target, np.uint32(0))
    loss = float(loss)
    assert np.isfinite(loss) and loss > 0.0, loss
    # Params must have moved (the psum'd gradient reached every process).
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(new_params),
        )
    )
    assert moved, "train step left parameters unchanged"
    print(f"DISTRIBUTED_LOSS {loss:.9g}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
