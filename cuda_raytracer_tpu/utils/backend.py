"""Backend selection helpers for the axon-tunneled container.

The container's sitecustomize registers the remote-TPU ("axon") PJRT plugin
and pins ``jax_platforms`` at interpreter startup, so ``JAX_PLATFORMS=cpu``
in the environment is NOT enough to avoid it: any backend query (even
``jnp.asarray``) initialises the axon client, which blocks while the one
tunneled chip is down or claimed by another process. Every CPU-only driver
(tests, sims, dry runs, examples) must repoint jax BEFORE its first backend
query — and must set ``--xla_force_host_platform_device_count`` BEFORE any
backend initialisation, because XLA parses XLA_FLAGS once at client
creation. This is the single audited home for that dance.
"""

from __future__ import annotations

import os


def force_cpu(n_devices: int | None = None) -> None:
    """Repoint jax at the host CPU backend (optionally as ``n_devices``
    virtual devices for sharding tests). Safe to call more than once; must
    be called before the first jax backend query to have any effect."""
    if n_devices is not None:
        flag = f"--xla_force_host_platform_device_count={n_devices}"
        if flag not in os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " " + flag

    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.extend.backend import clear_backends

    clear_backends()
