"""Test harness setup: force a real 8-device CPU backend.

The container's sitecustomize registers the remote-TPU ("axon") PJRT plugin
and pins ``jax_platforms="axon,cpu"`` at interpreter startup, so plain env
vars are not enough — we re-point the config at CPU and clear any initialized
backends before any test touches JAX. Multi-chip sharding tests then run on
an 8-device virtual CPU mesh.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:  # pragma: no cover
    pass

assert jax.default_backend() == "cpu", jax.default_backend()
