"""Persistent XLA compilation cache for long-compile entry points.

Full-resolution render graphs compile in minutes on the TPU toolchain
(1000×1000 pass graphs; see PERF_NOTES.md "Full-res compiles"). JAX ships a
cross-process persistent cache keyed on the HLO + compile options + compiler
version; enabling it makes second-and-later cold runs of the CLI, the golden
checker, and the benchmark scripts skip compilation entirely.

The reference has no analogue (nvcc compiles ahead of time); this recovers
the same "compile once" property for the JIT world. Opt-out with
CUDA_RAYTRACER_TPU_NO_CACHE=1 (e.g. when benchmarking compile time itself).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "cuda_raytracer_tpu", "jax_cache"
)


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache. Returns the dir, or None
    when disabled via CUDA_RAYTRACER_TPU_NO_CACHE. Safe to call repeatedly."""
    if os.environ.get("CUDA_RAYTRACER_TPU_NO_CACHE"):
        return None
    import jax

    path = cache_dir or os.environ.get("CUDA_RAYTRACER_TPU_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything that takes noticeable time; tiny programs aren't worth
    # the disk round-trip.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # The cache object is created lazily on first compile and then pinned;
    # if something already compiled in this process (tests, library use),
    # drop it so the new dir takes effect.
    try:
        from jax._src.compilation_cache import reset_cache

        reset_cache()
    except Exception:
        pass
    return path
