"""Shared JAX runtime configuration (persistent compile cache).

On this target the TPU is reached through a tunnel whose XLA compiles are
remotely queued (measured 15s..8min for the SAME program) — and even tiny
eager-op programs (a bucketed gather, a dynamic_slice on a new shape) cost
~0.5-3s each to compile remotely. The stock persistent-cache threshold
(jax_persistent_cache_min_compile_time_secs=1.0) silently excludes exactly
those tiny programs, so every run of the full pipeline re-pays a few of
them per frame, forever: the round-2 pipeline profile measured
~6-9 s/frame of warm-looking cost that was really uncached sub-second
remote compiles. Threshold 0.0 persists everything.

Call `setup_compile_cache()` before any jit dispatch (run.py does; the
bench/profile scripts and conftest.py use the same settings inline).
"""

from __future__ import annotations

import os


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def setup_compile_cache(cache_dir: str | None = None,
                        min_compile_secs: float = 0.0) -> str:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "WILDGS_JAX_CACHE", os.path.join(repo_root(), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir
