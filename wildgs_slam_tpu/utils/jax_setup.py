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

import hashlib
import os
import platform


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def host_fingerprint() -> str:
    """CPU-feature hash keying XLA:CPU AOT cache dirs: entries are compiled
    for the exact host ISA, and the build container migrates between hosts
    across rounds — loading another machine's entries is a documented SIGILL
    risk. x86 exposes a 'flags' line, ARM 'Features'; if neither exists,
    hash the whole cpuinfo. platform.machine() is mixed in so even an empty
    cpuinfo still discriminates across architectures."""
    try:
        with open("/proc/cpuinfo") as f:
            text = f.read()
    except OSError:
        text = ""
    feat = model = ""
    for line in text.splitlines():
        # x86 exposes 'flags' + 'model name', ARM 'Features'. The model line
        # matters too: two hosts with identical ISA flags but different CPU
        # models get different XLA codegen preferences (+prefer-no-gather
        # etc.), and loading the other model's AOT entries still warns of
        # SIGILL risk (observed round 5 after a container migration).
        if not feat and line.startswith(("flags", "Features")):
            feat = line
        if not model and line.startswith("model name"):
            model = line
    blob = platform.machine() + model + (feat or text)
    return hashlib.sha1(blob.encode()).hexdigest()[:10]


def setup_compile_cache(cache_dir: str | None = None,
                        min_compile_secs: float = 0.0) -> str:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "WILDGS_JAX_CACHE", os.path.join(repo_root(), ".jax_cache"))
        # XLA:CPU runs (multichip dryrun, ad-hoc CPU scripts) must not share
        # AOT entries across hosts — same hazard conftest.py guards for the
        # test suite. The TPU-side cache is host-independent (compiles happen
        # on the remote server), so only the cpu platform gets the key.
        try:
            if jax.default_backend() == "cpu":
                cache_dir += f"_cpu_{host_fingerprint()}"
        except Exception:
            pass
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir
