"""Root conftest: force tests onto a virtual 8-device CPU mesh.

The container's sitecustomize registers the TPU backend and imports jax at
interpreter startup, so env vars alone are too late — we override via
jax.config before any backend is initialized. Benchmarks (bench.py) are run
directly and explicitly select the TPU.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import hashlib  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _host_fingerprint():
    """CPU-feature hash: XLA:CPU AOT cache entries are compiled for the
    exact host ISA, and loading entries produced on a different machine
    (the build container migrates between hosts across rounds) is a
    documented SIGILL risk (cpu_aot_loader warns, then pytest died with a
    fatal interpreter error mid-suite). Keying the cache dir on the flags
    line makes stale foreign entries invisible instead of fatal."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "unknown"


# persistent compile cache: big win on the 2-CPU box across test runs
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 f".jax_cache_cpu_{_host_fingerprint()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
