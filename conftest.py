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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wildgs_slam_tpu.utils.jax_setup import host_fingerprint  # noqa: E402

# persistent compile cache: big win on the 2-CPU box across test runs.
# Keyed by host ISA — XLA:CPU AOT entries from a different machine are a
# SIGILL risk (cpu_aot_loader warns, then pytest died mid-suite once);
# keying the dir makes stale foreign entries invisible instead of fatal.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 f".jax_cache_cpu_{host_fingerprint()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
