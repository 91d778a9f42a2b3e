#!/usr/bin/env python
"""Measure the remote-TPU tunnel's dispatch/sync/transfer costs.

The full-pipeline profile shows warm per-frame costs (motion_filter ~6s,
frontend ~9s) that are orders of magnitude above the device FLOP time of
the jitted programs involved. This isolates the host<->device plumbing:

  1. blocking sync RTT          (jit dispatch + block_until_ready)
  2. pipelined dispatch cost    (K async dispatches, one final sync)
  3. host->device transfer      (device_put of 4B / 1MB / 64MB)
  4. device->host transfer      (np.asarray of 4B / 1MB / 64MB)
  5. python-scalar sync         (float(arr))

Usage: python scripts/microbench_tunnel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import jax.numpy as jnp
import numpy as np


def timeit(fn, n=20, warmup=3):
    for _ in range(warmup):
        fn()
    best, tot = float("inf"), 0.0
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        tot += dt
    return best * 1e3, tot / n * 1e3


def main():
    print(f"backend={jax.default_backend()}", flush=True)

    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros(())
    jax.block_until_ready(tiny(x))

    b, m = timeit(lambda: jax.block_until_ready(tiny(x)))
    print(f"1. sync RTT (jit tiny + block):      best {b:7.2f} ms  mean {m:7.2f} ms")

    def pipelined():
        y = x
        for _ in range(50):
            y = tiny(y)
        jax.block_until_ready(y)

    b, m = timeit(pipelined, n=10)
    print(f"2. 50 pipelined dispatches + sync:   best {b:7.2f} ms  mean {m:7.2f} ms"
          f"  ({m / 50:.2f} ms/dispatch)")

    for sz, name in ((1, "4B"), (1 << 18, "1MB"), (1 << 24, "64MB")):
        h = np.zeros(sz, np.float32)
        b, m = timeit(lambda: jax.block_until_ready(jax.device_put(h)), n=8)
        print(f"3. device_put {name:5s}:                best {b:7.2f} ms  mean {m:7.2f} ms")

    for sz, name in ((1, "4B"), (1 << 18, "1MB"), (1 << 24, "64MB")):
        d = jax.block_until_ready(jnp.zeros(sz, jnp.float32))
        b, m = timeit(lambda: np.asarray(d), n=8)
        print(f"4. np.asarray {name:5s}:                best {b:7.2f} ms  mean {m:7.2f} ms")

    s = jax.block_until_ready(jnp.float32(1.0))
    b, m = timeit(lambda: float(tiny(s)))
    print(f"5. float(jit(x)) scalar sync:        best {b:7.2f} ms  mean {m:7.2f} ms")

    # 6. an eager op chain like the host glue between jit calls
    a = jax.block_until_ready(jnp.arange(1024.0))

    def eager_chain():
        y = a * 2.0
        y = y + 1.0
        y = jnp.where(y > 3, y, 0.0)
        return float(y.sum())

    b, m = timeit(eager_chain)
    print(f"6. 4-op eager chain + scalar sync:   best {b:7.2f} ms  mean {m:7.2f} ms")


if __name__ == "__main__":
    main()
