#!/usr/bin/env python
"""Microbench: binning compaction variants on TPU at bench.py shapes.

Round-1 breakdown put binning at ~2.0 ms of the ~3.3 ms rasterize iteration;
the suspect is HBM traffic from the (T, CHUNK, capacity) one-hot
intermediates. Compares 'onehot' vs 'topk' (lax.top_k over rank keys).
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

from wildgs_slam_tpu.ops.rasterizer import binning


def case(H, W, N, CAP, n_it=50):
    """Times n_it data-dependent iterations INSIDE one jitted lax.scan —
    host-loop timings through the remote-TPU tunnel are unreliable (async
    dispatch artifacts measured 0.1ms..112ms for the same program)."""
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    mean2d = jax.random.uniform(k1, (N, 2)) * jnp.array([W * 1.0, H * 1.0])
    radius = (1.0 + 11.0 * jax.random.uniform(k2, (N,))).astype(jnp.int32)
    depth = 1.0 + jax.random.uniform(k3, (N,))
    valid = jax.random.uniform(jax.random.PRNGKey(1), (N,)) > 0.1

    print(f"--- {H}x{W}, N={N}, capacity={CAP} ---", flush=True)
    for method in ("onehot", "onehot2:32", "onehot2:64", "onehot2:128",
                   "topk", "sort", "sort_norev", "sort@3", "sort@2"):
        base_method = method.split("_")[0].split(":")[0].split("@")[0]
        seg_cap = int(method.split(":")[1]) if ":" in method else 64
        kw = int(method.split("@")[1]) if "@" in method else 4

        @jax.jit
        def loop(mean2d, depth):
            def body(carry, _):
                m2d, dep = carry
                bins = binning.bin_gaussians(
                    m2d, radius, dep, valid, (H, W), capacity=CAP,
                    method=base_method, seg_cap=seg_cap, kw=kw,
                    with_rev=not method.endswith("norev"))
                # data dependence: outputs perturb the next inputs. MUST
                # consume ids — a carry that only reads counts/overflow lets
                # XLA DCE the whole compaction (CLAUDE.md measurement trap).
                bump = ((bins.counts.sum() + bins.ids.sum())
                        .astype(jnp.float32) % 7) * 1e-7
                return (m2d + bump, dep + bump), bins.overflow

            (m2d, dep), ovf = jax.lax.scan(body, (mean2d, depth),
                                           None, length=n_it)
            return m2d.sum() + dep.sum(), ovf[-1]

        try:
            out = loop(mean2d, depth)
            jax.block_until_ready(out)
        except Exception as e:
            print(f"{method}: FAILED ({str(e)[:120]})")
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(mean2d, depth)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{method}: {best / n_it * 1e3:.3f} ms/call  "
              f"(overflow {int(out[1])})", flush=True)


def main():
    case(240, 320, 5120, 256)            # bench.py scale
    case(384, 512, 131072, 512, n_it=5)  # realistic TUM mapping scale


if __name__ == "__main__":
    main()
