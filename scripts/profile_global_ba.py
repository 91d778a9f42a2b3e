#!/usr/bin/env python
"""Global-BA phase cost at pipeline scale (VERDICT r4 weak-1 / item 2).

Builds a synthetic 384x512 keyframe store (F keyframes, random fnet
features, forward-motion poses), then times backend.dense_ba(2) — the
online global BA event — and dense_ba(7)+dense_ba(12) — the final BA pair
(slam.py:131-145) — warm (second run, compile cache primed). The
track.lowmem.gru / track.lowmem.ba TIMER phases split GRU-chunk (alt_corr)
vs full-window DBA cost.

GB_ALT=gather selects the old gather-form alt_corr for A/B.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

F = int(os.environ.get("GB_FRAMES", "25"))
HT = int(os.environ.get("GB_H", "384"))
WD = int(os.environ.get("GB_W", "512"))
BUF = int(os.environ.get("GB_BUF", "64"))


def main():
    from wildgs_slam_tpu.config import load_config
    from wildgs_slam_tpu.models import droid_net
    from wildgs_slam_tpu.ops import lie
    from wildgs_slam_tpu.slam import keyframe_store as kstore
    from wildgs_slam_tpu.slam.backend import Backend
    from wildgs_slam_tpu.slam.state import SlamState
    from wildgs_slam_tpu.utils.profiling import TIMER

    alt = os.environ.get("GB_ALT", "vol_onehot")
    if alt != "vol_onehot":
        from wildgs_slam_tpu.ops import correlation
        orig = correlation.alt_corr

        def patched(*a, **k):
            k["method"] = alt
            return orig(*a, **k)

        correlation.alt_corr = patched
        # rebind inside factor_graph (imported by module object, so the
        # module-attr patch is visible there)

    print(f"[gb] backend={jax.default_backend()} F={F} {HT}x{WD} alt={alt}",
          flush=True)
    cfg = load_config("configs/wildgs_slam.yaml")
    cfg["tracking"]["buffer"] = BUF
    intr = np.array([260.0, 260.0, WD / 2, HT / 2])
    state = SlamState.create(cfg, HT, WD, intr, buffer=BUF,
                             uncertainty_aware=False)
    params = droid_net.init_droid_params(jax.random.PRNGKey(0), HT, WD)

    rng = np.random.RandomState(0)
    h, w = HT // 8, WD // 8
    store = state.store
    for i in range(F):
        xi = np.array([0.06 * i, 0.01 * np.sin(0.4 * i), 0.01 * i,
                       0.0, 0.02 * i, 0.0])
        store = kstore.append(
            store, i, float(i), pose=lie.se3_exp(jnp.asarray(xi)),
            disp=jnp.asarray(0.5 + 0.05 * rng.rand(h, w).astype(np.float32)),
            mono_depth_up=jnp.full((HT, WD), 2.0),
            fmap=jnp.asarray(0.5 * rng.randn(h, w, 128).astype(np.float32)),
            net=jnp.asarray(0.1 * rng.randn(h, w, 128).astype(np.float32)),
            inp=jnp.asarray(0.1 * rng.randn(h, w, 128).astype(np.float32)))
    state.store = store
    state.counter = F

    backend = Backend(state, params, cfg)

    def run(label, fn):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(state.store.poses)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(state.store.poses)
        warm = time.perf_counter() - t0
        print(f"[gb] {label}: cold {cold:.2f} s, warm {warm:.2f} s "
              f"(edges={out[1]})", flush=True)

    run("online dense_ba(2)", lambda: backend.dense_ba(2))
    run("final dense_ba(7)", lambda: backend.dense_ba(7))
    run("final dense_ba(12)", lambda: backend.dense_ba(12))
    print(TIMER.report(), flush=True)


if __name__ == "__main__":
    main()
