"""Anomaly detection: torch.autograd.set_detect_anomaly for the TPU loop.

The reference debugs NaN blowups with torch's detect-anomaly + CUDA launch
blocking. The JAX equivalents wired here:

  - `enable()` turns on `jax_debug_nans` (XLA re-runs the offending op
    un-jitted and points at it) and arms the phase checks below;
  - `anomaly_check(name, tree, ...)` — called at phase boundaries
    (system.run, mapper segments) — synchronizes and walks every array leaf,
    raising `AnomalyError` with the phase name + leaf path on the first
    non-finite value. Zero cost when disabled (module flag short-circuit).

Enable via config `debug: {detect_anomaly: true}`, `run.py --debug`, or
env WILDGS_DETECT_ANOMALY=1.
"""

from __future__ import annotations

import os

import jax
import numpy as np

_ENABLED = bool(int(os.environ.get("WILDGS_DETECT_ANOMALY", "0")))


class AnomalyError(RuntimeError):
    """A non-finite value crossed a phase boundary."""


def enabled() -> bool:
    return _ENABLED


def enable(debug_nans: bool = True) -> None:
    """Arm anomaly checks (and, by default, jax_debug_nans)."""
    global _ENABLED
    _ENABLED = True
    if debug_nans:
        jax.config.update("jax_debug_nans", True)


def disable() -> None:
    global _ENABLED
    _ENABLED = False
    jax.config.update("jax_debug_nans", False)


def anomaly_check(name: str, *trees) -> None:
    """If armed: sync + assert every float array leaf in `trees` is finite.

    Call at phase boundaries with the phase's outputs; the raised error names
    the phase and the pytree path of the first offending leaf.
    """
    if not _ENABLED:
        return
    for tree in trees:
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in leaves:
            if leaf is None or not hasattr(leaf, "dtype"):
                continue
            if not np.issubdtype(np.asarray(leaf).dtype, np.floating):
                continue
            arr = np.asarray(jax.block_until_ready(leaf))
            if not np.all(np.isfinite(arr)):
                bad = int(arr.size - np.isfinite(arr).sum())
                raise AnomalyError(
                    f"phase '{name}': {bad}/{arr.size} non-finite values at "
                    f"leaf {jax.tree_util.keystr(path)} "
                    f"(shape {arr.shape}, dtype {arr.dtype})")


def maybe_enable_from_cfg(cfg: dict) -> None:
    if cfg.get("debug", {}).get("detect_anomaly", False):
        enable(debug_nans=bool(cfg["debug"].get("debug_nans", True)))
        print("[debug] anomaly detection armed (jax_debug_nans="
              f"{cfg['debug'].get('debug_nans', True)})")
