"""Mid-run checkpoint / resume.

The reference has NO resume capability (SURVEY.md §5: its 'checkpoints' are
input weights and final outputs only). Here the whole SLAM state —
KeyframeStore, host images/features/timestamps, GaussianMap + Adam,
uncertainty-MLP params + optimizer, viewpoint store, mapper counters and
window — serializes to one compressed npz, so a run can be stopped and
resumed mid-sequence.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif hasattr(tree, "_asdict"):
        items = tree._asdict().items()
    else:
        out[prefix.rstrip("/")] = _to_numpy(tree)
        return out
    for k, v in items:
        out.update(_flatten(v, f"{prefix}{k}/"))
    return out


def _to_numpy(x):
    x = np.asarray(x)
    if x.dtype.kind == "V" or str(x.dtype) == "bfloat16":
        x = np.asarray(jnp.asarray(x).astype(jnp.float32))
    return x


def save_slam_checkpoint(path: str, slam) -> None:
    """Serialize a SLAM system (slam/system.py SLAM) for resume."""
    state = slam.state
    mapper = slam.mapper
    arrays: Dict[str, np.ndarray] = {}
    arrays.update(_flatten(state.store, "store/"))
    arrays.update(_flatten(mapper.gaussians, "gaussians/"))
    arrays.update(_flatten(mapper.vstore, "vstore/"))
    arrays.update(_flatten(jax.tree.map(np.asarray, mapper.uncer_params),
                           "uncer_params/"))
    arrays.update(_flatten(jax.tree.map(np.asarray, mapper.uncer_mu),
                           "uncer_mu/"))
    arrays.update(_flatten(jax.tree.map(np.asarray, mapper.uncer_nu),
                           "uncer_nu/"))
    arrays["uncer_count"] = np.asarray(mapper.uncer_count)
    arrays["images"] = state.images
    if state.dino_feats is not None:
        arrays["dino_feats"] = state.dino_feats
    arrays["timestamps"] = state.timestamps

    meta = dict(
        counter=state.counter,
        iteration_count=mapper.iteration_count,
        iters_after_densify=mapper.iters_after_densify,
        current_window=mapper.current_window,
        is_kf=mapper.is_kf,
        video_idxs=mapper.video_idxs,
        frame_idxs=mapper.frame_idxs,
        frontend_t1=slam.frontend.t1,
        frontend_initialized=slam.frontend.is_initialized,
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, __meta__=np.frombuffer(
        pickle.dumps(meta), dtype=np.uint8), **arrays)


def _unflatten(arrays: Dict[str, np.ndarray], template, prefix=""):
    if isinstance(template, dict):
        return {k: _unflatten(arrays, v, f"{prefix}{k}/")
                for k, v in template.items()}
    if hasattr(template, "_asdict"):
        vals = {k: _unflatten(arrays, v, f"{prefix}{k}/")
                for k, v in template._asdict().items()}
        return type(template)(**vals)
    out = jnp.asarray(arrays[prefix.rstrip("/")])
    if hasattr(template, "dtype") and out.dtype != template.dtype:
        out = out.astype(template.dtype)
    return out


def load_slam_checkpoint(path: str, slam) -> None:
    """Restore state saved by save_slam_checkpoint into a freshly built
    SLAM system (same config)."""
    data = np.load(path, allow_pickle=False)
    arrays = {k: data[k] for k in data.files}
    meta = pickle.loads(arrays.pop("__meta__").tobytes())

    state = slam.state
    mapper = slam.mapper
    state.store = _unflatten(arrays, state.store, "store/")
    mapper.gaussians = _unflatten(arrays, mapper.gaussians, "gaussians/")
    mapper.vstore = _unflatten(arrays, mapper.vstore, "vstore/")
    mapper.uncer_params = _unflatten(arrays, mapper.uncer_params,
                                     "uncer_params/")
    mapper.uncer_mu = _unflatten(arrays, mapper.uncer_mu, "uncer_mu/")
    mapper.uncer_nu = _unflatten(arrays, mapper.uncer_nu, "uncer_nu/")
    mapper.uncer_count = jnp.asarray(arrays["uncer_count"])
    state.images[:] = arrays["images"]
    if state.dino_feats is not None and "dino_feats" in arrays:
        state.dino_feats[:] = arrays["dino_feats"]
    state.timestamps[:] = arrays["timestamps"]

    state.counter = meta["counter"]
    mapper.iteration_count = meta["iteration_count"]
    mapper.iters_after_densify = meta["iters_after_densify"]
    mapper.current_window = meta["current_window"]
    mapper.is_kf = meta["is_kf"]
    mapper.video_idxs = meta["video_idxs"]
    mapper.frame_idxs = meta["frame_idxs"]
    for v in mapper.video_idxs:
        mapper.cam_w2c_old[v] = mapper.vstore.w2c[v]
        mapper.depth_dict[v] = mapper.vstore.depths[v]
    slam.frontend.t1 = meta["frontend_t1"]
    slam.frontend.is_initialized = meta["frontend_initialized"]
