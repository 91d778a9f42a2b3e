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


def save_slam_checkpoint(path: str, slam, loop_state: Dict[str, Any]
                         | None = None) -> None:
    """Serialize a SLAM system (slam/system.py SLAM) for resume.

    `loop_state` is the run-loop bookkeeping (next_frame, prev_kf_idx,
    prev_ba_idx) saved by SLAM.run for mid-stream resume."""
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
    arrays["mapper_key"] = np.asarray(mapper.key)
    arrays["images"] = state.images
    if state.dino_feats is not None:
        arrays["dino_feats"] = state.dino_feats
    arrays["timestamps"] = state.timestamps

    # frontend factor-graph edge state (corr pyramids are rebuilt from
    # store.fmaps on load — they are pure functions of the fmaps)
    g = getattr(slam.frontend, "graph", None)
    if g is not None:
        for name in ("ii", "jj", "age", "ii_bad", "jj_bad", "ii_inac",
                     "jj_inac"):
            arrays[f"graph/{name}"] = np.asarray(getattr(g, name))
        E, I = len(g.ii), len(g.ii_inac)
        for name in ("net", "inp", "target", "weight"):
            arrays[f"graph/{name}"] = _to_numpy(getattr(g, name)[:E])
        for name in ("target_inac", "weight_inac"):
            arrays[f"graph/{name}"] = _to_numpy(getattr(g, name)[:I])
        arrays["graph/damping"] = _to_numpy(g.damping)

    occ = {int(k): np.asarray(v) for k, v in
           mapper.occ_aware_visibility.items()}

    meta = dict(
        counter=state.counter,
        iteration_count=mapper.iteration_count,
        iters_after_densify=mapper.iters_after_densify,
        current_window=mapper.current_window,
        is_kf=mapper.is_kf,
        video_idxs=mapper.video_idxs,
        frame_idxs=mapper.frame_idxs,
        occ_aware_visibility=occ,
        mapper_rng=mapper.rng.get_state(),
        frontend_t1=slam.frontend.t1,
        frontend_initialized=slam.frontend.is_initialized,
        frontend_kf_dropped=getattr(slam.frontend, "num_keyframes_dropped",
                                    0),
        motion_filter_count=getattr(getattr(slam, "motion_filter", None),
                                    "count", 0),
        loop_state=loop_state or {},
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, __meta__=np.frombuffer(
        pickle.dumps(meta), dtype=np.uint8), **arrays)
    os.replace(tmp, path)


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


def load_slam_checkpoint(path: str, slam) -> Dict[str, Any]:
    """Restore state saved by save_slam_checkpoint into a freshly built
    SLAM system (same config). Returns the saved loop_state dict."""
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
    if getattr(mapper, "mesh", None) is not None:
        # mesh mode: the map is gaussian-sharded over the device mesh;
        # checkpoints store gathered host arrays, so re-shard on load
        from ..parallel import mesh as pmesh

        mapper.gaussians = pmesh.shard_gaussian_map(mapper.gaussians,
                                                    mapper.mesh)
    if "mapper_key" in arrays:
        mapper.key = jnp.asarray(arrays["mapper_key"])
    state.images[:] = arrays["images"]
    if state.dino_feats is not None and "dino_feats" in arrays:
        state.dino_feats[:] = arrays["dino_feats"]
    state.timestamps[:] = arrays["timestamps"]
    # device-side mirrors (system.py dino cache) must refresh from the
    # reloaded host arrays
    state.host_gen += 1

    state.counter = meta["counter"]
    mapper.iteration_count = meta["iteration_count"]
    mapper.iters_after_densify = meta["iters_after_densify"]
    mapper.current_window = meta["current_window"]
    mapper.is_kf = meta["is_kf"]
    mapper.video_idxs = meta["video_idxs"]
    mapper.frame_idxs = meta["frame_idxs"]
    mapper.occ_aware_visibility = {
        k: jnp.asarray(v)
        for k, v in meta.get("occ_aware_visibility", {}).items()}
    if "mapper_rng" in meta:
        mapper.rng.set_state(meta["mapper_rng"])
    for v in mapper.video_idxs:
        mapper.cam_w2c_old[v] = mapper.vstore.w2c[v]
        mapper.depth_dict[v] = mapper.vstore.depths[v]

    # frontend factor graph (corr volumes rebuilt from store.fmaps)
    if "graph/ii" in arrays and getattr(slam.frontend, "graph",
                                        None) is not None:
        g = slam.frontend.graph
        for name in ("ii", "jj", "age", "ii_bad", "jj_bad", "ii_inac",
                     "jj_inac"):
            setattr(g, name, arrays[f"graph/{name}"].astype(np.int64))
        g.damping = jnp.asarray(arrays["graph/damping"])
        g.restore_edge_state(
            arrays["graph/net"], arrays["graph/inp"],
            arrays["graph/target"], arrays["graph/weight"],
            arrays["graph/target_inac"], arrays["graph/weight_inac"])

    slam.frontend.t1 = meta["frontend_t1"]
    slam.frontend.is_initialized = meta["frontend_initialized"]
    if hasattr(slam.frontend, "num_keyframes_dropped"):
        slam.frontend.num_keyframes_dropped = meta.get("frontend_kf_dropped",
                                                       0)

    # motion filter last-keyframe features live in the store
    mf = getattr(slam, "motion_filter", None)
    if mf is not None:
        mf.count = meta.get("motion_filter_count", 0)
        if state.counter > 0:
            from ..models import droid_net

            # match the live-path dtype (bf16 on TPU): f32 here would
            # re-trace _fused_step into a permanently slower f32 variant
            dt = droid_net.net_dtype()
            idx = state.counter - 1
            mf.fmap = state.store.fmaps[idx].astype(dt)
            mf.net = state.store.nets[idx].astype(dt)
            mf.inp = state.store.inps[idx].astype(dt)
    return meta.get("loop_state", {})
