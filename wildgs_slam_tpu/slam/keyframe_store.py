"""KeyframeStore: the functional replacement for DepthVideo.

The reference's DepthVideo (src/depth_video.py) is a bag of shared-memory
CUDA tensors mutated under a lock by two processes. Here it is an immutable
pytree of fixed-capacity device arrays owned by a single-controller host
loop — no locks, no shared memory, no pipes; the tracker/mapper alternation
orders all access. Capacity = cfg buffer (350 by default,
wildgs_slam.yaml:84).

Large per-keyframe payloads the mapper reads only on the host (full-res
images, DINO features) stay host-side in the SLAM system object, exactly as
the reference keeps them on CPU (depth_video.py:40,78).

Geometry helpers (reproject / distance / ba / upsample / depth filtering /
uncertainty weighting) wrap the pure ops in ops/{projective,dba}.py and
models/droid_net.py.
"""

from __future__ import annotations

from typing import NamedTuple

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import droid_net
from ..ops import dba, lie, projective


class KeyframeStore(NamedTuple):
    """Device state. h, w are 1/8 resolution; H, W full resolution."""

    timestamp: jax.Array        # (B,)
    poses: jax.Array            # (B, 7) world->camera SE3
    disps: jax.Array            # (B, h, w) inverse depths (init 1.0)
    disps_up: jax.Array         # (B, H, W)
    mono_disps: jax.Array       # (B, h, w) metric-prior inverse depths
    mono_disps_up: jax.Array    # (B, H, W)
    mono_mask_up: jax.Array     # (B, H, W) bool: mono depth consistent
    valid_depth_mask: jax.Array       # (B, H, W) bool (multiview filter)
    valid_depth_mask_small: jax.Array  # (B, h, w) bool
    depth_scale: jax.Array      # (B,)
    depth_shift: jax.Array      # (B,)
    intrinsics: jax.Array       # (4,) at 1/8 resolution (fx fy cx cy)
    fmaps: jax.Array            # (B, h, w, 128) matching features
    nets: jax.Array             # (B, h, w, 128) GRU hidden states
    inps: jax.Array             # (B, h, w, 128) context features
    uncertainties_inv: jax.Array  # (B, h, w) BA weights in [0, 1] (init 1)
    dirty: jax.Array            # (B,) bool: valid_depth_mask stale


def create(buffer: int, ht: int, wd: int, intrinsics_full,
           down_scale: int = 8) -> KeyframeStore:
    h, w = ht // down_scale, wd // down_scale
    intr = jnp.asarray(intrinsics_full, jnp.float32) / down_scale
    z = lambda *s: jnp.zeros(s, jnp.float32)
    return KeyframeStore(
        timestamp=z(buffer),
        poses=jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1.0]), (buffer, 1)),
        disps=jnp.ones((buffer, h, w)),
        disps_up=z(buffer, ht, wd),
        mono_disps=z(buffer, h, w),
        mono_disps_up=z(buffer, ht, wd),
        mono_mask_up=jnp.ones((buffer, ht, wd), bool),
        valid_depth_mask=jnp.zeros((buffer, ht, wd), bool),
        valid_depth_mask_small=jnp.zeros((buffer, h, w), bool),
        depth_scale=z(buffer),
        depth_shift=z(buffer),
        intrinsics=intr,
        fmaps=z(buffer, h, w, 128),
        nets=z(buffer, h, w, 128),
        inps=z(buffer, h, w, 128),
        uncertainties_inv=jnp.ones((buffer, h, w)),
        dirty=jnp.zeros(buffer, bool),
    )


def slice_hw(ht: int, wd: int, down_scale: int = 8):
    """The pixel-center subsampling slices used to take full-res maps to 1/8
    resolution (depth_video.py:35-36)."""
    s = down_scale
    sh = slice(s // 2 - 1, ht // s * s + 1, s)
    sw = slice(s // 2 - 1, wd // s * s + 1, s)
    return sh, sw


@partial(jax.jit, static_argnames=("down_scale",))
def append(store: KeyframeStore, index, timestamp, pose=None, disp=None,
           mono_depth_up=None, fmap=None, net=None, inp=None,
           down_scale: int = 8) -> KeyframeStore:
    """Write keyframe `index` (DepthVideo.__item_setter, depth_video.py:88-133).
    mono_depth_up is a full-resolution metric DEPTH map (inverted here).

    Jitted (None args select the trace): the eager version cost ~12 remote
    dispatches of full-buffer copies per frame through the TPU tunnel."""
    upd = {"timestamp": store.timestamp.at[index].set(timestamp)}
    if pose is not None:
        upd["poses"] = store.poses.at[index].set(pose)
    if disp is not None:
        upd["disps"] = store.disps.at[index].set(disp)
    if mono_depth_up is not None:
        ht, wd = store.mono_disps_up.shape[-2:]
        sh, sw = slice_hw(ht, wd, down_scale)
        small = mono_depth_up[sh, sw]
        upd["mono_disps"] = store.mono_disps.at[index].set(
            jnp.where(small > 0, 1.0 / jnp.where(small > 0, small, 1.0), 0.0))
        upd["mono_disps_up"] = store.mono_disps_up.at[index].set(
            jnp.where(mono_depth_up > 0,
                      1.0 / jnp.where(mono_depth_up > 0, mono_depth_up, 1.0),
                      0.0))
    if fmap is not None:
        upd["fmaps"] = store.fmaps.at[index].set(fmap)
    if net is not None:
        upd["nets"] = store.nets.at[index].set(net)
    if inp is not None:
        upd["inps"] = store.inps.at[index].set(inp)
    return store._replace(**upd)


def remove_keyframe(store: KeyframeStore, ix: int) -> KeyframeStore:
    """Shift all buffers down over slot ix (factor_graph.rm_keyframe,
    factor_graph.py:173-199)."""

    def shift(a):
        rolled = jnp.roll(a, -1, axis=0)
        idx = jnp.arange(a.shape[0])
        sel = (idx >= ix).reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(sel, rolled, a)

    return KeyframeStore(*[
        shift(a) if a.ndim >= 1 and a.shape[0] == store.poses.shape[0] else a
        for a in store
    ])


@jax.jit
def reproject(store: KeyframeStore, ii, jj):
    """(depth_video.py:195-203)."""
    return projective.projective_transform(
        store.poses, store.disps, store.intrinsics, ii, jj)


@partial(jax.jit, static_argnames=("bidirectional",))
def distance(store: KeyframeStore, n_frames, ii, jj, beta=0.3,
             bidirectional=True):
    poses = store.poses
    if bidirectional:
        return dba.frame_distance_bidirectional(
            poses, store.disps, store.intrinsics, ii, jj, beta)
    return dba.frame_distance(poses, store.disps, store.intrinsics, ii, jj,
                              beta)


def ba(store: KeyframeStore, target, weight, eta, ii, jj, edge_valid, groups,
       t0, t1, iters=2, lm=1e-4, ep=0.1, motion_only=False,
       metric_depth_reg=True, uncertainty_aware=True, alpha=0.05,
       pmax=None) -> KeyframeStore:
    """Uncertainty-weighted DBA over the store (depth_video.ba,
    depth_video.py:351-373)."""
    if uncertainty_aware:
        weight = weight * store.uncertainties_inv[ii][..., None]

    h, w = store.disps.shape[-2:]
    ht, wd = store.mono_disps_up.shape[-2:]
    if metric_depth_reg:
        sh, sw = slice_hw(ht, wd)
        sensor = store.mono_disps
        sensor_valid = store.mono_mask_up[:, sh, sw]
    else:
        sensor = None
        sensor_valid = None

    poses, disps = dba.ba(
        store.poses, store.disps, store.intrinsics, target, weight, eta,
        ii, jj, edge_valid, groups, t0, t1, iters=iters,
        cfg=dba.BAConfig(lm=lm, ep=ep, alpha=alpha),
        sensor_disps=sensor, sensor_valid=sensor_valid,
        motion_only=motion_only, pmax=pmax)
    return store._replace(poses=poses, disps=disps)


def upsample(store: KeyframeStore, ix, upmask) -> KeyframeStore:
    """Convex-upsample disps for frames ix (depth_video.py:179-183).
    upmask: (len(ix), h, w, 576)."""
    up = droid_net.upsample_disp(store.disps[ix], upmask)
    return store._replace(disps_up=store.disps_up.at[ix].set(up))


def update_valid_depth_mask(store: KeyframeStore, n_frames: int,
                            multiview_thresh: float, visible_num: int,
                            up=True, frames=None) -> KeyframeStore:
    """Two-view consistency depth filter (depth_video.py:407-442).

    Runs EVERY frame, so the frame count is bucketed (8-frame steps) and the
    heavy body is one jitted program per bucket: the round-2 profile showed
    the original eager body recompiling ~50 tiny remote XLA programs per
    frame (idx = arange(n_frames) gave every op a new shape each keyframe),
    which dominated the whole tracking loop over the tunnel.

    `frames`: optional explicit host list of frame indices to refresh —
    the reference's DIRTY gating (depth_video.py:417-423: only frames
    touched by BA since the last refresh are recomputed; the frontend
    marks its active window via set_dirty, frontend.py:96). None = all
    live frames (the backend's post-global-BA full refresh)."""
    F = store.poses.shape[0]
    if frames is None:
        frames = np.arange(min(F, max(n_frames, 1)))
    else:
        frames = np.asarray(frames, np.int64)
        if len(frames) == 0:
            return store
    # coarse bucket ladder: 8-step buckets compiled a fresh (minutes-long
    # remote) program every 8 keyframes on long scenes
    nb = 8
    while nb < len(frames):
        nb *= 2
    nb = min(F, nb)
    idx = np.concatenate([frames[:nb], np.full(nb - min(len(frames), nb), F,
                                               np.int64)])
    return _update_valid_depth_mask_core(
        store, jnp.asarray(idx), jnp.int32(n_frames), multiview_thresh,
        nb=nb, visible_num=visible_num, up=up)


@partial(jax.jit, static_argnames=("nb", "visible_num", "up"))
def _update_valid_depth_mask_core(store: KeyframeStore, idx, n_frames,
                                  multiview_thresh, nb: int,
                                  visible_num: int, up: bool):
    F = store.poses.shape[0]
    disps = store.disps_up if up else store.disps
    scale = 8.0 if up else 1.0
    intr = store.intrinsics * scale
    row_valid = (idx < n_frames) & (idx < F)
    idx = jnp.clip(idx, 0, F - 1)
    depths = 1.0 / jnp.clip(disps[idx], 1e-8)
    thresh = multiview_thresh * depths.mean(axis=(1, 2))
    count = dba.depth_filter_count(store.poses, disps, intr, idx, thresh)
    multiview = count >= visible_num
    d_nan = jnp.where(multiview, depths, jnp.nan)
    med = jnp.nanmedian(d_nan.reshape(nb, -1), axis=1)
    med = jnp.nan_to_num(med, nan=jnp.inf)
    masks = multiview & (depths < 3 * med[:, None, None])
    # rows past n_frames are bucket padding: route them to F (dropped)
    idx_w = jnp.where(row_valid, idx, F)
    if up:
        new = store.valid_depth_mask.at[idx_w].set(masks, mode="drop")
        return store._replace(
            valid_depth_mask=new,
            dirty=store.dirty.at[idx_w].set(False, mode="drop"))
    new = store.valid_depth_mask_small.at[idx_w].set(masks, mode="drop")
    return store._replace(valid_depth_mask_small=new)


def update_uncertainties(store: KeyframeStore, uncer_apply, dino_feats,
                         idx, train_frac_fix: float) -> KeyframeStore:
    """Run the uncertainty MLP over DINO features of frames `idx` and refresh
    the BA down-weighting masks (depth_video.py:444-467):
    uncertainties_inv = clamp(0.5/σ'², 0, 1) where σ' is the annealed,
    pixel-resampled uncertainty subsampled to 1/8 grid."""
    from ..slam.losses import compute_bias_factor

    sigma = uncer_apply(dino_feats)  # (N, h14, w14)
    h, w = store.disps.shape[-2:]
    ht, wd = store.mono_disps_up.shape[-2:]
    sigma = jnp.clip(sigma, 0.1, None) + 1e-3
    big = jax.image.resize(sigma, (sigma.shape[0], ht, wd), "bilinear")
    sh, sw = slice_hw(ht, wd)
    small = big[:, sh, sw]
    data_rate = 1 + 1 * compute_bias_factor(train_frac_fix, 0.8)
    small = (small - 0.1) * data_rate + 0.1
    inv = jnp.clip(0.5 / small ** 2, 0.0, 1.0)
    # mode="drop": callers may pad idx past the live frame count (bucketed
    # shapes keep the per-frame remote-compile count bounded)
    return store._replace(
        uncertainties_inv=store.uncertainties_inv.at[idx].set(
            inv, mode="drop"))


@jax.jit
def filter_high_err_mono_depth(store: KeyframeStore, idx: int,
                               ref_frames, dino_feats_idx, dino_feats_refs,
                               sim_threshold: float = 0.9,
                               rel_err_threshold: float = 0.02
                               ) -> KeyframeStore:
    """Cross-view mono-depth consistency vote (depth_video.py:281-349).

    Project each reference frame's mono depth into frame `idx`; where DINO
    features match (cosine > 0.9), compare reprojected vs local inverse
    depth; pixels with <=1 accurate vote and >=1 inaccurate vote get their
    mono prior masked out.

    dino_feats_idx: (H, W, D) features of frame idx upsampled to pixels;
    dino_feats_refs: (R, H, W, D) for ref_frames.
    """
    ht, wd = store.mono_disps_up.shape[-2:]
    intr_full = store.intrinsics * 8.0
    jj = jnp.asarray(ref_frames)
    R = jj.shape[0]

    # reproject ref-frame pixels into frame idx with their mono depths
    X0 = projective.iproj(store.mono_disps_up[jj],
                          jnp.broadcast_to(intr_full, (R, 4)))
    Gji = lie.se3_mul(store.poses[idx][None], lie.se3_inv(store.poses[jj]))
    X1 = lie.se3_act4(Gji[:, None, None, :], X0)
    x1, _ = projective.proj(X1, jnp.broadcast_to(intr_full, (R, 4)),
                            return_depth=True)

    xi = jnp.round(x1[..., 0]).astype(jnp.int32)
    yi = jnp.round(x1[..., 1]).astype(jnp.int32)
    valid = ((xi >= 0) & (xi < wd) & (yi >= 0) & (yi < ht)
             & (X1[..., 2] > 0) & (store.mono_disps_up[jj] > 0))
    xi = jnp.clip(xi, 0, wd - 1)
    yi = jnp.clip(yi, 0, ht - 1)

    fi = dino_feats_idx / jnp.clip(
        jnp.linalg.norm(dino_feats_idx, axis=-1, keepdims=True), 1e-8)
    fr = dino_feats_refs / jnp.clip(
        jnp.linalg.norm(dino_feats_refs, axis=-1, keepdims=True), 1e-8)
    fi_at = fi[yi, xi]                               # (R, H, W, D)
    sim = jnp.sum(fr * fi_at, axis=-1)               # (R, H, W)
    match = valid & (sim > sim_threshold)

    proj_disp = x1[..., 2]                           # reprojected inv depth
    i_disp = store.mono_disps_up[idx][yi, xi]
    err = jnp.abs(1.0 / jnp.clip(proj_disp, 1e-8)
                  - 1.0 / jnp.clip(i_disp, 1e-8)) * proj_disp
    correct = match & (err < rel_err_threshold)
    incorrect = match & ~(err < rel_err_threshold)

    # scatter votes into frame idx's pixel grid
    flat = yi * wd + xi
    acc = jnp.zeros(ht * wd).at[flat.reshape(R, -1)].add(
        correct.reshape(R, -1).astype(jnp.float32))
    inacc = jnp.zeros(ht * wd).at[flat.reshape(R, -1)].add(
        incorrect.reshape(R, -1).astype(jnp.float32))
    acc = acc.reshape(ht, wd)
    inacc = inacc.reshape(ht, wd)

    bad = (acc <= 1) & (inacc > 0) & (store.mono_disps_up[idx] > 0)
    new_mask = store.mono_mask_up.at[idx].set(
        store.mono_mask_up[idx] & ~bad)
    return store._replace(mono_mask_up=new_mask)


def normalize(store: KeyframeStore, n_frames: int) -> KeyframeStore:
    """Normalize scale (depth_video.py:185-192)."""
    idx = jnp.arange(store.disps.shape[0])
    active = idx < n_frames
    s = jnp.sum(jnp.where(active[:, None, None], store.disps, 0.0)) / (
        jnp.maximum(1, n_frames) * store.disps.shape[1] * store.disps.shape[2])
    disps = jnp.where(active[:, None, None], store.disps / s, store.disps)
    poses = store.poses.at[:, :3].multiply(
        jnp.where(active, s, 1.0)[:, None])
    return store._replace(disps=disps, poses=poses)


def backproject_pointcloud(store: KeyframeStore, index, up: bool = True):
    """World-space point cloud of one keyframe's depth (the role of
    droid_backends.iproj, droid_kernels.cu:790-863 — GUI/debug).

    Returns points (H*W, 3) and a validity mask."""
    disps = store.disps_up[index] if up else store.disps[index]
    scale = 8.0 if up else 1.0
    fx, fy, cx, cy = store.intrinsics * scale
    H, W = disps.shape
    grid = projective.coords_grid(H, W)
    z = 1.0 / jnp.clip(disps, 1e-8)
    pts_cam = jnp.stack([
        (grid[..., 0] - cx) / fx * z,
        (grid[..., 1] - cy) / fy * z,
        z,
    ], axis=-1)
    c2w = lie.se3_inv(store.poses[index])
    pts = lie.se3_act(c2w[None, None], pts_cam).reshape(-1, 3)
    valid = (disps > 1e-6).reshape(-1)
    return pts, valid


def reprojection_map(store: KeyframeStore, ii, jj):
    """Dense pixel reprojection maps ii->jj with validity (the role of
    droid_backends.projmap, droid_kernels.cu:438-527)."""
    return projective.projective_transform(
        store.poses, store.disps, store.intrinsics, jnp.asarray(ii),
        jnp.asarray(jj), return_depth=True)


def get_depth_and_pose(store: KeyframeStore, index, metric_depth_reg=True):
    """Mapper-side view (depth_video.py:393-405): (depth (H,W), mask, c2w)."""
    if metric_depth_reg:
        disp = store.mono_disps_up[index]
        depth = jnp.where(disp > 0, 1.0 / jnp.where(disp > 0, disp, 1.0), 0.0)
        mask = jnp.ones_like(disp, bool)
    else:
        disp = store.disps_up[index]
        depth = 1.0 / jnp.clip(disp, 1e-8)
        mask = store.valid_depth_mask[index]
    c2w = lie.se3_inv(store.poses[index])
    return depth, mask, c2w
