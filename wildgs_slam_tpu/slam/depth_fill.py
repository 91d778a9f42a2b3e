"""Splat-SLAM mono-depth fill for the non-metric-depth mapping branch.

Port of the reference's `Mapper.get_w2c_and_depth` non-metric path
(/root/reference/src/mapper.py:586-646) + the scale/shift estimator
(/root/reference/src/depth_video.py:375-385):

  1. keyframes with < 100 multiview-valid frontend depths are INVALID and
     skipped by the mapper (mapper.py:186-191);
  2. the mono prior is cleaned (values > 4x mean zeroed), its support mask
     eroded 5 iterations with a border-protecting pad, and holes inpainted
     with Navier-Stokes (cv2.INPAINT_NS, radius 3);
  3. the cleaned mono depth is aligned to the frontend depth with the
     closed-form weighted scale/shift LSQ (utils.common.align_scale_and_shift
     = reference common.py:56-93) over the eroded+valid pixels;
  4. invalid frontend depths are filled with the aligned mono depth.

Everything runs host-side in numpy: this executes once per keyframe intake
(and per post-BA resync of a moved keyframe), and erosion/inpaint are
classic CPU image ops — there is nothing to jit. cv2/scipy are used when
present with pure-numpy fallbacks (same semantics, slower).
"""

from __future__ import annotations

import numpy as np

from ..utils.common import align_scale_and_shift


def binary_erosion_padded(binary: np.ndarray, iterations: int = 5
                          ) -> np.ndarray:
    """3x3 full-structure binary erosion with a `pad_width=iterations`
    all-ones border (mapper.py:605-620: the pad protects image borders from
    being eaten by the erosion)."""
    b = np.pad(np.asarray(binary, bool), iterations, mode="constant",
               constant_values=True)
    try:
        from scipy.ndimage import binary_erosion

        b = binary_erosion(b, structure=np.ones((3, 3), bool),
                           iterations=iterations)
    except ImportError:
        for _ in range(iterations):
            p = np.pad(b, 1, mode="constant", constant_values=False)
            b = (p[:-2, :-2] & p[:-2, 1:-1] & p[:-2, 2:]
                 & p[1:-1, :-2] & p[1:-1, 1:-1] & p[1:-1, 2:]
                 & p[2:, :-2] & p[2:, 1:-1] & p[2:, 2:])
    return b[iterations:-iterations, iterations:-iterations]


def inpaint_ns(depth: np.ndarray, hole: np.ndarray, radius: int = 3
               ) -> np.ndarray:
    """Navier-Stokes inpainting of `hole` pixels (mapper.py:624-632).

    Uses cv2.INPAINT_NS when available; the fallback is harmonic (Laplace)
    diffusion from the hole boundary — the steady state the NS flow also
    converges to on smooth depth fields."""
    depth = np.asarray(depth, np.float32)
    hole = np.asarray(hole, bool)
    if not hole.any():
        return depth
    try:
        import cv2

        return cv2.inpaint(depth, hole.astype(np.uint8),
                           inpaintRadius=radius, flags=cv2.INPAINT_NS)
    except ImportError:
        pass
    out = depth.copy()
    known = ~hole
    if not known.any():
        return out
    out[hole] = depth[known].mean()
    for _ in range(512):
        p = np.pad(out, 1, mode="edge")
        avg = 0.25 * (p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2]
                      + p[1:-1, 2:])
        nxt = np.where(hole, avg, out)
        if np.abs(nxt - out)[hole].max() < 1e-5:
            out = nxt
            break
        out = nxt
    return out


def splat_slam_fill(est_depth, valid_mask, mono_depth, min_valid: int = 100):
    """The full non-metric-depth keyframe-depth pipeline above.

    est_depth:  (H, W) frontend (BA) depth at full resolution.
    valid_mask: (H, W) bool multiview-consistency mask
                (DepthVideo.valid_depth_mask).
    mono_depth: (H, W) mono-prior depth (0 where the prior is absent).

    Returns (depth, invalid, scale, shift). `invalid` keyframes carry the
    masked frontend depth only (mapper.py:602 zeroes invalid pixels before
    the `if not invalid` fill)."""
    est = np.array(est_depth, np.float32, copy=True)
    valid = np.asarray(valid_mask, bool)
    invalid = int(valid.sum()) < min_valid
    est[~valid] = 0.0
    if invalid:
        return est, True, 1.0, 0.0

    mono = np.array(mono_depth, np.float32, copy=True)
    mono[mono > 4.0 * mono.mean()] = 0.0
    eroded = binary_erosion_padded(mono > 0, iterations=5)
    mono[~eroded] = 0.0
    mono = inpaint_ns(mono, mono == 0.0)

    w = (eroded & valid).astype(np.float32)
    # conditioning guard (not in the reference, which divides by a possibly
    # ~0 determinant, common.py:83-86): a near-constant mono prior makes the
    # 2x2 system singular — fall back to the scale-only LSQ, which is exact
    # there and well-defined always
    a00 = float((w * mono * mono).sum())
    a01 = float((w * mono).sum())
    a11 = float(w.sum())
    det = a00 * a11 - a01 * a01
    if det > 1e-6 * max(a00 * a11, 1e-12):
        scale, shift, _ = align_scale_and_shift(mono, est, w)
        scale, shift = float(scale), float(shift)
    else:
        scale = float((w * mono * est).sum() / max(a00, 1e-12))
        shift = 0.0
    est[~valid] = (mono * scale + shift)[~valid]
    return est, False, scale, shift
