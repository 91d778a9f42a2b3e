"""Dense bundle adjustment (DBA) — fully on-device, static shapes.

TPU-native replacement for `droid_backends.ba` (droid_kernels.cu:1325-1448)
and its executable spec `src/geom/ba.py:48-135`. Key architectural change vs
the reference: the pose system is solved with an ON-DEVICE dense Cholesky
instead of Eigen SimplicialLLT on the CPU (droid_kernels.cu:1128-1230 round-
trips GPU->CPU->GPU every GN iteration — the reference's biggest wart).

Design for XLA:
  - Edges are a fixed-capacity array (E_max) with a validity mask; invalid
    edges carry zero weight and vanish from every sum.
  - Pose window [t0, t1) maps into a fixed P_max-slot system; frames outside
    the window scatter with mode="drop". Damping puts `ep` on every diagonal
    so empty slots stay SPD and solve to zero.
  - The Schur complement S = H - E C⁻¹ Eᵀ needs cross terms between edges
    sharing a source frame; we realize the sparsity by grouping edges per
    source frame (host-prepared (F, D) table) and lax.scan-ing over frames,
    each step a dense (2D·6, HW)x(HW, 2D·6) MXU matmul.
  - Depth back-substitution and the E·C⁻¹·w correction are pure per-edge
    segment-sums (no groups needed).

Semantics match geom/ba.py exactly: residual weighting 0.001·valid·weight,
damping C += eta (or the metric-depth prior mix m·alpha + (1-m)·eta and
w -= m·alpha·(disps - sensor_disps), eq. m at droid_kernels.cu:1408-1411),
per-frame depth updates restricted to edge-source frames, pose retraction by
left-multiplied exp, disparity clamp at 1e-5 (depth_video.py:373).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie, projective


class BAConfig(NamedTuple):
    lm: float = 1e-4
    ep: float = 0.1
    alpha: float = 0.05       # metric-depth prior mixing (wildgs default)
    min_disp: float = 1e-5


def make_edge_groups(ii, max_frames: int, max_degree: int):
    """Host-side: (F, D) table of edge indices with ii == frame, -1 padded."""
    import numpy as np

    ii = np.asarray(ii)
    groups = np.full((max_frames, max_degree), -1, np.int32)
    fill = np.zeros(max_frames, np.int32)
    for e, i in enumerate(ii):
        if 0 <= i < max_frames and fill[i] < max_degree:
            groups[i, fill[i]] = e
            fill[i] += 1
    return groups


def _build_per_edge(poses, disps, intrinsics, target, weight, ii, jj,
                    edge_valid):
    """Per-edge Hessian/rhs blocks. Returns dict of (E, ...) arrays."""
    E = ii.shape[0]
    H, W = disps.shape[-2:]
    HW = H * W

    coords, valid, (Ji, Jj, Jz) = projective.projective_transform(
        poses, disps, intrinsics, ii, jj, jacobian=True)

    r = (target - coords).reshape(E, HW * 2)                    # (E, 2HW)
    w = 0.001 * (valid * weight).reshape(E, HW * 2)
    w = w * edge_valid[:, None].astype(w.dtype)

    Ji = Ji.reshape(E, HW * 2, 6)
    Jj = Jj.reshape(E, HW * 2, 6)
    wJi = w[..., None] * Ji
    wJj = w[..., None] * Jj

    Hii = jnp.einsum("epd,epf->edf", wJi, Ji)
    Hij = jnp.einsum("epd,epf->edf", wJi, Jj)
    Hji = jnp.einsum("epd,epf->edf", wJj, Ji)
    Hjj = jnp.einsum("epd,epf->edf", wJj, Jj)
    vi = jnp.einsum("epd,ep->ed", wJi, r)
    vj = jnp.einsum("epd,ep->ed", wJj, r)

    # depth coupling: Jz (E, H, W, 2, 1)
    Jz2 = Jz.reshape(E, HW, 2)
    w2 = w.reshape(E, HW, 2)
    r2 = r.reshape(E, HW, 2)
    Ji2 = Ji.reshape(E, HW, 2, 6)
    Jj2 = Jj.reshape(E, HW, 2, 6)
    Ei = jnp.einsum("ehc,ehcd->edh", w2 * Jz2, Ji2)   # (E, 6, HW)
    Ej = jnp.einsum("ehc,ehcd->edh", w2 * Jz2, Jj2)
    wk = jnp.sum(w2 * r2 * Jz2, axis=-1)              # (E, HW)
    Ck = jnp.sum(w2 * Jz2 * Jz2, axis=-1)             # (E, HW)

    return dict(Hii=Hii, Hij=Hij, Hji=Hji, Hjj=Hjj, vi=vi, vj=vj,
                Ei=Ei, Ej=Ej, wk=wk, Ck=Ck)


def ba_iteration(poses, disps, intrinsics, target, weight, eta, ii, jj,
                 edge_valid, groups, t0, t1, cfg: BAConfig,
                 sensor_disps=None, sensor_valid=None, motion_only=False,
                 pmax: int | None = None):
    """One Gauss-Newton iteration. Shapes:
      poses (F, 7), disps (F, H, W), intrinsics (4,), target/weight
      (E, H, W, 2), eta (F, H, W) damping, ii/jj/edge_valid (E,),
      groups (F, D), t0/t1 dynamic scalars, pmax static pose-slot count.
    Returns (poses, disps).
    """
    F, H, W = disps.shape
    HW = H * W
    E = ii.shape[0]
    D = groups.shape[1]
    P = pmax if pmax is not None else F

    blocks = _build_per_edge(poses, disps, intrinsics,
                             target.reshape(E, H, W, 2),
                             weight.reshape(E, H, W, 2), ii, jj, edge_valid)

    pi = ii - t0
    pj = jj - t0
    vp_i = (pi >= 0) & (pi < P) & edge_valid
    vp_j = (pj >= 0) & (pj < P) & edge_valid
    pi_c = jnp.where(vp_i, pi, P)  # slot P = drop
    pj_c = jnp.where(vp_j, pj, P)

    # ---- pose Hessian assembly (P, P, 6, 6) ----
    Hmat = jnp.zeros((P + 1, P + 1, 6, 6))
    Hmat = Hmat.at[pi_c, pi_c].add(blocks["Hii"], mode="drop")
    Hmat = Hmat.at[pi_c, pj_c].add(blocks["Hij"], mode="drop")
    Hmat = Hmat.at[pj_c, pi_c].add(blocks["Hji"], mode="drop")
    Hmat = Hmat.at[pj_c, pj_c].add(blocks["Hjj"], mode="drop")
    Hmat = Hmat[:P, :P]

    vvec = jnp.zeros((P + 1, 6))
    vvec = vvec.at[pi_c].add(blocks["vi"], mode="drop")
    vvec = vvec.at[pj_c].add(blocks["vj"], mode="drop")
    vvec = vvec[:P]

    # damping: diag_dd*(1+lm) + ep (chol.py:58-69)
    eye6 = jnp.eye(6)
    Hmat = Hmat.at[jnp.arange(P), jnp.arange(P)].add(
        cfg.ep * eye6 + cfg.lm * Hmat[jnp.arange(P), jnp.arange(P)] * eye6)

    if motion_only:
        S = Hmat.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
        dx = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(S), vvec.reshape(P * 6))
        dx = dx.reshape(P, 6)
        poses = _retract_poses(poses, dx, t0, t1)
        return poses, disps

    # ---- depth diagonal + rhs ----
    iic = jnp.where(edge_valid, ii, F)
    Csum = jnp.zeros((F + 1, HW)).at[iic].add(blocks["Ck"], mode="drop")[:F]
    wsum = jnp.zeros((F + 1, HW)).at[iic].add(blocks["wk"], mode="drop")[:F]
    has_edge = jnp.zeros((F + 1,), bool).at[iic].set(True, mode="drop")[:F]

    eta_flat = eta.reshape(F, HW)
    if sensor_disps is None:
        C = Csum + eta_flat
        wd = wsum
    else:
        m = (sensor_valid & (sensor_disps > 0)).reshape(F, HW).astype(
            jnp.float32)
        C = Csum + m * cfg.alpha + (1 - m) * eta_flat
        wd = wsum - m * cfg.alpha * (disps.reshape(F, HW)
                                     - sensor_disps.reshape(F, HW))
    Q = 1.0 / C  # (F, HW); eta > 0 keeps this finite

    # ---- Schur: S = H - E Q Eᵀ via per-source-frame groups ----
    Ei, Ej = blocks["Ei"], blocks["Ej"]  # (E, 6, HW)

    def schur_frame(k):
        eids = groups[k]                       # (D,)
        gvalid = (eids >= 0)
        eidc = jnp.where(gvalid, eids, 0)
        gvalid = gvalid & edge_valid[eidc]
        Bi = Ei[eidc] * gvalid[:, None, None]  # (D, 6, HW)
        Bj = Ej[eidc] * gvalid[:, None, None]
        B = jnp.concatenate([Bi, Bj], axis=0)  # (2D, 6, HW)
        rows = jnp.concatenate([pi_c[eidc], pj_c[eidc]])  # (2D,)
        rows = jnp.where(jnp.tile(gvalid, 2), rows, P)
        Bq = B * Q[k][None, None, :]
        M = jnp.einsum("adh,beh->abde", Bq, B)            # (2D, 2D, 6, 6)
        u = jnp.einsum("adh,h->ad", B, Q[k] * wd[k])      # (2D, 6)
        return M, rows, u

    def scan_body(carry, k):
        S_acc, v_acc = carry
        M, rows, u = schur_frame(k)
        S_acc = S_acc.at[rows[:, None], rows[None, :]].add(-M, mode="drop")
        v_acc = v_acc.at[rows].add(-u, mode="drop")
        return (S_acc, v_acc), None

    S0 = jnp.zeros((P + 1, P + 1, 6, 6))
    S0 = S0.at[:P, :P].set(Hmat)
    v0 = jnp.zeros((P + 1, 6)).at[:P].set(vvec)
    (S_acc, v_acc), _ = jax.lax.scan(scan_body, (S0, v0), jnp.arange(F))
    S_mat = S_acc[:P, :P].transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
    v_rhs = v_acc[:P].reshape(P * 6)

    dx = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(S_mat), v_rhs)
    dx = jnp.nan_to_num(dx.reshape(P, 6))

    # ---- depth back-substitution: dz = Q (wd - Eᵀ dx), per-edge segsum ----
    dx_pad = jnp.concatenate([dx, jnp.zeros((1, 6))])   # row P = fixed pose
    Et_dx_e = (jnp.einsum("edh,ed->eh", Ei, dx_pad[pi_c])
               + jnp.einsum("edh,ed->eh", Ej, dx_pad[pj_c]))  # (E, HW)
    Et_dx = jnp.zeros((F + 1, HW)).at[iic].add(Et_dx_e, mode="drop")[:F]
    dz = Q * (wd - Et_dx)
    dz = jnp.where(has_edge[:, None], dz, 0.0)
    dz = jnp.nan_to_num(dz)

    poses = _retract_poses(poses, dx, t0, t1)
    disps = jnp.clip(disps + dz.reshape(F, H, W), cfg.min_disp, None)
    return poses, disps


def _retract_poses(poses, dx, t0, t1):
    F = poses.shape[0]
    P = dx.shape[0]
    frames = jnp.arange(F)
    slot = jnp.clip(frames - t0, 0, P - 1)
    xi = jnp.where(((frames >= t0) & (frames < t1))[:, None], dx[slot], 0.0)
    return lie.se3_retr(poses, xi)


def ba(poses, disps, intrinsics, target, weight, eta, ii, jj, edge_valid,
       groups, t0, t1, iters: int = 2, cfg: BAConfig = BAConfig(),
       sensor_disps=None, sensor_valid=None, motion_only=False,
       pmax: int | None = None):
    """Run `iters` GN iterations (droid_kernels ba_cuda driver loop)."""
    for _ in range(iters):
        poses, disps = ba_iteration(
            poses, disps, intrinsics, target, weight, eta, ii, jj, edge_valid,
            groups, t0, t1, cfg, sensor_disps, sensor_valid, motion_only,
            pmax)
    return poses, disps


# ---------------------------------------------------------------------------
# frame distance (droid_kernels.cu:529-668)
# ---------------------------------------------------------------------------

def frame_distance(poses, disps, intrinsics, ii, jj, beta: float = 0.3):
    """Mean induced flow between frames, blending full-SE3 flow (weight beta)
    with translation-only flow (1-beta); 1000 if <75% of pixels valid."""
    H, W = disps.shape[-2:]
    grid = projective.coords_grid(H, W)

    Gij = lie.se3_mul(poses[jj], lie.se3_inv(poses[ii]))
    X0 = projective.iproj(disps[ii], jnp.broadcast_to(intrinsics,
                                                      ii.shape + (4,)))
    # full transform
    X1 = lie.se3_act4(Gij[:, None, None, :], X0)
    c1, _ = projective.proj(X1, jnp.broadcast_to(intrinsics, ii.shape + (4,)))
    d1 = jnp.linalg.norm(c1 - grid, axis=-1)
    v1 = X1[..., 2] > projective.MIN_DEPTH

    # translation-only
    Xt = X0.at[..., :3].add(X0[..., 3:4] * Gij[:, None, None, :3])
    c2, _ = projective.proj(Xt, jnp.broadcast_to(intrinsics, ii.shape + (4,)))
    d2 = jnp.linalg.norm(c2 - grid, axis=-1)
    v2 = Xt[..., 2] > projective.MIN_DEPTH

    accum = beta * jnp.sum(jnp.where(v1, d1, 0.0), axis=(1, 2)) + \
        (1 - beta) * jnp.sum(jnp.where(v2, d2, 0.0), axis=(1, 2))
    valid = beta * jnp.sum(v1, axis=(1, 2)) + \
        (1 - beta) * jnp.sum(v2, axis=(1, 2))
    total = H * W  # beta + (1-beta) per pixel

    frac = valid / (total + 1e-8)
    dist = jnp.where(frac < 0.75, 1000.0, accum / jnp.clip(valid, 1e-8))
    return dist


def frame_distance_bidirectional(poses, disps, intrinsics, ii, jj,
                                 beta: float = 0.3):
    """0.5*(d(i->j) + d(j->i)) (depth_video.py:216-226)."""
    d1 = frame_distance(poses, disps, intrinsics, ii, jj, beta)
    d2 = frame_distance(poses, disps, intrinsics, jj, ii, beta)
    return 0.5 * (d1 + d2)


# ---------------------------------------------------------------------------
# multiview depth consistency filter (droid_kernels.cu:672-789)
# ---------------------------------------------------------------------------

def depth_filter_count(poses, disps, intrinsics, index, thresh):
    """For each pixel of each `index` frame, count how many of its SIX
    temporal neighbor frames {i-3, i-2, i-1, i+3, i+4, i+5} observe a
    consistent depth (|reprojected inverse depth - observed| < thresh, in
    front of camera, in bounds). The neighbor set is the reference kernel's
    (droid_kernels.cu:705: jx = ix - neigh_id - 1 for neigh_id < 3 else
    ix + neigh_id, over gridDim.y = 6); the first implementation here
    compared against EVERY buffer frame — ~10x the warp-gather work AND
    more permissive masks. Used by update_valid_depth_mask
    (depth_video.py:407-442)."""
    F, H, W = disps.shape
    offs = jnp.array([-1, -2, -3, 3, 4, 5], jnp.int32)
    NB = offs.shape[0]
    intr_b = jnp.broadcast_to(intrinsics, (NB, 4))

    def count_for(i, th):
        js = i + offs
        j_ok = (js >= 0) & (js < F)
        jsc = jnp.clip(js, 0, F - 1)
        X0 = projective.iproj(disps[i][None], intrinsics[None])  # (1,H,W,4)
        Gij = lie.se3_mul(poses[jsc], lie.se3_inv(poses[i])[None])  # (NB,7)
        X1 = lie.se3_act4(Gij[:, None, None, :], X0)             # (NB,H,W,4)
        coords, _ = projective.proj(X1, intr_b)
        x1 = coords[..., 0]
        y1 = coords[..., 1]
        z1 = X1[..., 2]
        d1 = X1[..., 3] / jnp.where(z1 < 1e-6, 1e-6, z1)  # reprojected disp

        xi = jnp.clip(jnp.round(x1).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(y1).astype(jnp.int32), 0, H - 1)
        inb = (x1 >= 0) & (x1 < W) & (y1 >= 0) & (y1 < H) & (z1 > 0)
        dj = jax.vmap(lambda d, yy, xx: d[yy, xx])(disps[jsc], yi, xi)
        consistent = inb & (jnp.abs(1.0 / jnp.clip(d1, 1e-8) -
                                    1.0 / jnp.clip(dj, 1e-8)) < th)
        return jnp.sum(consistent & j_ok[:, None, None], axis=0)

    return jax.vmap(count_for)(index, thresh)
