"""Edge-sharded dense bundle adjustment over a device mesh (SURVEY §7 stage 4).

The DBA workload is embarrassingly parallel over factor-graph edges until the
Schur-complement reduce (SURVEY.md §5 "long-context" plan): each edge builds
dense per-pixel Jacobians/Hessian blocks independently, and the only coupling
is (a) the (P, P, 6, 6) pose system — an all-reduce — and (b) per-source-frame
depth blocks C/w and the E·Q·Eᵀ products, which couple edges SHARING a source
frame.

Sharding design:
  * Edges are assigned to devices BY SOURCE FRAME (`shard_edges_by_frame`):
    all edges with ii == k live on the device that owns frame k. This keeps
    every frame-local product (C_k, w_k, the grouped Schur outer products,
    depth back-substitution) entirely on one device — zero communication.
  * Each device builds its partial pose Hessian/rhs and partial Schur
    subtraction over its edges; ONE `psum` over the mesh (riding ICI)
    produces the replicated (P·6, P·6) system; the small Cholesky solve runs
    replicated (P ≤ 350 → ≤ 2100×2100, trivially fast and avoids a
    broadcast).
  * Depth updates dz are computed only for owned frames and combined with a
    second psum (each frame written by exactly one device, others contribute
    zeros).

Numerics are IDENTICAL to the single-device path (ops/dba.py) up to fp32
summation order — asserted by tests/test_multichip.py against
dba.ba_iteration.

Reference semantics: droid_backends.ba (droid_kernels.cu:1325-1448); no
distributed counterpart exists in the reference (single GPU, SURVEY §2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .compat import shard_map

from ..ops import dba


def shard_edges_by_frame(ii, jj, n_devices, max_frames, degree,
                         e_cap=None):
    """Host-side partition: frames round-robin over devices; edges follow
    their source frame. Returns per-device padded edge arrays + metadata.

    Returns dict with:
      perm      (D, E_cap) indices into the original edge arrays (0 for pads)
      valid     (D, E_cap) bool
      groups    (D, F, degree) per-device LOCAL edge-index group table
      owner     (D, F) bool — device d owns frame f
    """
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    frame_dev = np.arange(max_frames) % n_devices
    edge_dev = frame_dev[np.clip(ii, 0, max_frames - 1)]

    per_dev = [np.where(edge_dev == d)[0] for d in range(n_devices)]
    if e_cap is None:
        e_cap = max(1, max(len(p) for p in per_dev))

    perm = np.zeros((n_devices, e_cap), np.int32)
    valid = np.zeros((n_devices, e_cap), bool)
    groups = np.full((n_devices, max_frames, degree), -1, np.int32)
    owner = np.zeros((n_devices, max_frames), bool)
    owner[frame_dev, np.arange(max_frames)] = True

    for d in range(n_devices):
        sel = per_dev[d][:e_cap]
        perm[d, : len(sel)] = sel
        valid[d, : len(sel)] = True
        fill = np.zeros(max_frames, np.int32)
        for e_loc, e_glob in enumerate(sel):
            f = ii[e_glob]
            if 0 <= f < max_frames and fill[f] < degree:
                groups[d, f, fill[f]] = e_loc
                fill[f] += 1
    return dict(perm=perm, valid=valid, groups=groups, owner=owner,
                e_cap=e_cap)


def _local_partials(poses, disps, intrinsics, target, weight, eta, ii, jj,
                    edge_valid, groups, owner, t0, cfg, sensor_disps,
                    sensor_valid, pmax):
    """Per-device: partial pose system + owned-frame depth blocks.

    Mirrors ops/dba.ba_iteration's assembly with edges restricted to the
    local shard; every global sum becomes a psum by the caller."""
    F, H, W = disps.shape
    HW = H * W
    Pm = pmax

    blocks = dba._build_per_edge(poses, disps, intrinsics, target, weight,
                                 ii, jj, edge_valid)

    pi = ii - t0
    pj = jj - t0
    vp_i = (pi >= 0) & (pi < Pm) & edge_valid
    vp_j = (pj >= 0) & (pj < Pm) & edge_valid
    pi_c = jnp.where(vp_i, pi, Pm)
    pj_c = jnp.where(vp_j, pj, Pm)

    Hmat = jnp.zeros((Pm + 1, Pm + 1, 6, 6))
    Hmat = Hmat.at[pi_c, pi_c].add(blocks["Hii"], mode="drop")
    Hmat = Hmat.at[pi_c, pj_c].add(blocks["Hij"], mode="drop")
    Hmat = Hmat.at[pj_c, pi_c].add(blocks["Hji"], mode="drop")
    Hmat = Hmat.at[pj_c, pj_c].add(blocks["Hjj"], mode="drop")

    vvec = jnp.zeros((Pm + 1, 6))
    vvec = vvec.at[pi_c].add(blocks["vi"], mode="drop")
    vvec = vvec.at[pj_c].add(blocks["vj"], mode="drop")

    # owned-frame depth diagonal + rhs (complete: frame's edges are local)
    iic = jnp.where(edge_valid, ii, F)
    Csum = jnp.zeros((F + 1, HW)).at[iic].add(blocks["Ck"], mode="drop")[:F]
    wsum = jnp.zeros((F + 1, HW)).at[iic].add(blocks["wk"], mode="drop")[:F]
    has_edge = jnp.zeros((F + 1,), bool).at[iic].set(True, mode="drop")[:F]
    has_edge = has_edge & owner

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
    own_f = owner[:, None].astype(jnp.float32)
    Q = own_f / C                    # masked: non-owned frames contribute 0
    wd = wd * own_f

    # grouped Schur partials over owned frames (groups only reference local
    # edges of owned frames)
    Ei, Ej = blocks["Ei"], blocks["Ej"]

    def scan_body(carry, k):
        S_acc, v_acc = carry
        eids = groups[k]
        gvalid = eids >= 0
        eidc = jnp.where(gvalid, eids, 0)
        gvalid = gvalid & edge_valid[eidc]
        Bi = Ei[eidc] * gvalid[:, None, None]
        Bj = Ej[eidc] * gvalid[:, None, None]
        B = jnp.concatenate([Bi, Bj], axis=0)
        rows = jnp.concatenate([pi_c[eidc], pj_c[eidc]])
        rows = jnp.where(jnp.tile(gvalid, 2), rows, Pm)
        Bq = B * Q[k][None, None, :]
        M = jnp.einsum("adh,beh->abde", Bq, B)
        u = jnp.einsum("adh,h->ad", B, Q[k] * wd[k])
        S_acc = S_acc.at[rows[:, None], rows[None, :]].add(-M, mode="drop")
        v_acc = v_acc.at[rows].add(-u, mode="drop")
        return (S_acc, v_acc), None

    (S_acc, v_acc), _ = jax.lax.scan(
        scan_body, (Hmat, vvec), jnp.arange(F))

    Hdiag = Hmat[jnp.arange(Pm), jnp.arange(Pm)]  # (Pm, 6, 6) partial
    return S_acc, v_acc, Hdiag, Q, wd, has_edge, (Ei, Ej, pi_c, pj_c, iic)


def ba_step_in_shardmap(axis, poses, disps, intrinsics, target, weight, eta,
                        ii, jj, edge_valid, groups_l, owner_l, t0, t1, cfg,
                        sensor_disps, sensor_valid, pmax):
    """One sharded GN iteration; call INSIDE a shard_map over `axis` with
    edge arrays local and poses/disps replicated. Returns (poses, disps)."""
    F, H, W = disps.shape

    S_p, v_p, Hdiag_p, Q, wd, has_edge, aux = _local_partials(
        poses, disps, intrinsics, target, weight, eta, ii, jj, edge_valid,
        groups_l, owner_l, t0, cfg, sensor_disps, sensor_valid, pmax)

    # ONE all-reduce for the pose system (ICI)
    S = jax.lax.psum(S_p, axis)
    v = jax.lax.psum(v_p, axis)
    Hdiag = jax.lax.psum(Hdiag_p, axis)

    eye6 = jnp.eye(6)
    damp = cfg.ep * eye6 + cfg.lm * Hdiag * eye6
    S = S.at[jnp.arange(pmax), jnp.arange(pmax)].add(damp)

    S_mat = S[:pmax, :pmax].transpose(0, 2, 1, 3).reshape(pmax * 6, pmax * 6)
    v_rhs = v[:pmax].reshape(pmax * 6)
    dx = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(S_mat), v_rhs)
    dx = jnp.nan_to_num(dx.reshape(pmax, 6))

    # owned-frame depth back-substitution, combined by psum
    Ei, Ej, pi_c, pj_c, iic = aux
    HWl = H * W
    dx_pad = jnp.concatenate([dx, jnp.zeros((1, 6))])
    Et_dx_e = (jnp.einsum("edh,ed->eh", Ei, dx_pad[pi_c])
               + jnp.einsum("edh,ed->eh", Ej, dx_pad[pj_c]))
    Et_dx = jnp.zeros((F + 1, HWl)).at[iic].add(Et_dx_e, mode="drop")[:F]
    dz = Q * (wd - Et_dx)
    dz = jnp.where(has_edge[:, None], dz, 0.0)
    dz = jnp.nan_to_num(dz)
    dz = jax.lax.psum(dz, axis)

    poses = dba._retract_poses(poses, dx, t0, t1)
    disps = jnp.clip(disps + dz.reshape(F, H, W), cfg.min_disp, None)
    return poses, disps


def make_sharded_ba(mesh: Mesh, F: int, HW_shape, E_cap: int, pmax: int,
                    degree: int, axis: str = "edge",
                    cfg: dba.BAConfig = dba.BAConfig(),
                    use_sensor: bool = True, iters: int = 2):
    """Build a jitted edge-sharded BA: returns fn(poses, disps, intrinsics,
    target, weight, eta, ii, jj, valid, groups, owner, t0, t1[, sensor...]).

    target/weight/ii/jj/valid have leading dim D*E_cap (device-major order
    from shard_edges_by_frame); groups is (D, F, degree); owner (D, F)."""
    H, W = HW_shape
    D = mesh.devices.size

    edge_specs = P(axis)
    repl = P()

    def multi_iter(poses, disps, intrinsics, target, weight, eta, ii, jj,
                   edge_valid, groups, owner, t0, t1, sensor_disps,
                   sensor_valid):
        groups_l = groups.reshape(F, degree)       # local block
        owner_l = owner.reshape(F)
        for _ in range(iters):
            poses, disps = ba_step_in_shardmap(
                axis, poses, disps, intrinsics,
                target.reshape(-1, H, W, 2), weight.reshape(-1, H, W, 2),
                eta, ii.reshape(-1), jj.reshape(-1), edge_valid.reshape(-1),
                groups_l, owner_l, t0, t1, cfg,
                sensor_disps if use_sensor else None,
                sensor_valid if use_sensor else None, pmax)
        return poses, disps

    sharded = shard_map(
        multi_iter, mesh=mesh,
        in_specs=(repl, repl, repl, edge_specs, edge_specs, repl,
                  edge_specs, edge_specs, edge_specs, edge_specs,
                  edge_specs, repl, repl, repl, repl),
        out_specs=(repl, repl))
    return jax.jit(sharded)


def gather_edges(arrs, perm):
    """Reorder edge arrays into device-major (D*E_cap, ...) layout."""
    idx = jnp.asarray(perm.reshape(-1))
    return [jnp.asarray(a)[idx] for a in arrs]
