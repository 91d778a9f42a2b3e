"""Edge-sharded full tracking step over a device mesh (SURVEY §7 stage 4).

The complete FactorGraph.update hot loop (reproject -> correlation lookup ->
GRU update -> DBA -> convex upsample; reference factor_graph.py:218-263)
with the EDGES sharded over the mesh by source frame:

  * reprojection, corr lookup, and the GRU update operator are strictly
    per-edge — they run on each device's edge shard with zero communication;
  * GraphAgg (the per-source-frame scatter-mean producing BA damping and the
    upsample mask, droid_net.py:73) stays LOCAL because all edges of a frame
    live on the frame's owner (same partition as sharded_dba);
  * the DBA pose system is the one psum (sharded_dba.ba_step_in_shardmap);
  * per-frame damping and upsampled-disparity updates are written by the
    owning device and combined with a delta-psum.

Numerically identical to factor_graph._update_core up to fp32 summation
order — asserted by tests/test_multichip.py::test_sharded_track_step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .compat import shard_map

from ..models import droid_net
from ..ops import correlation, dba, projective
from . import sharded_dba

EP_DAMP = 1e-7  # matches factor_graph.EP_DAMP


def make_sharded_track_step(mesh: Mesh, F: int, hw_shape, E_cap: int,
                            pmax: int, degree: int, axis: str = "edge",
                            iters: int = 2, metric_depth_reg: bool = True,
                            uncertainty_aware: bool = True):
    """Build the jitted sharded track step.

    fn(params, poses, disps, disps_up, intrinsics, uncert_inv, mono_disps,
       mono_mask_small, net, inp, target, weight, corr_l0..3, ii, jj, valid,
       gru_valid, frame_base, damping, groups, owner, t0, t1)
    -> (net2, target2, weight2, damping2, poses2, disps2, disps_up2)

    Edge arrays are device-major (D*E_cap, ...) from
    sharded_dba.shard_edges_by_frame; `groups` (D, F, degree) indexes LOCAL
    edges; `owner` (D, F). `gru_valid` distinguishes ACTIVE edges (GRU
    update + BA) from INACTIVE ones (BA only, stored target/weight — the
    use_inactive=True path of factor_graph._update_core); pass zeros for
    the inactive rows' net/inp/corr volumes.
    """
    h, w = hw_shape
    D = mesh.devices.size

    def body(params, poses, disps, disps_up, intrinsics, uncert_inv,
             mono_disps, mono_mask_small, net, inp, target, weight,
             corr_l0, corr_l1, corr_l2, corr_l3, ii, jj, edge_valid,
             gru_valid, frame_base, damping, groups, owner, t0, t1):
        groups_l = groups.reshape(F, degree)
        owner_l = owner.reshape(F)
        ii = ii.reshape(-1)
        jj = jj.reshape(-1)
        edge_valid = edge_valid.reshape(-1)
        gru_valid = gru_valid.reshape(-1) & edge_valid

        coords0 = projective.coords_grid(h, w)
        coords1, _ = projective.projective_transform(
            poses, disps, intrinsics, ii, jj)
        motn = jnp.clip(jnp.concatenate(
            [coords1 - coords0, target - coords1], axis=-1), -64.0, 64.0)

        corr = correlation.corr_lookup(
            [corr_l0, corr_l1, corr_l2, corr_l3], coords1)

        # pad + BA-only edges -> dropped slot pmax (matches _update_core)
        ii_rel = jnp.where(gru_valid,
                           jnp.clip(ii - frame_base, 0, pmax - 1), pmax)
        net2, delta, weight2, eta_new, upmask = droid_net.UpdateModule(
            dtype=droid_net.net_dtype(),
        ).apply({"params": params["update"]}, net, inp,
                corr.astype(net.dtype), motn.astype(net.dtype), ii_rel, pmax)
        ii_rel = jnp.clip(ii - frame_base, 0, pmax - 1)

        net2 = jnp.where(gru_valid[:, None, None, None], net2, net)
        target2 = coords1 + delta.astype(jnp.float32)
        target2 = jnp.where(gru_valid[:, None, None, None], target2, target)
        weight2 = jnp.where(gru_valid[:, None, None, None],
                            weight2.astype(jnp.float32), weight)

        # damping for OWNED frames with local ACTIVE edges (delta-psum)
        has_edge_rel = jnp.zeros((pmax,), bool).at[
            jnp.where(gru_valid, ii_rel, pmax)].set(True, mode="drop")
        in_range = (frame_base + jnp.arange(pmax)) < F  # no clip duplicates
        frames_abs = jnp.clip(frame_base + jnp.arange(pmax), 0, F - 1)
        own_rel = owner_l[frames_abs] & has_edge_rel & in_range
        d_delta = jnp.where(own_rel[:, None, None],
                            eta_new.astype(jnp.float32)
                            - damping[frames_abs], 0.0)
        damping2 = damping.at[frames_abs].add(jax.lax.psum(d_delta, axis))

        eta = 0.2 * damping2 + EP_DAMP

        if uncertainty_aware:
            weight_ba = weight2 * uncert_inv[
                jnp.clip(ii, 0, F - 1)][..., None]
        else:
            weight_ba = weight2

        sensor = mono_disps if metric_depth_reg else None
        sensor_valid = mono_mask_small if metric_depth_reg else None

        poses2, disps2 = poses, disps
        for _ in range(iters):
            poses2, disps2 = sharded_dba.ba_step_in_shardmap(
                axis, poses2, disps2, intrinsics, target2, weight_ba, eta,
                ii, jj, edge_valid, groups_l, owner_l, t0, t1,
                dba.BAConfig(lm=1e-4, ep=0.1), sensor, sensor_valid, pmax)

        # convex upsample for owned window frames (delta-psum combine)
        up = droid_net.upsample_disp(disps2[frames_abs],
                                     upmask.astype(jnp.float32))
        u_delta = jnp.where(own_rel[:, None, None],
                            up - disps_up[frames_abs], 0.0)
        disps_up2 = disps_up.at[frames_abs].add(jax.lax.psum(u_delta, axis))

        return (net2, target2, weight2, damping2, poses2, disps2, disps_up2)

    es = P(axis)
    repl = P()
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(repl, repl, repl, repl, repl, repl, repl, repl,
                  es, es, es, es, es, es, es, es, es, es, es, es,
                  repl, repl, es, es, repl, repl),
        out_specs=(es, es, es, repl, repl, repl, repl))
    return jax.jit(sharded)
