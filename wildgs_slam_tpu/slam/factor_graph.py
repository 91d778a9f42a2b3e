"""Factor graph: host-managed edge topology + jitted GRU/DBA update core.

Re-design of the reference's src/factor_graph.py for a single-controller JAX
system. The reference mutates dynamic torch tensors per edge operation; here:

  - Edge TOPOLOGY (ii, jj, age, inactive/bad lists, NMS edge proposal) lives
    on the host as numpy — it is tiny, per-keyframe work, and inherently
    sequential (the reference also runs proposal in Python,
    factor_graph.py:325-465).
  - Edge STATE (GRU hidden, target, weight, correlation pyramids) lives on
    device in FIXED-CAPACITY storage with a live count: adds write bucketed
    blocks at the live offset, removals compact through a full-capacity
    permutation gather. Every device op therefore has one of a handful of
    static shapes. This matters enormously under remote compilation: the
    round-1 design grew/shrank these arrays eagerly per keyframe, and every
    new shape cost a fresh (minutes-long) remote XLA compile — the
    full-pipeline profile measured 152 s/frame of pure compile churn in the
    frontend.
  - The HOT LOOP (reproject -> corr lookup -> GRU update -> DBA -> upsample;
    factor_graph.py:218-263) is ONE jitted function over fixed-capacity
    padded arrays, bucketed to limit recompiles.

Frame indices inside the jitted core are absolute; the GraphAgg segment
aggregation and the BA pose window use relative slots.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import droid_net
from ..ops import correlation, dba, projective
from ..utils.profiling import TIMER
from . import keyframe_store as kstore

EP_DAMP = 1e-7


def _bucket(n: int, buckets=(8, 16, 32, 48, 64, 96, 128, 192, 256, 384, 512)):
    for b in buckets:
        if n <= b:
            return b
    return int(math.ceil(n / 128) * 128)


class UpdateOut(NamedTuple):
    net: jax.Array
    target: jax.Array
    weight: jax.Array
    damping: jax.Array
    poses: jax.Array
    disps: jax.Array
    disps_up: jax.Array
    n_done: jax.Array       # () int32 — iterations actually executed
    delta_mean: jax.Array   # () f32 — mean |GRU delta| of the last iteration


@partial(jax.jit, static_argnames=("n", "iters", "pmax", "motion_only",
                                   "metric_depth_reg", "uncertainty_aware",
                                   "cap"))
def _update_core(params, poses, disps, disps_up, intrinsics, uncert_inv,
                 mono_disps, mono_mask_small,
                 net, inp, target, weight, corr_l0, corr_l1, corr_l2, corr_l3,
                 ii, jj, edge_valid, frame_base,
                 inac_target, inac_weight, inac_ii, inac_jj, inac_valid,
                 damping, groups, t0, t1, eps, n: int, iters: int, pmax: int,
                 motion_only: bool, metric_depth_reg: bool,
                 uncertainty_aware: bool, cap: int | None = None):
    """`n` FactorGraph.updates (factor_graph.py:218-263) in ONE dispatch:
    a jitted while_loop over (GRU step + BA), with convergence early-exit.

    The reference runs iters1=8 / iters2=4 separate update calls per
    keyframe (frontend.py:51-97); round-2 profiling measured those ~12
    dispatches as ~7.5 s/frame of device time at 384x512. Batching them
    into one while_loop (a) removes the per-dispatch tunnel queue drains,
    (b) hoists the convex upsample out of the loop (only the LAST
    iteration's disps_up is ever read by the host), and (c) stops
    iterating once the GRU's mean flow correction drops below `eps`
    pixels (eps=0 reproduces the fixed-iteration reference schedule).

    All edge arrays padded to capacity; `frame_base` is the minimum frame of
    the active window (for GraphAgg segment slots). When `cap` is given,
    the edge/correlation storage arrives at FULL capacity and is sliced to
    `cap` rows here, inside the jit — an eager `arr[:cap]` at the call site
    would device-copy the multi-GB corr levels on every update."""
    if cap is not None:
        net, inp, target, weight = (net[:cap], inp[:cap], target[:cap],
                                    weight[:cap])
        corr_l0, corr_l1, corr_l2, corr_l3 = (
            corr_l0[:cap], corr_l1[:cap], corr_l2[:cap], corr_l3[:cap])
    F, h, w = disps.shape

    coords0 = projective.coords_grid(h, w)
    ii_rel = jnp.clip(ii - frame_base, 0, pmax - 1)
    # invalid (padding) edges route to dropped slot pmax so they cannot
    # pollute GraphAgg's per-frame mean (segment_sum drops oob indices)
    ii_rel_gru = jnp.where(edge_valid, ii_rel, pmax)
    has_edge_rel = jnp.zeros((pmax,), bool).at[ii_rel_gru].set(
        True, mode="drop")
    frames_abs = frame_base + jnp.arange(pmax)
    frames_up = jnp.clip(frames_abs, 0, F - 1)

    # constant across iterations
    ii_all = jnp.concatenate([ii, inac_ii])
    jj_all = jnp.concatenate([jj, inac_jj])
    valid_all = jnp.concatenate([edge_valid, inac_valid])
    sensor = mono_disps if metric_depth_reg else None
    sensor_valid = mono_mask_small if metric_depth_reg else None
    if uncertainty_aware:
        uw = uncert_inv[jnp.clip(ii_all, 0, F - 1)][..., None]

    def one_update(net, target, weight, damping, poses, disps):
        coords1, _ = projective.projective_transform(
            poses, disps, intrinsics, ii, jj)
        motn = jnp.concatenate([coords1 - coords0, target - coords1],
                               axis=-1)
        motn = jnp.clip(motn, -64.0, 64.0)

        corr = correlation.corr_lookup(
            [corr_l0, corr_l1, corr_l2, corr_l3], coords1)

        net2, delta, weight2, eta_new, upmask = (
            droid_net.UpdateModule(dtype=droid_net.net_dtype()).apply(
                {"params": params["update"]}, net, inp,
                corr.astype(net.dtype), motn.astype(net.dtype),
                ii_rel_gru, pmax))

        net2 = jnp.where(edge_valid[:, None, None, None], net2, net)
        target2 = coords1 + delta.astype(jnp.float32)
        target2 = jnp.where(edge_valid[:, None, None, None], target2, target)
        weight2 = jnp.where(edge_valid[:, None, None, None],
                            weight2.astype(jnp.float32), weight)

        # convergence signal: mean |delta| over live edges (pixels at 1/8
        # res) — the GRU's requested flow correction this iteration
        dnorm = jnp.linalg.norm(delta.astype(jnp.float32), axis=-1)
        dmean = (jnp.sum(jnp.where(edge_valid[:, None, None], dnorm, 0.0))
                 / (jnp.sum(edge_valid) * h * w + 1e-8))

        # damping[unique(ii)] = eta (factor_graph.py:243)
        damping = damping.at[frames_up].set(
            jnp.where(has_edge_rel[:, None, None],
                      eta_new.astype(jnp.float32), damping[frames_up]))

        target_all = jnp.concatenate([target2, inac_target])
        weight_all = jnp.concatenate([weight2, inac_weight])
        eta = 0.2 * damping + EP_DAMP  # (F, h, w)
        weight_ba = weight_all * uw if uncertainty_aware else weight_all

        poses2, disps2 = dba.ba(
            poses, disps, intrinsics, target_all, weight_ba, eta, ii_all,
            jj_all, valid_all, groups, t0, t1, iters=iters,
            cfg=dba.BAConfig(lm=1e-4, ep=0.1),
            sensor_disps=sensor, sensor_valid=sensor_valid,
            motion_only=motion_only, pmax=pmax)
        return net2, target2, weight2, damping, poses2, disps2, upmask, dmean

    if n == 1:
        net, target, weight, damping, poses, disps, upmask, dmean = (
            one_update(net, target, weight, damping, poses, disps))
        n_done = jnp.int32(1)
    else:
        upmask0 = jnp.zeros((pmax, h, w, 8 * 8 * 9), net.dtype)

        def cond(c):
            it, dm = c[0], c[1]
            return (it < n) & ((it == 0) | (dm > eps))

        def body(c):
            it, _, net, target, weight, damping, poses, disps, _ = c
            (net, target, weight, damping, poses, disps, upmask,
             dmean) = one_update(net, target, weight, damping, poses, disps)
            return (it + 1, dmean, net, target, weight, damping, poses,
                    disps, upmask)

        (n_done, dmean, net, target, weight, damping, poses, disps,
         upmask) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.float32(jnp.inf), net, target,
                         weight, damping, poses, disps, upmask0))

    # upsample disps for window frames with edges (video.upsample) — once,
    # with the final iteration's mask (intermediate disps_up is never read)
    up = droid_net.upsample_disp(disps[frames_up], upmask.astype(jnp.float32))
    disps_up = disps_up.at[frames_up].set(
        jnp.where(has_edge_rel[:, None, None], up, disps_up[frames_up]))

    return UpdateOut(net, target, weight, damping, poses, disps, disps_up,
                     n_done, dmean)


@partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5),
         static_argnames=("fcap", "pmax_c", "iters", "pmax", "motion_only",
                          "metric_depth_reg", "uncertainty_aware"))
def _lowmem_step_core(params, store, net_st, target_st, weight_st, damping,
                      sel_mat, ii_mat, jj_mat, valid_mat, fb_vec,
                      ii_all, jj_all, valid_all, groups, t0, t1,
                      fcap: int, pmax_c: int, iters: int, pmax: int,
                      motion_only: bool, metric_depth_reg: bool,
                      uncertainty_aware: bool):
    """ONE device program for a whole update_lowmem step: fmap pyramid ->
    lax.scan over edge chunks (alt_corr + GRU, scatter back into the edge
    storage) -> damping -> ONE full-window DBA. The first implementation
    ran each of these as eager host-driven ops; at 384x512/F=25 the eager
    slices/gathers/concats/eta math cost ~20x the device compute through
    the tunnel (PERF.md r5 global-BA entry).

    sel_mat (C, cap_c): edge-storage rows per chunk (pad rows = a huge
    index -> clipped reads masked by valid_mat, dropped writes).
    fb_vec (C,): per-chunk frame base for the GraphAgg window."""
    from . import keyframe_store as _ks

    st_rows = net_st.shape[0]
    fpyr = correlation.fmap_pyramid(store.fmaps[:fcap])
    h, w = store.disps.shape[-2:]
    coords0 = projective.coords_grid(h, w)

    def chunk_body(carry, xs):
        net_st, target_st, weight_st, damping = carry
        sel, iic, jjc, vc, fb = xs
        selr = jnp.clip(sel, 0, st_rows - 1)
        net = net_st[selr]
        tgt = target_st[selr]
        inp = store.inps[iic]
        coords1, _ = projective.projective_transform(
            store.poses, store.disps, store.intrinsics, iic, jjc)
        motn = jnp.clip(jnp.concatenate(
            [coords1 - coords0, tgt - coords1], axis=-1), -64.0, 64.0)
        corr = correlation.alt_corr(fpyr, coords1, iic, jjc)
        ii_rel = jnp.where(vc, jnp.clip(iic - fb, 0, pmax_c - 1), pmax_c)
        net2, delta, weight2, eta_new, _ = droid_net.UpdateModule(
            dtype=droid_net.net_dtype()).apply(
            {"params": params["update"]}, net, inp, corr.astype(net.dtype),
            motn.astype(net.dtype), ii_rel, pmax_c)
        net2 = jnp.where(vc[:, None, None, None], net2, net)
        tgt2 = jnp.where(vc[:, None, None, None],
                         coords1 + delta.astype(jnp.float32), tgt)
        wgt2 = weight2.astype(jnp.float32) * vc[:, None, None, None]
        has_edge = jnp.zeros((pmax_c,), bool).at[
            jnp.where(vc, ii_rel, pmax_c)].set(True, mode="drop")

        wr = jnp.where(vc, sel, st_rows)
        net_st = net_st.at[wr].set(net2, mode="drop")
        target_st = target_st.at[wr].set(tgt2, mode="drop")
        weight_st = weight_st.at[wr].set(wgt2, mode="drop")
        F = damping.shape[0]
        fb_frames = jnp.clip(fb + jnp.arange(pmax_c), 0, F - 1)
        damping = damping.at[fb_frames].set(
            jnp.where(has_edge[:, None, None], eta_new,
                      damping[fb_frames]))
        return (net_st, target_st, weight_st, damping), None

    (net_st, target_st, weight_st, damping), _ = jax.lax.scan(
        chunk_body, (net_st, target_st, weight_st, damping),
        (sel_mat, ii_mat, jj_mat, valid_mat, fb_vec))

    cap_all = ii_all.shape[0]
    eta = 0.2 * damping + EP_DAMP
    store = _ks.ba(store, target_st[:cap_all], weight_st[:cap_all], eta,
                   ii_all, jj_all, valid_all, groups, t0, t1, iters=iters,
                   lm=1e-5, ep=1e-2, motion_only=motion_only,
                   metric_depth_reg=metric_depth_reg,
                   uncertainty_aware=uncertainty_aware, pmax=pmax)
    return store, net_st, target_st, weight_st, damping


def _next_cap(n: int) -> int:
    return _bucket(max(n, 8))


@partial(jax.jit, donate_argnums=(0,))
def _write_donated(dst, src, offset):
    return jax.lax.dynamic_update_slice(
        dst, src, (offset,) + (jnp.int32(0),) * (dst.ndim - 1))


class FactorGraph:
    """Host orchestrator owning edge topology + fixed-capacity device state.

    Device arrays (`net/inp/target/weight/corr_pyr` and the inactive
    `target_inac/weight_inac`) have CAPACITY rows; rows < len(self.ii)
    (resp. len(self.ii_inac)) are live, the rest are scratch. Capacities are
    always bucket values, so every slice/gather/update below compiles a
    bounded number of times."""

    def __init__(self, state, params, corr_impl="volume", max_factors=-1,
                 pmax=96, inac_cap=96, group_degree=16, mesh=None):
        self.state = state            # SlamState: .store, .counter
        self.params = params
        self.corr_impl = corr_impl
        self.max_factors = max_factors
        self.pmax = pmax
        self.group_degree = group_degree
        # stage-4 mesh mode: update_n routes through the edge-sharded track
        # step (parallel/sharded_track.py) instead of _update_core
        self.mesh = mesh
        self._sharded_step_cache = {}
        # integrated-ATE oracle hook (tests): callable(store, counter) ->
        # (poses_gt (B,7), disps_gt (B,h,w)). When set, update_n/update_lowmem
        # swap the GRU update op for GT-reprojection targets with high
        # confidence, keeping every other stage of the REAL pipeline (edge
        # proposal, BA solve, keyframe culling, loop closure) intact —
        # the reference's eval protocol (src/utils/eval_traj.py:113-195)
        # then must recover the trajectory to sub-cm ATE.
        self.gt_injection = None

        store = state.store
        self.h, self.w = store.disps.shape[-2:]

        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)
        self.ii_bad = np.zeros(0, np.int64)
        self.jj_bad = np.zeros(0, np.int64)
        self.ii_inac = np.zeros(0, np.int64)
        self.jj_inac = np.zeros(0, np.int64)

        self.cap = _next_cap(max_factors if max_factors > 0 else 64)
        self.inac_cap = _next_cap(inac_cap)
        z = lambda *s: jnp.zeros(s)
        self.net = z(self.cap, self.h, self.w, 128)
        self.inp = z(self.cap, self.h, self.w, 128)
        self.target = z(self.cap, self.h, self.w, 2)
        self.weight = z(self.cap, self.h, self.w, 2)
        self.corr_pyr = None  # list of 4 (cap, hw, h2, w2) once edges exist
        self.target_inac = z(self.inac_cap, self.h, self.w, 2)
        self.weight_inac = z(self.inac_cap, self.h, self.w, 2)

        B = store.poses.shape[0]
        self.damping = 1e-6 * jnp.ones((B, self.h, self.w))

    # ------------------------------------------------------------------
    # fixed-capacity storage helpers
    # ------------------------------------------------------------------

    @property
    def E(self) -> int:
        return int(self.ii.shape[0])

    def _grow(self, attr_names, cap_attr, need):
        # volumes are GBs (corr level 0 at cap=96 is 3.6GB for 48x64): grow
        # one array at a time, dropping the old reference before allocating
        # the next, to bound the transient HBM spike to one array's worth
        cap = getattr(self, cap_attr)
        if need <= cap:
            return
        new_cap = _next_cap(need)

        def grown(c):
            return jnp.concatenate(
                [c, jnp.zeros((new_cap - cap,) + c.shape[1:], c.dtype)], 0)

        for name in attr_names:
            a = getattr(self, name)
            if a is None:
                continue
            if isinstance(a, list):
                for k in range(len(a)):
                    a[k] = grown(a[k])      # replace in place, free old
            else:
                setattr(self, name, grown(a))
        setattr(self, cap_attr, new_cap)

    @staticmethod
    def _write(dst, src, offset):
        """Write a bucketed block at a row offset (one static shape per
        (capacity, bucket) pair). Rows past the live count are scratch, so
        overshooting with padding is harmless; caller guarantees
        offset + len(src) <= capacity (dynamic_update_slice clamps). The
        destination is donated — XLA updates the buffer in place instead of
        copying the (potentially multi-GB) array."""
        return _write_donated(dst, src.astype(dst.dtype),
                              jnp.int32(offset))

    def _store_corr_chunked(self, store, ii_p, jj_p, off, chunk=8):
        """Compute + store the corr pyramid for a bucketed edge block in
        `chunk`-edge slices. One full 64-edge bucket's level-0 volume is
        2.4GB in f32 at 48x64 — chunking bounds the build transient to
        chunk/bucket of that, and the pyramid is STORED in bfloat16 (halves
        the multi-GB resident footprint; the 7x7-window lookup upcasts to
        f32 when it bilinearly combines, droid_net input precision is
        unaffected in practice — golden-tested in test_correlation.py)."""
        b = ii_p.shape[0]
        if self.corr_pyr is None:
            self.corr_pyr = [
                jnp.zeros((self.cap, self.h * self.w,
                           self.h // 2 ** k, self.w // 2 ** k), jnp.bfloat16)
                for k in range(4)]
        for s in range(0, b, chunk):
            pyr = correlation.corr_pyramid(store.fmaps[ii_p[s:s + chunk]],
                                           store.fmaps[jj_p[s:s + chunk]])
            for k in range(len(pyr)):
                self.corr_pyr[k] = self._write(self.corr_pyr[k], pyr[k],
                                               off + s)

    def _compact(self, keep_mask):
        """Permutation moving kept rows to the front (full-capacity gather —
        a single static shape regardless of how many rows are removed)."""
        keep_idx = np.where(keep_mask)[0]
        rest = np.where(~keep_mask)[0]
        perm = np.concatenate([keep_idx, rest,
                               np.arange(len(keep_mask), self.cap)])
        permj = jnp.asarray(perm)
        self.net = self.net[permj]
        self.inp = self.inp[permj]
        self.target = self.target[permj]
        self.weight = self.weight[permj]
        if self.corr_pyr is not None:
            for k in range(len(self.corr_pyr)):
                # element-wise replacement frees each old level before the
                # next gather allocates (bounds the transient to one level)
                self.corr_pyr[k] = self.corr_pyr[k][permj]

    # ------------------------------------------------------------------
    # edge management (host)
    # ------------------------------------------------------------------

    def __filter_repeated_edges(self, ii, jj):
        eset = set(zip(self.ii.tolist(), self.jj.tolist())) | set(
            zip(self.ii_inac.tolist(), self.jj_inac.tolist()))
        keep = [k for k, (i, j) in enumerate(zip(ii, jj))
                if (int(i), int(j)) not in eset]
        return ii[keep], jj[keep]

    def add_factors(self, ii, jj, remove=False):
        """factor_graph.py:97-143."""
        ii = np.asarray(ii, np.int64).reshape(-1)
        jj = np.asarray(jj, np.int64).reshape(-1)
        ii, jj = self.__filter_repeated_edges(ii, jj)
        if ii.shape[0] == 0:
            return

        if (self.max_factors > 0
                and self.ii.shape[0] + ii.shape[0] > self.max_factors
                and self.corr_pyr is not None and remove):
            ix = np.argsort(np.argsort(self.age))  # rank by age
            self.rm_factors(ix >= self.max_factors - ii.shape[0], store=True)

        store = self.state.store
        E0 = self.E
        E_new = ii.shape[0]
        b = _bucket(E_new)
        self._grow(("net", "inp", "target", "weight", "corr_pyr"),
                   "cap", E0 + b)
        # pad the new-edge block to its bucket (pad rows land in scratch)
        ii_p = jnp.asarray(np.concatenate(
            [ii, np.full(b - E_new, ii[0], np.int64)]))
        jj_p = jnp.asarray(np.concatenate(
            [jj, np.full(b - E_new, jj[0], np.int64)]))

        off = jnp.int32(E0)
        self.net = self._write(self.net, store.nets[ii_p], off)
        self.inp = self._write(self.inp, store.inps[ii_p], off)

        if self.corr_impl == "volume":
            self._store_corr_chunked(store, ii_p, jj_p, int(E0))

        target, _ = kstore.reproject(store, ii_p, jj_p)
        self.target = self._write(self.target, target, off)
        self.weight = self._write(self.weight, jnp.zeros_like(target), off)

        self.ii = np.concatenate([self.ii, ii])
        self.jj = np.concatenate([self.jj, jj])
        self.age = np.concatenate([self.age, np.zeros_like(ii)])

    def rm_factors(self, mask, store=False):
        mask = np.asarray(mask, bool)
        n_rm = int(mask.sum())
        if n_rm == 0:
            return
        if store:
            rm_idx = np.where(mask)[0]
            b = _bucket(n_rm)
            rm_p = jnp.asarray(np.concatenate(
                [rm_idx, np.full(b - n_rm, rm_idx[0])]))
            I0 = len(self.ii_inac)
            self._grow(("target_inac", "weight_inac"), "inac_cap", I0 + b)
            off = jnp.int32(I0)
            self.target_inac = self._write(self.target_inac,
                                           self.target[rm_p], off)
            self.weight_inac = self._write(self.weight_inac,
                                           self.weight[rm_p], off)
            self.ii_inac = np.concatenate([self.ii_inac, self.ii[mask]])
            self.jj_inac = np.concatenate([self.jj_inac, self.jj[mask]])
        keep = ~mask
        self.ii, self.jj, self.age = (self.ii[keep], self.jj[keep],
                                      self.age[keep])
        self._compact(keep)

    def filter_edges(self):
        """Remove low-confidence long-range edges (factor_graph.py:69-76)."""
        b = _bucket(max(self.E, 1))
        conf = np.asarray(jnp.mean(self.weight[:b], axis=(1, 2, 3)))[:self.E]
        mask = (np.abs(self.ii - self.jj) > 2) & (conf < 0.001)
        self.ii_bad = np.concatenate([self.ii_bad, self.ii[mask]])
        self.jj_bad = np.concatenate([self.jj_bad, self.jj[mask]])
        self.rm_factors(mask, store=False)

    def rm_keyframe(self, ix: int):
        """factor_graph.py:173-215 — shift store + reindex edges."""
        self.state.store = kstore.remove_keyframe(self.state.store, ix)

        m = (self.ii_inac == ix) | (self.jj_inac == ix)
        self.ii_inac = np.where(self.ii_inac >= ix, self.ii_inac - 1,
                                self.ii_inac)
        self.jj_inac = np.where(self.jj_inac >= ix, self.jj_inac - 1,
                                self.jj_inac)
        if m.any():
            keep_idx = np.where(~m)[0]
            rest = np.where(m)[0]
            perm = jnp.asarray(np.concatenate(
                [keep_idx, rest, np.arange(len(m), self.inac_cap)]))
            self.target_inac = self.target_inac[perm]
            self.weight_inac = self.weight_inac[perm]
            self.ii_inac = self.ii_inac[~m]
            self.jj_inac = self.jj_inac[~m]

        m = (self.ii == ix) | (self.jj == ix)
        self.ii = np.where(self.ii >= ix, self.ii - 1, self.ii)
        self.jj = np.where(self.jj >= ix, self.jj - 1, self.jj)
        self.rm_factors(m, store=False)

    # ------------------------------------------------------------------
    # update (jitted core)
    # ------------------------------------------------------------------

    def _padded_edges(self, ii, jj, cap):
        """Pad the live edge id lists to `cap` (host-side, tiny)."""
        E = ii.shape[0]
        pad = cap - E
        iip = np.concatenate([ii, np.zeros(pad, np.int64)])[:cap]
        jjp = np.concatenate([jj, np.zeros(pad, np.int64)])[:cap]
        valid = np.arange(cap) < E
        return iip, jjp, valid

    def update(self, t0=None, t1=None, itrs=2, use_inactive=False,
               motion_only=False):
        return self.update_n(1, t0=t0, t1=t1, itrs=itrs,
                             use_inactive=use_inactive,
                             motion_only=motion_only)

    def update_n(self, n, t0=None, t1=None, itrs=2, use_inactive=False,
                 motion_only=False, eps=0.0):
        """Run `n` graph updates in ONE device dispatch (a jitted
        while_loop), stopping early once the GRU's mean flow correction
        drops below `eps` pixels (eps=0 = fixed n, reference semantics).
        Returns (n_done, delta_mean) as device scalars (NOT pulled — a
        fresh-value D2H read costs ~27 ms over the tunnel)."""
        if self.ii.shape[0] == 0:
            return None
        if self.gt_injection is not None:
            return self._update_n_oracle(n, t0, t1, itrs, use_inactive,
                                         motion_only, eps=eps)
        if self.mesh is not None:
            return self._update_n_sharded(n, t0, t1, itrs, use_inactive,
                                          motion_only)
        store = self.state.store
        F = store.poses.shape[0]

        # floor the active-edge bucket at the steady-state size so the big
        # _update_core program compiles for ONE cap instead of one per
        # growth step during initialization (pad edges are masked anyway)
        floor = min(self.cap,
                    _bucket(self.max_factors) if self.max_factors > 0 else 8)
        cap = _bucket(max(self.ii.shape[0], floor))
        # full-capacity handles; _update_core slices to `cap` inside the jit
        # (an eager [:cap] here would copy the multi-GB corr levels)
        net, inp, target, weight = (self.net, self.inp, self.target,
                                    self.weight)
        c0, c1, c2, c3 = self.corr_pyr
        iip, jjp, valid = self._padded_edges(self.ii, self.jj, cap)

        if use_inactive and self.ii_inac.shape[0] > 0:
            tmin = max(1, int(self.ii.min()) + 1) if t0 is None else t0
            m = (self.ii_inac >= tmin - 3) & (self.jj_inac >= tmin - 3)
        else:
            m = np.zeros(self.ii_inac.shape[0], bool)
        sel = np.where(m)[0]
        # coarse buckets: every new icap value is a fresh _update_core
        # variant (a ~minutes-long remote compile); the inactive rows are
        # only (icap, h, w, 2) targets/weights, so overshooting is cheap
        icap = _bucket(max(len(sel), 1), buckets=(64, 256, 512, 1024))
        sel_p = jnp.asarray(np.concatenate(
            [sel, np.zeros(icap - len(sel), np.int64)]))
        itgt = self.target_inac[sel_p]
        iwgt = self.weight_inac[sel_p]
        iii, ijj, ivalid = self._padded_edges(self.ii_inac[m],
                                              self.jj_inac[m], icap)

        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)
        if t1 is None:
            t1 = max(int(self.ii.max()), int(self.jj.max())) + 1

        # GraphAgg/damping/upsample use a pmax-slot window anchored at
        # frame_base (must cover every active edge's source frame); the BA
        # pose window [t0, t1) uses its own pmax slots.
        frame_base = max(0, t1 - self.pmax)
        # padded-edge group table: active slots first, then inactive slots
        ii_groups = np.concatenate(
            [iip * valid + (1 - valid) * -1, iii * ivalid + (1 - ivalid) * -1])
        groups = jnp.asarray(dba.make_edge_groups(
            ii_groups, F, self.group_degree))

        sh, sw = kstore.slice_hw(*store.mono_disps_up.shape[-2:])
        out = _update_core(
            self.params, store.poses, store.disps, store.disps_up,
            store.intrinsics, store.uncertainties_inv, store.mono_disps,
            store.mono_mask_up[:, sh, sw],
            net, inp, target, weight, c0, c1, c2, c3,
            jnp.asarray(iip), jnp.asarray(jjp), jnp.asarray(valid),
            frame_base,
            itgt, iwgt, jnp.asarray(iii), jnp.asarray(ijj),
            jnp.asarray(ivalid),
            self.damping, groups, t0, t1, jnp.float32(eps),
            n=n, iters=itrs, pmax=self.pmax, motion_only=motion_only,
            metric_depth_reg=self.state.metric_depth_reg,
            uncertainty_aware=self.state.uncertainty_aware, cap=cap)

        # write the bucketed block back into fixed storage (rows >= E are
        # scratch; _update_core keeps pad rows at their input values)
        self.net = self._write(self.net, out.net, jnp.int32(0))
        self.target = self._write(self.target, out.target, jnp.int32(0))
        self.weight = self._write(self.weight, out.weight, jnp.int32(0))
        self.damping = out.damping
        self.state.store = store._replace(
            poses=out.poses, disps=out.disps, disps_up=out.disps_up)
        self.age += n
        return out.n_done, out.delta_mean

    def _oracle_targets(self, ii, jj):
        """GT-reprojection flow targets + high confidence (the oracle GRU
        stub; reference geometry: pops.projective_transform,
        projective_ops.py:110-139)."""
        poses_gt, disps_gt = self.gt_injection(self.state.store,
                                               self.state.counter)
        tgt, _ = projective.projective_transform(
            poses_gt, disps_gt, self.state.store.intrinsics,
            jnp.asarray(ii), jnp.asarray(jj))
        return tgt, jnp.full(tgt.shape, 0.9)

    def _update_n_oracle(self, n, t0, t1, itrs, use_inactive, motion_only,
                         eps=0.0):
        """update_n with the GRU swapped for GT-reprojection targets; every
        other stage (inactive-edge reuse, damping, the REAL kstore.ba solve)
        is the production path. eps > 0 early-exits once the mean remaining
        flow residual |target - reproject| over active edges drops below eps
        px — the oracle analogue of _update_core's GRU-delta convergence
        gate (scripts/ab_update_eps.py qualifies the knob here)."""
        store = self.state.store
        F = store.poses.shape[0]
        b = _bucket(max(self.E, 1))
        iip, jjp, valid = self._padded_edges(self.ii, self.jj, b)
        tgt, wgt = self._oracle_targets(iip, jjp)
        self.target = self._write(self.target, tgt, jnp.int32(0))
        self.weight = self._write(self.weight, wgt, jnp.int32(0))

        if use_inactive and self.ii_inac.shape[0] > 0:
            tmin = max(1, int(self.ii.min()) + 1) if t0 is None else t0
            m = (self.ii_inac >= tmin - 3) & (self.jj_inac >= tmin - 3)
        else:
            m = np.zeros(self.ii_inac.shape[0], bool)
        sel = np.where(m)[0]
        icap = _bucket(max(len(sel), 1), buckets=(64, 256, 512, 1024))
        sel_p = jnp.asarray(np.concatenate(
            [sel, np.zeros(icap - len(sel), np.int64)]))
        itgt = self.target_inac[sel_p]
        iwgt = self.weight_inac[sel_p]
        iii, ijj, ivalid = self._padded_edges(self.ii_inac[m],
                                              self.jj_inac[m], icap)
        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)
        if t1 is None:
            t1 = max(int(self.ii.max()), int(self.jj.max())) + 1
        ii_all = np.concatenate([iip * valid + (1 - valid) * -1,
                                 iii * ivalid + (1 - ivalid) * -1])
        groups = jnp.asarray(dba.make_edge_groups(ii_all, F,
                                                  self.group_degree))
        eta = 0.2 * self.damping + EP_DAMP
        tgt_all = jnp.concatenate([tgt, itgt])
        wgt_all = jnp.concatenate([wgt, iwgt])
        iiv = jnp.asarray(np.concatenate([iip, iii]))
        jjv = jnp.asarray(np.concatenate([jjp, ijj]))
        vv = jnp.asarray(np.concatenate([valid, ivalid]))
        n_done = 0
        for _ in range(n):
            if eps > 0:
                coords1, _ = kstore.reproject(
                    self.state.store, jnp.asarray(iip), jnp.asarray(jjp))
                res = jnp.linalg.norm(tgt - coords1, axis=-1)
                dm = float((res * valid[:, None, None]).sum()
                           / (valid.sum() * res.shape[1] * res.shape[2]))
                if n_done > 0 and dm < eps:
                    break
            self.state.store = kstore.ba(
                self.state.store, tgt_all, wgt_all, eta, iiv, jjv, vv,
                groups, t0, t1, iters=itrs, motion_only=motion_only,
                metric_depth_reg=self.state.metric_depth_reg,
                uncertainty_aware=self.state.uncertainty_aware,
                pmax=self.pmax)
            n_done += 1
        # keep disps_up in sync (mapper/eval consumers): plain bilinear
        # upsample of the window frames (the oracle has no learned upmask)
        fb = max(0, t1 - self.pmax)
        frames = jnp.clip(fb + jnp.arange(self.pmax), 0, F - 1)
        up = jax.image.resize(
            self.state.store.disps[frames],
            (self.pmax,) + self.state.store.disps_up.shape[-2:], "bilinear")
        self.state.store = self.state.store._replace(
            disps_up=self.state.store.disps_up.at[frames].set(up))
        self.age += n_done
        return jnp.int32(n_done), jnp.float32(0.0)

    def _update_n_sharded(self, n, t0, t1, itrs, use_inactive, motion_only):
        """Mesh-mode update_n: n edge-sharded track steps over the device
        mesh (parallel/sharded_track.py — GRU/corr local per edge shard, one
        psum'd DBA pose system per GN iteration). Numerically matches
        _update_core (tests/test_multichip.py). Host-side gathers reshuffle
        the edge state into device-major order per call — fine for the
        CPU-mesh validation path; a resident device-major layout is the
        optimization when real multi-chip hardware is available."""
        from ..parallel import sharded_dba, sharded_track

        store = self.state.store
        F = store.poses.shape[0]
        D = self.mesh.devices.size
        E = self.E

        if use_inactive and self.ii_inac.shape[0] > 0:
            tmin = max(1, int(self.ii.min()) + 1) if t0 is None else t0
            m = (self.ii_inac >= tmin - 3) & (self.jj_inac >= tmin - 3)
        else:
            m = np.zeros(self.ii_inac.shape[0], bool)
        sel = np.where(m)[0]
        ii_all = np.concatenate([self.ii, self.ii_inac[m]])
        jj_all = np.concatenate([self.jj, self.jj_inac[m]])

        if t0 is None:
            t0 = max(1, int(self.ii.min()) + 1)
        if t1 is None:
            t1 = max(int(self.ii.max()), int(self.jj.max())) + 1
        frame_base = max(0, t1 - self.pmax)

        meta = sharded_dba.shard_edges_by_frame(
            ii_all, jj_all, D, F, self.group_degree,
            e_cap=_bucket(max(1, int(np.max(np.bincount(
                (ii_all % D) if len(ii_all) else np.zeros(1, np.int64),
                minlength=D))))))
        e_cap = meta["e_cap"]

        # concatenated edge state (actives from fixed storage; BA-only
        # inactives carry stored target/weight + zero GRU state)
        h, w = self.h, self.w
        zcorr = [jnp.zeros((len(sel),) + tuple(c.shape[1:]), c.dtype)
                 for c in self.corr_pyr]
        net_all = jnp.concatenate(
            [self.net[:E], jnp.zeros((len(sel), h, w, 128))])
        inp_all = store.inps[jnp.asarray(np.clip(ii_all, 0, F - 1))]
        tgt_all = jnp.concatenate([self.target[:E],
                                   self.target_inac[jnp.asarray(sel)]
                                   if len(sel) else
                                   jnp.zeros((0, h, w, 2))])
        wgt_all = jnp.concatenate([self.weight[:E],
                                   self.weight_inac[jnp.asarray(sel)]
                                   if len(sel) else
                                   jnp.zeros((0, h, w, 2))])
        corr_all = [jnp.concatenate([c[:E], z])
                    for c, z in zip(self.corr_pyr, zcorr)]
        gru_flag = np.concatenate([np.ones(E, bool),
                                   np.zeros(len(sel), bool)])
        valid_flag = np.ones(len(ii_all), bool)

        gathered = sharded_dba.gather_edges(
            [net_all, inp_all, tgt_all, wgt_all, *corr_all,
             jnp.asarray(ii_all), jnp.asarray(jj_all),
             jnp.asarray(valid_flag), jnp.asarray(gru_flag)], meta["perm"])
        (netv, inpv, tgtv, wgtv, c0, c1, c2, c3, iiv, jjv, vv, gv) = gathered
        vv = vv & jnp.asarray(meta["valid"].reshape(-1))
        gv = gv & vv

        key = (F, h, w, e_cap, self.pmax, itrs,
               self.state.metric_depth_reg, self.state.uncertainty_aware)
        fn = self._sharded_step_cache.get(key)
        if fn is None:
            fn = sharded_track.make_sharded_track_step(
                self.mesh, F, (h, w), e_cap, self.pmax,
                degree=self.group_degree, axis=self.mesh.axis_names[0],
                iters=itrs,
                metric_depth_reg=self.state.metric_depth_reg,
                uncertainty_aware=self.state.uncertainty_aware)
            self._sharded_step_cache[key] = fn

        sh, sw = kstore.slice_hw(*store.mono_disps_up.shape[-2:])
        poses, disps, disps_up, damping = (store.poses, store.disps,
                                           store.disps_up, self.damping)
        for _ in range(n):
            (netv, tgtv, wgtv, damping, poses, disps, disps_up) = fn(
                self.params, poses, disps, disps_up, store.intrinsics,
                store.uncertainties_inv, store.mono_disps,
                store.mono_mask_up[:, sh, sw],
                netv, inpv, tgtv, wgtv, c0, c1, c2, c3, iiv, jjv, vv, gv,
                jnp.int32(frame_base), damping,
                jnp.asarray(meta["groups"]), jnp.asarray(meta["owner"]),
                jnp.int32(t0), jnp.int32(t1))

        # scatter ACTIVE rows back into fixed-capacity storage
        flat_perm = meta["perm"].reshape(-1)
        flat_ok = meta["valid"].reshape(-1) & (flat_perm < E)
        wr = jnp.asarray(np.where(flat_ok, flat_perm, self.cap))
        self.net = self.net.at[wr].set(netv, mode="drop")
        self.target = self.target.at[wr].set(tgtv, mode="drop")
        self.weight = self.weight.at[wr].set(wgtv, mode="drop")
        self.damping = damping
        self.state.store = store._replace(poses=poses, disps=disps,
                                          disps_up=disps_up)
        self.age += n
        return jnp.int32(n), jnp.float32(jnp.nan)

    def update_lowmem(self, t0=None, t1=None, itrs=2, steps=8,
                      chunk_frames=8, pmax=None):
        """Global BA with on-the-fly correlation (factor_graph.py:266-311).

        Per step: recompute reprojections, run the GRU over edges in chunks
        of `chunk_frames` source frames with alt_corr (no volumes), then one
        full-window DBA with lm=1e-5, ep=1e-2."""
        if self.ii.shape[0] == 0:
            return
        store = self.state.store
        F = store.poses.shape[0]
        if t1 is None:
            t1 = max(int(self.ii.max()), int(self.jj.max())) + 1
        if t0 is None:
            t0 = 1
        if pmax is None:
            pmax = _bucket(t1 - t0 + 1)

        if self.gt_injection is not None:
            # oracle variant: GT-reprojection targets, REAL full-window BA
            cap = _bucket(self.ii.shape[0])
            iip, jjp, valid = self._padded_edges(self.ii, self.jj, cap)
            tgt, wgt = self._oracle_targets(iip, jjp)
            self.target = self._write(self.target, tgt, jnp.int32(0))
            self.weight = self._write(self.weight, wgt, jnp.int32(0))
            ii_groups = iip * valid + (1 - valid) * -1
            groups = jnp.asarray(dba.make_edge_groups(
                ii_groups, F, self.group_degree))
            eta = 0.2 * self.damping + EP_DAMP
            for _ in range(steps):
                self.state.store = kstore.ba(
                    self.state.store, tgt, wgt, eta, jnp.asarray(iip),
                    jnp.asarray(jjp), jnp.asarray(valid), groups, t0, t1,
                    iters=itrs, lm=1e-5, ep=1e-2,
                    metric_depth_reg=self.state.metric_depth_reg,
                    uncertainty_aware=self.state.uncertainty_aware,
                    pmax=pmax)
            return

        # chunk descriptors (fixed across steps: edge topology is constant
        # inside update_lowmem) — everything padded so ONE jitted step
        # program serves the whole loop
        jmax = int(self.jj.max())
        chunk_rows = []
        for i0 in range(0, jmax + 1, chunk_frames):
            sel = np.where((self.ii >= i0) & (self.ii < i0 + chunk_frames))[0]
            if len(sel):
                chunk_rows.append(sel)
        if not chunk_rows:
            return
        pmax_c = min(chunk_frames * 2, pmax)
        cap_c = _bucket(max(len(s) for s in chunk_rows))
        C = len(chunk_rows)
        big = self.net.shape[0] + 1  # pad row index: clipped reads, dropped
        sel_mat = np.full((C, cap_c), big, np.int32)
        ii_mat = np.zeros((C, cap_c), np.int32)
        jj_mat = np.zeros((C, cap_c), np.int32)
        valid_mat = np.zeros((C, cap_c), bool)
        fb_vec = np.zeros((C,), np.int32)
        for c, sel in enumerate(chunk_rows):
            sel_mat[c, : len(sel)] = sel
            ii_mat[c, : len(sel)] = self.ii[sel]
            jj_mat[c, : len(sel)] = self.jj[sel]
            valid_mat[c, : len(sel)] = True
            fb_vec[c] = max(0, int(self.ii[sel].min()))

        cap_all = _bucket(self.ii.shape[0])
        iip, jjp, valid = self._padded_edges(self.ii, self.jj, cap_all)
        ii_groups = iip * valid + (1 - valid) * -1
        groups = jnp.asarray(dba.make_edge_groups(
            ii_groups, F, self.group_degree))
        fcap = min(_bucket(t1), F)
        args_np = (jnp.asarray(sel_mat), jnp.asarray(ii_mat),
                   jnp.asarray(jj_mat), jnp.asarray(valid_mat),
                   jnp.asarray(fb_vec), jnp.asarray(iip), jnp.asarray(jjp),
                   jnp.asarray(valid), groups)

        for _ in range(steps):
            with TIMER.phase("track.lowmem.step"):
                (self.state.store, self.net, self.target, self.weight,
                 self.damping) = _lowmem_step_core(
                    self.params, self.state.store, self.net, self.target,
                    self.weight, self.damping, *args_np, t0, t1,
                    fcap=fcap, pmax_c=pmax_c, iters=itrs, pmax=pmax,
                    motion_only=False,
                    metric_depth_reg=self.state.metric_depth_reg,
                    uncertainty_aware=self.state.uncertainty_aware)

    def clear_edges(self):
        """Drop all live edges (storage stays allocated — rows become
        scratch; corr volumes are reset so a fresh add_factors rebuilds)."""
        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)
        self.corr_pyr = None

    def adopt_edges(self, other):
        """Seed this graph with another graph's live edges (backend.loop_ba
        copying the frontend's local graph, backend.py:96-104). Device
        blocks are written into this graph's fixed storage; corr volumes are
        not copied (loop graphs use the alt on-the-fly correlation)."""
        self.ii = other.ii.copy()
        self.jj = other.jj.copy()
        self.age = other.age.copy()
        E = self.E
        if E == 0:
            return
        self._grow(("net", "inp", "target", "weight", "corr_pyr"),
                   "cap", E)
        b = _bucket(E)
        off = jnp.int32(0)
        self.net = self._write(self.net, other.net[:b], off)
        self.inp = self._write(self.inp, other.inp[:b], off)
        self.target = self._write(self.target, other.target[:b], off)
        self.weight = self._write(self.weight, other.weight[:b], off)

    def restore_edge_state(self, net, inp, target, weight, target_inac,
                           weight_inac):
        """Load live-row edge state (checkpoint resume): writes the given
        (E, ...) blocks into fixed-capacity storage and rebuilds corr
        volumes from the store's fmaps."""
        E = self.E
        self._grow(("net", "inp", "target", "weight", "corr_pyr"),
                   "cap", E)
        b = _bucket(max(E, 1))

        def blk(a):
            a = jnp.asarray(a)
            pad = b - a.shape[0]
            if pad > 0:
                a = jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
            return a[:b]

        self.net = self._write(self.net, blk(net), jnp.int32(0))
        self.inp = self._write(self.inp, blk(inp), jnp.int32(0))
        self.target = self._write(self.target, blk(target), jnp.int32(0))
        self.weight = self._write(self.weight, blk(weight), jnp.int32(0))

        I = len(self.ii_inac)
        self._grow(("target_inac", "weight_inac"), "inac_cap", I)
        if I > 0:
            bi = _bucket(I)

            def blki(a):
                a = jnp.asarray(a)
                pad = bi - a.shape[0]
                if pad > 0:
                    a = jnp.concatenate(
                        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
                return a[:bi]

            self.target_inac = self._write(self.target_inac,
                                           blki(target_inac), jnp.int32(0))
            self.weight_inac = self._write(self.weight_inac,
                                           blki(weight_inac), jnp.int32(0))

        if E > 0 and self.corr_impl == "volume":
            iip, jjp, _ = self._padded_edges(self.ii, self.jj, b)
            self._store_corr_chunked(self.state.store, jnp.asarray(iip),
                                     jnp.asarray(jjp), 0)

    # ------------------------------------------------------------------
    # edge proposal (host, numpy — mirrors reference logic)
    # ------------------------------------------------------------------

    def add_neighborhood_factors(self, t0, t1, r=3):
        ii, jj = np.meshgrid(np.arange(t0, t1), np.arange(t0, t1),
                             indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        keep = (np.abs(ii - jj) > 0) & (np.abs(ii - jj) <= r)
        self.add_factors(ii[keep], jj[keep])

    def _distance_matrix(self, ii, jj, beta):
        """Bucketed + chunked frame-distance evaluation: buckets bound the
        number of (slow, remote) compiles to 4 shapes; the 4096-pair chunk
        bounds the (pairs, h, w, 4) flow intermediates to ~200MB even for
        full-buffer proposal grids (350^2 pairs)."""
        store = self.state.store
        n = len(ii)
        out = np.empty(n, np.float32)
        CH = 4096
        for s in range(0, n, CH):
            e = min(n, s + CH)
            b = _bucket(e - s, buckets=(64, 256, 1024, 4096))
            iip = np.concatenate([ii[s:e], np.zeros(b - (e - s), ii.dtype)])
            jjp = np.concatenate([jj[s:e], np.zeros(b - (e - s), jj.dtype)])
            d = kstore.distance(store, self.state.counter, jnp.asarray(iip),
                                jnp.asarray(jjp), beta=beta)
            out[s:e] = np.asarray(d[: e - s])
        return out

    def add_proximity_factors(self, t0=0, t1=0, rad=2, nms=2, beta=0.25,
                              thresh=16.0, remove=False):
        """factor_graph.py:325-385 (host numpy transcription)."""
        t = self.state.counter
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        if len(ix) == 0 or len(jx) == 0:
            return
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)

        d = self._distance_matrix(ii, jj, beta)
        d[ii - rad < jj] = np.inf
        d[d > 100] = np.inf

        ii1 = np.concatenate([self.ii, self.ii_bad, self.ii_inac])
        jj1 = np.concatenate([self.jj, self.jj_bad, self.jj_inac])
        for i, j in zip(ii1, jj1):
            for di in range(-nms, nms + 1):
                for dj in range(-nms, nms + 1):
                    if abs(di) + abs(dj) <= max(min(abs(i - j) - 2, nms), 0):
                        i1, j1 = i + di, j + dj
                        if (t0 <= i1 < t) and (t1 <= j1 < t):
                            d[(i1 - t0) * (t - t1) + (j1 - t1)] = np.inf

        es = []
        for i in range(t0, t):
            for j in range(max(i - rad - 1, 0), i):
                es.append((i, j))
                es.append((j, i))
                d[(i - t0) * (t - t1) + (j - t1)] = np.inf

        for k in np.argsort(d):
            if d[k] > thresh:
                continue
            if len(es) > self.max_factors:
                break
            i, j = int(ii[k]), int(jj[k])
            es.append((i, j))
            es.append((j, i))
            for di in range(-nms, nms + 1):
                for dj in range(-nms, nms + 1):
                    if abs(di) + abs(dj) <= max(min(abs(i - j) - 2, nms), 0):
                        i1, j1 = i + di, j + dj
                        if (t0 <= i1 < t) and (t1 <= j1 < t):
                            d[(i1 - t0) * (t - t1) + (j1 - t1)] = np.inf

        if es:
            ii_new, jj_new = np.array(es).T
            self.add_factors(ii_new, jj_new, remove)

    def add_backend_proximity_factors(self, t_start, t_end, nms, radius,
                                      thresh, max_factors, beta,
                                      t_start_loop=None, loop=False):
        """factor_graph.py:388-465."""
        if t_start_loop is None or not loop:
            t_start_loop = t_start
        ilen = t_end - t_start_loop
        jlen = t_end - t_start
        ix = np.arange(t_start_loop, t_end)
        jx = np.arange(t_start, t_end)
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)

        d = self._distance_matrix(ii, jj, beta)
        rawd = d.copy().reshape(ilen, jlen)
        d[ii - radius < jj] = np.inf
        d[d > thresh] = np.inf
        d = d.reshape(ilen, jlen)

        es = []
        for i in range(t_start_loop, t_end):
            for j in range(max(i - radius - 1, 0), i):
                es.append((i, j))
                es.append((j, i))
                d[i - t_start_loop, j - t_start] = np.inf

        vals = np.sort(d.reshape(-1))
        order = np.argsort(d.reshape(-1))
        order = order[vals <= thresh]

        loop_edges = 0
        n_neighboring = 1
        for k in order.tolist():
            di, dj = k // jlen, k % jlen
            if d[di, dj] > thresh:
                continue
            if len(es) > max_factors:
                break
            i, j = int(ii[k]), int(jj[k])
            if loop:
                sub_es = []
                for si in range(max(i - n_neighboring, t_start_loop),
                                min(i + n_neighboring + 1, t_end)):
                    for sj in range(max(j - n_neighboring, t_start),
                                    min(j + n_neighboring + 1, t_end)):
                        if rawd[si - t_start_loop, sj - t_start] <= thresh:
                            if si != sj and si - sj > 20:
                                sub_es.append((si, sj))
                es += sub_es
                loop_edges += len(sub_es)
            else:
                es.append((i, j))
                es.append((j, i))
            d[max(0, di - nms):min(ilen, di + nms + 1),
              max(0, dj - nms):min(jlen, dj + nms + 1)] = np.inf

        if len(es) < 3 or (loop and loop_edges == 0):
            return 0
        ii_new, jj_new = np.array(es).T
        self.add_factors(ii_new, jj_new, remove=True)
        return len(self.ii)
