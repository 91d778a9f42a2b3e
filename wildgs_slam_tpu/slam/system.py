"""SLAM system: single-controller orchestration of tracking + mapping.

Replaces the reference's 4-process architecture (src/slam.py:24-316 +
src/tracker.py:31-88 pipe rendezvous): because the reference's tracker and
mapper run LOCK-STEP anyway (tracker blocks on pipe.recv() per keyframe,
SURVEY §3.5), a single host loop calling track/map steps in order is
behaviorally identical — and deletes the pipes, locks, busy-wait barriers
and shared-memory tensors. The uncertainty MLP coupling becomes a plain
parameter handoff: the mapper trains it; the frontend reads it through
`uncertainty_update_fn` before every BA (slam.py:52-57 + depth_video
uncertainties_inv).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import save_config
from ..models import droid_net
from ..models.uncertainty import UncertaintyMLP
from ..ops import lie
from ..utils import eval_traj
from ..utils.datasets import RGB_NoPose
from ..utils.printer import PRINTER, FontColor
from ..utils.profiling import TIMER
from . import gaussian_map as gm
from . import keyframe_store as kstore
from .backend import Backend
from .frontend import Frontend
from .mapper import Mapper
from .motion_filter import MotionFilter
from .state import SlamState
from .trajectory_filler import PoseTrajectoryFiller


class SLAM:
    def __init__(self, cfg, stream, depth_fn=None, feat_fn=None,
                 droid_params=None):
        """depth_fn/feat_fn: mono-prior predictors (image -> depth / DINO
        features); see models/priors.py for the built-in ones."""
        self.cfg = cfg
        self.stream = stream
        self.save_dir = os.path.join(cfg["data"]["output"],
                                     str(cfg.get("scene", "scene")))
        os.makedirs(self.save_dir, exist_ok=True)
        save_config(cfg, os.path.join(self.save_dir, "cfg.yaml"))

        ht, wd = cfg["cam"]["H_out"], cfg["cam"]["W_out"]
        intr = np.array(stream.intrinsic, np.float64)

        self.uncertainty_aware = cfg["tracking"]["uncertainty_params"][
            "activate"]
        if self.uncertainty_aware and not cfg["mapping"][
                "uncertainty_params"]["activate"]:
            raise ValueError(
                "if we use uncertainty-aware tracking, we must enable "
                "uncertainty-aware mapping (slam.py:58-61)")

        # detect-anomaly mode (torch set_detect_anomaly analogue): nan debug
        # + finite checks at phase boundaries (utils/debug.py)
        from ..utils import debug as _debug

        _debug.maybe_enable_from_cfg(cfg)
        self._debug = _debug

        self.state = SlamState.create(
            cfg, ht, wd, intr, buffer=cfg["tracking"]["buffer"],
            uncertainty_aware=self.uncertainty_aware,
            metric_depth_reg=cfg["tracking"]["backend"]["metric_depth_reg"])

        # pause/resume/stop/checkpoint control channel (the reference's
        # Packet_vis2main queue, src/gui/gui_utils.py:86-190); HTTP endpoint
        # auto-enabled with the GUI so the live page's buttons work
        from ..gui.control import ControlChannel

        http_port = cfg.get("gui_http_port",
                            0 if cfg.get("gui", False) else None)
        self.control = ControlChannel(self.save_dir, http_port=http_port)
        cfg["_gui_http_port"] = self.control.http_port

        # DROID network weights
        if droid_params is None:
            ckpt = cfg["tracking"].get("pretrained")
            if ckpt and os.path.exists(ckpt):
                droid_params = droid_net.load_droid_checkpoint(ckpt)
            else:
                PRINTER.print(f"WARNING: droid checkpoint {ckpt} not found — "
                              "using random weights (tracking quality will "
                              "suffer)", FontColor.ERROR)
                droid_params = droid_net.init_droid_params(
                    jax.random.PRNGKey(0), ht, wd)
        self.droid_params = droid_params

        # stage-4 mesh mode: cfg parallel.n_devices > 1 (or run.py --mesh N)
        # builds a device mesh and routes tracking updates through the
        # edge-sharded track step and mapping optimization through the
        # gaussian-sharded rasterizer + sharded Adam (SURVEY §7 stage 4;
        # the reference is strictly single-GPU, SURVEY §2.4)
        self.mesh = None
        n_dev = int(cfg.get("parallel", {}).get("n_devices", 0) or 0)
        if n_dev > 1:
            from ..parallel.mesh import make_mesh

            if jax.device_count() < n_dev:
                raise ValueError(
                    f"parallel.n_devices={n_dev} but only "
                    f"{jax.device_count()} devices visible")
            self.mesh = make_mesh(n_dev, axis="g")
            PRINTER.print(f"mesh mode: {n_dev} devices "
                          f"({jax.default_backend()})", FontColor.INFO)

        self.mapper = Mapper(self.state, cfg,
                             rng_seed=cfg.get("setup_seed", 43),
                             mesh=self.mesh)

        mlp = UncertaintyMLP(
            in_dim=cfg["mapping"]["uncertainty_params"]["feature_dim"])
        train_frac = cfg["mapping"]["uncertainty_params"]["train_frac_fix"]

        from functools import partial as _partial

        @_partial(jax.jit, static_argnames=("nb",))
        def _uncer_core(uncer_params, store, feats_full, idx, nb):
            # slice inside the jit: an eager dynamic_slice on the 500MB
            # feature mirror is a separate tunnel op per call
            return kstore.update_uncertainties(
                store, lambda f: mlp.apply(uncer_params, f), feats_full[:nb],
                idx, train_frac)

        # incremental device mirror of the (append-mostly) DINO features:
        # re-uploading dino_feats[:nb] before EVERY BA cost ~48 MB of H2D
        # per frame over the tunnel; now only NEW keyframes upload (and a
        # full refresh after keyframe removals, tracked via state.host_gen)
        self._dino_cache = {"gen": -1, "n": 0, "dev": None}

        def uncertainty_update():
            """Refresh BA uncertainty weights. Runs before every BA, so the
            frame count is bucketed (8-frame steps; pad rows write-dropped)
            to keep the remote-compile count bounded — an arange(counter)
            here recompiled the whole MLP+resize chain every keyframe."""
            if not self.uncertainty_aware or self.state.counter == 0:
                return
            n = self.state.counter
            B = self.state.dino_feats.shape[0]
            nb = 8
            while nb < n:
                nb *= 2   # coarse ladder: one compile per doubling
            nb = min(B, nb)
            c = self._dino_cache
            if c["dev"] is None:
                c["dev"] = jnp.zeros(self.state.dino_feats.shape, jnp.float32)
            lo = 0 if c["gen"] != self.state.host_gen else min(c["n"], n)
            # per-row 1-frame updates: the common case uploads exactly the
            # new keyframe (one ~0.7 MB transfer + one cached tiny program);
            # the full refresh after a keyframe removal replays n rows
            for r in range(lo, n):
                c["dev"] = c["dev"].at[r].set(
                    jnp.asarray(self.state.dino_feats[r]))
            c["gen"], c["n"] = self.state.host_gen, n
            idx = np.where(np.arange(nb) < n, np.arange(nb), B)
            self.state.store = _uncer_core(
                self.mapper.uncer_params, self.state.store, c["dev"],
                jnp.asarray(idx), nb=nb)

        self.uncertainty_update = uncertainty_update
        self.backend = Backend(self.state, droid_params, cfg,
                               uncertainty_update_fn=uncertainty_update)
        self.frontend = Frontend(self.state, droid_params, cfg,
                                 backend=self.backend,
                                 uncertainty_update_fn=uncertainty_update,
                                 mesh=self.mesh)
        self.feat_fn = feat_fn
        self.motion_filter = MotionFilter(
            self.state, droid_params,
            thresh=cfg["tracking"]["motion_filter"]["thresh"],
            force_keyframe_every_n_frames=cfg["tracking"][
                "force_keyframe_every_n_frames"],
            depth_fn=depth_fn, feat_fn=feat_fn)
        self.traj_filler = PoseTrajectoryFiller(
            self.state, droid_params, feat_fn=feat_fn,
            uncer_apply=(lambda f: UncertaintyMLP(
                in_dim=cfg["mapping"]["uncertainty_params"]["feature_dim"]
            ).apply(self.mapper.uncer_params, f))
            if self.uncertainty_aware else None,
            train_frac_fix=cfg["mapping"]["uncertainty_params"][
                "train_frac_fix"])

        self.ba_freq = cfg["tracking"]["backend"]["ba_freq"]
        self.enable_online_ba = cfg["tracking"]["frontend"][
            "enable_online_ba"]

    # ------------------------------------------------------------------

    def run(self, resume_path=None):
        """Main loop (tracker.py:31-88 + mapper pipe handoff, inlined).

        resume_path: restore a checkpoint written by a previous run and
        continue from the frame after it (no reference counterpart — the
        reference cannot resume a partial run, SURVEY §5)."""
        cfg = self.cfg
        stride = cfg.get("stride", 1)
        max_frames = cfg.get("max_frames", -1)
        n_frames = len(self.stream) if max_frames < 0 else min(
            len(self.stream), max_frames)

        PRINTER.configure(total_frames=len(range(0, n_frames, stride)),
                          verbose=cfg.get("verbose", True))
        PRINTER.pbar_ready()

        prev_kf_idx = 0
        prev_ba_idx = 0
        start_i = 0
        ckpt_every = int(cfg.get("checkpoint_every", 0))
        ckpt_path = os.path.join(self.save_dir, "checkpoint.npz")
        if resume_path:
            from ..utils import checkpoint as ckpt

            loop_state = ckpt.load_slam_checkpoint(resume_path, self)
            start_i = loop_state.get("next_frame", 0)
            prev_kf_idx = loop_state.get("prev_kf_idx", 0)
            prev_ba_idx = loop_state.get("prev_ba_idx", 0)
            PRINTER.print(f"resumed from {resume_path}: frame {start_i}, "
                          f"{self.state.counter} keyframes", FontColor.INFO)
        t_start = time.time()

        for i in range(start_i, n_frames, stride):
            cmd = self.control.poll()
            if cmd["stop"]:
                PRINTER.print(f"stop requested at frame {i}", FontColor.INFO)
                break
            if cmd["pause"]:
                PRINTER.print(f"paused at frame {i} (control channel)",
                              FontColor.INFO)
                self.control.wait_if_paused()
                PRINTER.print("resumed", FontColor.INFO)
            if self.control.consume_checkpoint_request():
                from ..utils import checkpoint as ckpt

                ckpt.save_slam_checkpoint(
                    ckpt_path, self,
                    loop_state=dict(next_frame=i, prev_kf_idx=prev_kf_idx,
                                    prev_ba_idx=prev_ba_idx))
                PRINTER.print(f"checkpoint saved (control channel) -> "
                              f"{ckpt_path}", FontColor.INFO)

            with TIMER.phase("data.load"):
                timestamp, image, _, _ = self.stream[i]
            starting_count = self.state.counter
            with TIMER.phase("track.motion_filter"):
                force = self.motion_filter.track(float(timestamp), image)
            with TIMER.phase("track.frontend"):
                self.frontend(force)
            self._debug.anomaly_check(
                "track.frontend", self.state.store.poses,
                self.state.store.disps)
            curr_kf_idx = self.state.counter - 1

            if curr_kf_idx != prev_kf_idx and self.frontend.is_initialized:
                if self.state.counter == self.frontend.warmup:
                    # initialization handoff (tracker.py:64-70)
                    with TIMER.phase("map.initialize"):
                        self.mapper.initialize_mapper(curr_kf_idx)
                    self.frontend.initialize_second_stage()
                else:
                    if (self.enable_online_ba
                            and curr_kf_idx >= prev_ba_idx + self.ba_freq):
                        with TIMER.phase("track.online_global_ba"):
                            self.backend.dense_ba(2)
                        prev_ba_idx = curr_kf_idx
                    with TIMER.phase("map.keyframe"):
                        self.mapper.on_keyframe(curr_kf_idx, int(timestamp))
                    self._debug.anomaly_check(
                        "map.keyframe", self.mapper.gaussians.params)
            new_kf = curr_kf_idx != prev_kf_idx
            prev_kf_idx = curr_kf_idx
            PRINTER.update_pbar(1)

            if (ckpt_every > 0 and new_kf and self.frontend.is_initialized
                    and self.state.counter % ckpt_every == 0):
                from ..utils import checkpoint as ckpt

                with TIMER.phase("checkpoint.save"):
                    ckpt.save_slam_checkpoint(
                        ckpt_path, self,
                        loop_state=dict(next_frame=i + stride,
                                        prev_kf_idx=prev_kf_idx,
                                        prev_ba_idx=prev_ba_idx))

        self.terminate()
        PRINTER.terminate()
        PRINTER.print(f"done in {time.time() - t_start:.1f}s, "
                      f"{self.state.counter} keyframes", FontColor.TRACKER)

    # ------------------------------------------------------------------

    def final_ba(self):
        """Final global BA with metric-depth regularization disabled
        (slam.py:131-145)."""
        was = self.state.metric_depth_reg
        self.state.metric_depth_reg = False
        self.backend.dense_ba(7)
        self.backend.dense_ba(12)
        self.state.metric_depth_reg = was

    def save_video(self, path):
        """poses/disps/timestamps npz (depth_video.py:494-511)."""
        n = self.state.counter
        store = self.state.store
        np.savez(
            path,
            timestamps=np.asarray(store.timestamp[:n]),
            poses=np.asarray(store.poses[:n]),
            disps=np.asarray(store.disps[:n]),
            disps_up=np.asarray(store.disps_up[:n]),
            mono_disps=np.asarray(store.mono_disps[:n]),
            valid_depth_masks=np.asarray(store.valid_depth_mask[:n]),
        )

    def kf_traj_eval(self, out_prefix):
        """Keyframe-trajectory ATE vs stream GT (eval_traj.py:113-140)."""
        n = self.state.counter
        ts = np.asarray(self.state.store.timestamp[:n]).astype(int)
        est_w2c = np.asarray(self.state.store.poses[:n])
        est_c2w = np.asarray(lie.se3_matrix(
            lie.se3_inv(jnp.asarray(est_w2c))))
        gt = []
        for t in ts:
            _, _, _, pose = self.stream[int(t)]
            gt.append(pose if pose is not None else np.full((4, 4), np.nan))
        gt = np.stack(gt)
        stats = eval_traj.evaluate_ate(est_c2w, gt)
        eval_traj.save_traj_tum(out_prefix + "_est.txt", ts, est_c2w)
        eval_traj.write_metrics(out_prefix + "_metrics.txt", stats,
                                label="keyframe trajectory ATE")
        eval_traj.plot_trajectory(
            out_prefix + "_plot.png",
            eval_traj.poses_c2w_to_xyz(est_c2w[np.isfinite(
                gt.reshape(len(gt), -1)).all(1)]),
            eval_traj.poses_c2w_to_xyz(gt[np.isfinite(
                gt.reshape(len(gt), -1)).all(1)]), stats)
        return stats

    def full_traj_eval(self, out_prefix):
        """Fill non-keyframe poses + evaluate (eval_traj.py:143-195)."""
        stride = self.cfg.get("stride", 1)
        poses_w2c = self.traj_filler(self.stream, stride=stride)
        if not self.cfg.get("fast_mode"):
            # render-based refinement of every interpolated pose against the
            # map (eval_traj.py:151-159; skipped in fast_mode — "time-
            # consuming with minimal tracking improvement")
            with TIMER.phase("final.nonkf_pose_refine"):
                poses_w2c = self._refine_full_traj(poses_w2c, stride)
        # keyframe poses are authoritative, refined or not
        # (eval_traj.py:161-164 — the overwrite is OUTSIDE the fast_mode
        # gate in the reference)
        poses_w2c = np.array(poses_w2c, copy=True)
        n = self.state.counter
        ts = np.asarray(self.state.store.timestamp[:n]).astype(int)
        pos = ts // stride
        ok = (ts % stride == 0) & (pos < len(poses_w2c))
        poses_w2c[pos[ok]] = np.asarray(self.state.store.poses[:n])[ok]
        est_c2w = np.asarray(lie.se3_matrix(
            lie.se3_inv(jnp.asarray(poses_w2c))))
        ts = np.arange(len(est_c2w))
        gt = []
        for i in range(0, len(self.stream), self.cfg.get("stride", 1)):
            _, _, _, pose = self.stream[i]
            gt.append(pose if pose is not None else np.full((4, 4), np.nan))
        gt = np.stack(gt)[: len(est_c2w)]
        stats = eval_traj.evaluate_ate(est_c2w, gt)
        eval_traj.save_traj_tum(out_prefix + "_est.txt", ts, est_c2w)
        eval_traj.write_metrics(out_prefix + "_metrics.txt", stats,
                                label="full trajectory ATE")
        return stats

    def _refine_full_traj(self, poses_w2c, stride):
        """Per-frame MonoGS-style pose refinement against the final map
        (eval_traj.py:151-159). Per-frame DINO features are reused from the
        trajectory filler's pass over the same stream when available (the
        reference's traj_filler returns dino_feats for exactly this,
        eval_traj.py:144-155) — recomputing a real DINOv2 forward per frame
        would double the terminate-phase prior cost."""
        poses = np.array(poses_w2c, copy=True)
        frames = list(range(0, len(self.stream), stride))[: len(poses)]
        cached = getattr(self.traj_filler, "last_features", None)
        for k, i in enumerate(frames):
            _, image, _, _ = self.stream[i]
            if not (self.uncertainty_aware and self.feat_fn is not None):
                feats = None
            elif cached is not None and k < len(cached) \
                    and cached[k] is not None:
                feats = cached[k]
            else:
                feats = self.feat_fn(image)
            w2c = self.mapper.refine_pose_non_key_frame(
                image, poses[k], features=feats)
            poses[k] = np.asarray(w2c)
        return poses

    def terminate(self):
        """Final pipeline (slam.py:147-225)."""
        cfg = self.cfg
        os.makedirs(os.path.join(self.save_dir, "traj"), exist_ok=True)
        has_gt = not isinstance(self.stream, RGB_NoPose) and \
            self.stream.poses is not None

        if cfg["tracking"]["backend"]["final_ba"]:
            with TIMER.phase("final.global_ba"):
                self.final_ba()

        self.save_video(os.path.join(self.save_dir, "video.npz"))

        if cfg.get("eval_depth_l1", False) and has_gt:
            # Splat-SLAM depth-L1 protocol (depth_video.py:514-563; disabled
            # upstream, optional here)
            from ..utils.eval_depth import eval_depth_l1

            try:
                l1, l1_4m, cov = eval_depth_l1(
                    self.state.store, self.state.counter, self.stream)
                msg = (f"depth L1: {l1:.4f} m, depth L1 (<4m): {l1_4m:.4f} m,"
                       f" mask coverage: {cov:.3f}")
                PRINTER.print(msg, FontColor.EVAL)
                with open(os.path.join(self.save_dir, "traj",
                                       "depth_l1.txt"), "w") as f:
                    f.write(msg + "\n")
            except Exception as e:
                PRINTER.print(f"depth L1 eval failed: {e}", FontColor.ERROR)

        if has_gt:
            try:
                stats = self.kf_traj_eval(
                    os.path.join(self.save_dir, "traj", "kf_traj"))
                PRINTER.print(f"keyframe ATE-RMSE: {stats['rmse']*100:.2f} cm",
                              FontColor.EVAL)
            except Exception as e:
                PRINTER.print(f"kf eval failed: {e}", FontColor.ERROR)

        if cfg["tracking"]["backend"]["final_ba"]:
            iters = cfg["mapping"]["final_refine_iters"]
            if cfg.get("fast_mode"):
                iters = min(iters, 3000)  # slam.py run_utils fast-mode cap
            with TIMER.phase("final.refine"):
                self.mapper.final_refine(iters=iters)

        if has_gt:
            try:
                stats = self.full_traj_eval(
                    os.path.join(self.save_dir, "traj", "full_traj"))
                PRINTER.print(f"full ATE-RMSE: {stats['rmse']*100:.2f} cm",
                              FontColor.EVAL)
            except Exception as e:
                PRINTER.print(f"full traj eval failed: {e}", FontColor.ERROR)

        n = gm.save_ply(self.mapper.gaussians,
                        os.path.join(self.save_dir, "final_gs.ply"))
        PRINTER.print(f"saved {n} gaussians", FontColor.PCL)
        try:
            from ..gui.html_viewer import export_viewer_from_map

            export_viewer_from_map(
                os.path.join(self.save_dir, "map_viewer.html"),
                self.mapper.gaussians)
        except Exception as e:
            PRINTER.print(f"viewer export failed: {e}", FontColor.ERROR)

        if self.uncertainty_aware:
            import pickle
            with open(os.path.join(self.save_dir,
                                   "uncertainty_mlp_weight.pkl"), "wb") as f:
                pickle.dump(
                    jax.tree.map(np.asarray, self.mapper.uncer_params), f)

        # per-phase timing table (profiling is first-class, SURVEY §5)
        TIMER.write(os.path.join(self.save_dir, "profile.txt"))
        if cfg.get("verbose", True):
            PRINTER.print("phase timings:\n" + TIMER.report(), FontColor.INFO)
        self.control.close()
