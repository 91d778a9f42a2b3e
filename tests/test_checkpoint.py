"""Checkpoint/resume roundtrip test on a live SLAM system."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wildgs_slam_tpu.config import load_config
from wildgs_slam_tpu.models import droid_net
from wildgs_slam_tpu.slam import gaussian_map as gm
from wildgs_slam_tpu.slam.mapper import Mapper
from wildgs_slam_tpu.slam.state import SlamState
from wildgs_slam_tpu.utils import checkpoint as ckpt

HT, WD = 56, 56


class FakeSlam:
    """Minimal object with the attributes checkpoint.py serializes."""

    def __init__(self, state, mapper, frontend_t1, initialized):
        self.state = state
        self.mapper = mapper

        class F:
            t1 = frontend_t1
            is_initialized = initialized

        self.frontend = F()


def build(cfg, seed):
    intr = np.array([50.0, 50.0, WD / 2, HT / 2])
    state = SlamState.create(cfg, HT, WD, intr, buffer=8)
    from wildgs_slam_tpu.slam import keyframe_store as kstore
    from wildgs_slam_tpu.ops import lie

    rng = np.random.RandomState(seed)
    for i in range(3):
        state.store = kstore.append(
            state.store, i, float(i),
            pose=lie.se3_exp(jnp.asarray(0.01 * rng.randn(6))),
            disp=jnp.full((HT // 8, WD // 8), 0.5),
            mono_depth_up=jnp.full((HT, WD), 2.0))
        state.append_host(
            i, rng.rand(HT, WD, 3).astype(np.float32),
            rng.rand(HT // 14, WD // 14, 384).astype(np.float32), float(i))
    mapper = Mapper(state, cfg, rng_seed=seed)
    return state, mapper


def test_checkpoint_roundtrip(tmp_path):
    cfg = load_config("configs/wildgs_slam.yaml")
    cfg["mapping"]["Training"]["init_itr_num"] = 10
    cfg["mapping"]["Training"]["window_size"] = 4
    cfg["mapping"]["gaussian_capacity"] = 4096
    cfg["mapping"]["render_list_capacity"] = 256
    cfg["tracking"]["buffer"] = 8

    state, mapper = build(cfg, 0)
    mapper.initialize_mapper(2)
    slam = FakeSlam(state, mapper, frontend_t1=3, initialized=True)
    path = str(tmp_path / "ckpt.npz")
    ckpt.save_slam_checkpoint(path, slam)

    # fresh system, different seed -> different initial state
    state2, mapper2 = build(cfg, 7)
    slam2 = FakeSlam(state2, mapper2, frontend_t1=0, initialized=False)
    ckpt.load_slam_checkpoint(path, slam2)

    assert slam2.state.counter == state.counter
    assert slam2.frontend.t1 == 3 and slam2.frontend.is_initialized
    assert mapper2.iteration_count == mapper.iteration_count
    assert mapper2.current_window == mapper.current_window
    np.testing.assert_array_equal(np.asarray(mapper2.gaussians.params.xyz),
                                  np.asarray(mapper.gaussians.params.xyz))
    np.testing.assert_array_equal(np.asarray(mapper2.gaussians.aux.alive),
                                  np.asarray(mapper.gaussians.aux.alive))
    np.testing.assert_array_equal(
        np.asarray(slam2.state.store.poses), np.asarray(state.store.poses))
    # MLP params + optimizer state restored
    a = jax.tree.leaves(mapper.uncer_params)
    b = jax.tree.leaves(mapper2.uncer_params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert int(mapper2.uncer_count) == int(mapper.uncer_count)

    # resumed mapper can continue optimizing
    mapper2.map_opt_online(mapper2.current_window, iters=3)
    assert mapper2.iteration_count == mapper.iteration_count + 3
