"""Multi-device DP tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.data import synthetic_batch
from neuralrgbd_tpu.parallel import (
    make_mesh,
    make_sharded_infer_step,
    make_sharded_train_step,
    shard_batch,
)
from neuralrgbd_tpu.train import create_train_state, make_train_step

CFG = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                  d_min=0.5, d_max=4.0)
TCFG = TrainConfig(lr=1e-4)
IMG_HW = (32, 48)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def _batch(n):
    b, _ = synthetic_batch(CFG, n_lanes=n, img_hw=IMG_HW, seed=0)
    return b


def _bvp(n):
    h, w = IMG_HW[0] // 4, IMG_HW[1] // 4
    return np.full((n, CFG.ndepth, h, w), -np.log(CFG.ndepth), np.float32)


def test_sharded_train_step_runs(mesh):
    batch = _batch(8)
    state = create_train_state(CFG, TCFG, batch)
    step = make_sharded_train_step(CFG, TCFG, mesh)
    sb = shard_batch(batch, mesh)
    bvp = shard_batch(_bvp(8), mesh)
    valid = shard_batch(np.zeros(8, bool), mesh)
    out = step(state, sb, bvp, valid, jax.random.PRNGKey(0))
    assert np.isfinite(float(out.loss))
    assert out.bv_predict.shape == (8, CFG.ndepth, 8, 12)
    # params replicated, identical on all devices
    leaf = jax.tree.leaves(out.state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_dp_matches_single_device(mesh):
    """8-lane DP gradient step == the same step computed unsharded."""
    batch = _batch(8)
    state = create_train_state(CFG, TCFG, batch)

    ref_step = make_train_step(CFG, TCFG)
    ref_out = ref_step(state, jax.tree.map(jnp.asarray, batch),
                       jnp.asarray(_bvp(8)), jnp.zeros(8, bool),
                       jax.random.PRNGKey(0))

    dp_step = make_sharded_train_step(CFG, TCFG, mesh)
    dp_out = dp_step(state, shard_batch(batch, mesh),
                     shard_batch(_bvp(8), mesh),
                     shard_batch(np.zeros(8, bool), mesh),
                     jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(dp_out.loss), float(ref_out.loss),
                               rtol=1e-4)
    p_ref = jax.tree.leaves(ref_out.state.params)[0]
    p_dp = jax.tree.leaves(dp_out.state.params)[0]
    np.testing.assert_allclose(np.asarray(p_dp), np.asarray(p_ref),
                               rtol=1e-4, atol=1e-6)


def test_sharded_infer_step_runs(mesh):
    batch = _batch(8)
    state = create_train_state(CFG, TCFG, batch)
    infer = make_sharded_infer_step(CFG, mesh)
    ib = {k: batch[k] for k in ("ref", "srcs", "poses", "K", "pose_next")}
    out = infer(state.params, shard_batch(ib, mesh),
                shard_batch(_bvp(8), mesh),
                shard_batch(np.zeros(8, bool), mesh))
    assert out.depth.shape == (8, *IMG_HW)
    assert np.isfinite(np.asarray(out.depth)).all()
