"""Coarse-D K-Net fast path (ModelConfig.knet_coarse_d).

The deviation: run the K-Net gain at D/cd on the align-corners-downsampled
input volume and upsample the gain back along D (the reference's own
trilinear D-upsample mechanism, basic.py:128-139, ported at
models/knet.py up_sample_ratio and parity-tested in
tests/test_knet_upsample_d.py). Exact reference semantics at
knet_coarse_d=1 (default).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.data.synthetic import synthetic_batch
from neuralrgbd_tpu.infer.step import make_infer_step
from neuralrgbd_tpu.train import create_train_state


def _setup(knet_coarse_d=1, ndepth=8):
    cfg = ModelConfig(ndepth=ndepth, d_min=0.5, d_max=4.0, infer_dtype=None,
                      knet_coarse_d=knet_coarse_d)
    batch, _ = synthetic_batch(cfg, n_lanes=1, img_hw=(32, 48), seed=0)
    state = create_train_state(cfg, TrainConfig(), batch)
    b = {k: jnp.asarray(batch[k])
         for k in ("ref", "srcs", "poses", "K", "pose_next")}
    return cfg, state, b


def _bvp(ndepth=8):
    return jnp.full((1, ndepth, 8, 12), -np.log(float(ndepth)), jnp.float32)


def test_coarse_knet_runs_and_deviates():
    cfg, state, b = _setup()
    valid = jnp.ones((1,), bool)
    exact = make_infer_step(cfg, fast_sweep=False)
    coarse = make_infer_step(cfg, fast_sweep=False, coarse_knet=2)
    o_e = exact(state.params, b, _bvp(), valid)
    o_c = coarse(state.params, b, _bvp(), valid)
    assert o_c.depth.shape == o_e.depth.shape
    assert o_c.bv_predict.shape == o_e.bv_predict.shape
    for f in o_c:
        assert np.isfinite(np.asarray(f)).all()
    # log-DPV invariant holds on the coarse path
    assert float(jnp.max(o_c.dpv)) <= 1e-5
    # it is a deviation: the fused posterior must actually differ
    assert float(jnp.abs(o_c.dpv - o_e.dpv).max()) > 1e-6


def test_coarse_knet_first_frame_matches_exact():
    """With bv_valid=False the K-Net branch is discarded (dpv == bv_cur), so
    coarse and exact paths must agree bit-for-bit."""
    cfg, state, b = _setup()
    invalid = jnp.zeros((1,), bool)
    exact = make_infer_step(cfg, fast_sweep=False)
    coarse = make_infer_step(cfg, fast_sweep=False, coarse_knet=2)
    o_e = exact(state.params, b, _bvp(), invalid)
    o_c = coarse(state.params, b, _bvp(), invalid)
    np.testing.assert_array_equal(np.asarray(o_c.dpv), np.asarray(o_e.dpv))
    np.testing.assert_array_equal(np.asarray(o_c.depth),
                                  np.asarray(o_e.depth))


def test_coarse_knet_composes_with_paired():
    """paired_knet computes the identical convs on the identical coarse
    volume — fp32 roundoff-class agreement with the native coarse path."""
    cfg, state, b = _setup()
    valid = jnp.ones((1,), bool)
    native = make_infer_step(cfg, fast_sweep=False, coarse_knet=2,
                             paired_knet=False)
    paired = make_infer_step(cfg, fast_sweep=False, coarse_knet=2,
                             paired_knet=True)
    o_n = native(state.params, b, _bvp(), valid)
    o_p = paired(state.params, b, _bvp(), valid)
    np.testing.assert_allclose(np.asarray(o_p.depth), np.asarray(o_n.depth),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(o_p.bv_predict),
                               np.asarray(o_n.bv_predict),
                               rtol=1e-3, atol=1e-3)


def test_coarse_knet_d4_runs_and_deviates():
    """cd=4 (K-Net at D/4): same invariants as cd=2 — the round-5 bench arm.
    Uses ndepth=16 so the K-Net's two stride-2 D-downsamples see D>=4."""
    cfg, state, b = _setup(ndepth=16)
    valid = jnp.ones((1,), bool)
    exact = make_infer_step(cfg, fast_sweep=False)
    c2 = make_infer_step(cfg, fast_sweep=False, coarse_knet=2)
    c4 = make_infer_step(cfg, fast_sweep=False, coarse_knet=4)
    o_e = exact(state.params, b, _bvp(16), valid)
    o_2 = c2(state.params, b, _bvp(16), valid)
    o_4 = c4(state.params, b, _bvp(16), valid)
    for f in o_4:
        assert np.isfinite(np.asarray(f)).all()
    assert float(jnp.max(o_4.dpv)) <= 1e-5
    # deviates from exact AND from cd=2 (a genuinely different arm)
    assert float(jnp.abs(o_4.dpv - o_e.dpv).max()) > 1e-6
    assert float(jnp.abs(o_4.dpv - o_2.dpv).max()) > 1e-6
    assert o_4.depth.shape == o_e.depth.shape


def test_coarse_knet_must_divide_ndepth():
    cfg, state, b = _setup()
    valid = jnp.ones((1,), bool)
    step = make_infer_step(cfg, fast_sweep=False, coarse_knet=3, jit=False)
    with pytest.raises(ValueError, match="must divide"):
        step(state.params, b, _bvp(), valid)


def test_coarse_knet_trains():
    """The coarse path is differentiable end to end (fine-tuning support):
    one train step at knet_coarse_d=2 produces finite loss and updates."""
    from neuralrgbd_tpu.train import make_train_step

    cfg = ModelConfig(ndepth=8, d_min=0.5, d_max=4.0, infer_dtype=None,
                      knet_coarse_d=2)
    batch, _ = synthetic_batch(cfg, n_lanes=1, img_hw=(32, 48), seed=1)
    batch = jax.tree.map(jnp.asarray, batch)
    tcfg = TrainConfig(lr=1e-4)
    state = create_train_state(cfg, tcfg, batch)
    train_step = make_train_step(cfg, tcfg)
    out = train_step(state, batch, _bvp(), jnp.ones((1,), bool),
                     jax.random.PRNGKey(0))
    assert np.isfinite(float(out.loss))
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(out.state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
