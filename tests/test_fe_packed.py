"""Packed-lane feature extractor (models/fe_packed.py).

Oracle: models/feature_extractor.FeatureExtractor (Flax), itself
oracle-parity-tested against the reference PSM backbone. The packed
formulation is exact conv semantics (summation order only), so fp32
parity bounds are roundoff-tight.
"""

import numpy as np

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.models.feature_extractor import FeatureExtractor
from neuralrgbd_tpu.models.fe_packed import (
    fe_packed_apply, pack_kernel_general)


def _conv_ref(x, w, stride=1, dilation=1, k=3):
    pad = dilation * (k // 2)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad),) * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv_packed_ref(x, w, p_in, p_out, stride=1, dilation=1, k=3):
    B, H, W, Ci = x.shape
    xp = x.reshape(B, H, W // p_in, p_in * Ci)
    kp, sp, pw = pack_kernel_general(w, p_in, p_out, stride, dilation)
    pad_h = dilation * (k // 2)
    y = jax.lax.conv_general_dilated(
        xp, kp, (stride, sp), ((pad_h, pad_h), pw),
        rhs_dilation=(dilation, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    Co = w.shape[-1]
    Bh, Hh, Wp = y.shape[:3]
    return y.reshape(Bh, Hh, Wp, p_out, Co).reshape(Bh, Hh, Wp * p_out, Co)


def test_pack_kernel_general_cases():
    """Every (P_in, P_out, stride, dilation) combination the packed FE uses
    must reproduce the pixel-space conv exactly."""
    rng = np.random.RandomState(0)
    cases = [
        # (p_in, p_out, stride, dilation, k, Ci, Co, H, W)
        (4, 4, 2, 1, 3, 3, 32, 32, 48),    # first0
        (4, 4, 1, 1, 3, 32, 32, 16, 24),   # first1/2, layer1
        (4, 2, 2, 1, 3, 32, 64, 16, 24),   # layer2 entry
        (2, 2, 1, 1, 3, 64, 64, 8, 12),    # layer2 body
        (4, 2, 2, 1, 1, 32, 64, 16, 24),   # layer2 downsample 1x1
        (2, 2, 1, 2, 3, 16, 16, 8, 16),    # dilation-2 (unused but supported)
    ]
    for p_in, p_out, stride, dil, k, Ci, Co, H, W in cases:
        x = jnp.asarray(rng.randn(2, H, W, Ci).astype(np.float32))
        w = jnp.asarray(rng.randn(k, k, Ci, Co).astype(np.float32) * 0.1)
        ref = _conv_ref(x, w, stride, dil, k)
        got = _conv_packed_ref(x, w, p_in, p_out, stride, dil, k)
        assert got.shape == ref.shape, (got.shape, ref.shape,
                                        (p_in, p_out, stride, dil, k))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5,
            err_msg=str((p_in, p_out, stride, dil, k)))


def test_full_fe_matches_oracle_fp32():
    rng = np.random.RandomState(1)
    frames = jnp.asarray(rng.randn(5, 64, 96, 3).astype(np.float32))
    fe = FeatureExtractor(feature_dim=64, multi_scale=True)
    params = fe.init(jax.random.PRNGKey(0), frames)
    l1_ref, f_ref = fe.apply(params, frames)
    l1, f = fe_packed_apply(params["params"], frames, feature_dim=64,
                            dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l1_ref),
                               rtol=2e-2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               rtol=2e-2, atol=1e-3)
    assert np.abs(np.asarray(f) - np.asarray(f_ref)).mean() < 1e-4


def test_fe_packed_grads_match():
    """Gradient parity holds with the centered BN variance (the flax
    formulation). The one-pass E[x^2]-m^2 variant's VJP amplifies the
    moment cancellation and is inference-only — see fe_packed.ONE_PASS_BN."""
    import neuralrgbd_tpu.models.fe_packed as fp

    rng = np.random.RandomState(2)
    frames = jnp.asarray(rng.randn(3, 32, 48, 3).astype(np.float32))
    fe = FeatureExtractor(feature_dim=32, multi_scale=True)
    params = fe.init(jax.random.PRNGKey(0), frames)

    def loss_native(v):
        l1, f = fe.apply(params, v)
        return jnp.sum(jnp.square(f)) + jnp.sum(jnp.square(l1))

    def loss_packed(v):
        l1, f = fe_packed_apply(params["params"], v, feature_dim=32,
                                dtype=jnp.float32)
        return jnp.sum(jnp.square(f)) + jnp.sum(jnp.square(l1))

    g_n = jax.grad(loss_native)(frames)
    old = fp.ONE_PASS_BN
    fp.ONE_PASS_BN = False
    try:
        g_p = jax.grad(loss_packed)(frames)
    finally:
        fp.ONE_PASS_BN = old
    g_n, g_p = np.asarray(g_n), np.asarray(g_p)
    scale = np.abs(g_n).max()
    assert np.abs(g_p - g_n).max() < 1e-3 * scale, (
        np.abs(g_p - g_n).max(), scale)


def test_kvnet_packed_fe_flag_routes_and_matches():
    from neuralrgbd_tpu.config import ModelConfig, TrainConfig
    from neuralrgbd_tpu.data.synthetic import synthetic_batch
    from neuralrgbd_tpu.infer.step import make_infer_step
    from neuralrgbd_tpu.train import create_train_state

    cfg = ModelConfig(ndepth=8, d_min=0.5, d_max=4.0, infer_dtype=None)
    batch, _ = synthetic_batch(cfg, n_lanes=1, img_hw=(32, 48), seed=0)
    state = create_train_state(cfg, TrainConfig(), batch)
    b = {k: jnp.asarray(batch[k])
         for k in ("ref", "srcs", "poses", "K", "pose_next")}
    valid = jnp.ones((1,), bool)

    def bvp():
        return jnp.full((1, 8, 8, 12), -np.log(8.0), jnp.float32)

    base = make_infer_step(cfg, fast_sweep=False, paired_knet=False,
                           packed_fe=False)
    packed = make_infer_step(cfg, fast_sweep=False, paired_knet=False,
                             packed_fe=True)
    o_base = base(state.params, b, bvp(), valid)
    o_packed = packed(state.params, b, bvp(), valid)
    np.testing.assert_allclose(np.asarray(o_packed.depth),
                               np.asarray(o_base.depth),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(o_packed.bv_predict),
                               np.asarray(o_base.bv_predict),
                               rtol=1e-3, atol=1e-3)
