"""Paired-lane K-Net (models/knet_paired.py).

Oracle: models/knet.KNet (Flax), itself oracle-parity-tested against the
reference KV_NET_BASIC forward (basic.py:53-139). Unlike the Pallas chain,
the paired-lane formulation is EXACT conv semantics (summation order only)
and differentiable, so parity bounds here are fp32-tight and a gradient
test rides along.
"""

import numpy as np

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.models.knet import KNet
from neuralrgbd_tpu.models.knet_paired import (
    knet_paired_apply, pack_kernel_pairs)


def _setup(D=6, H=8, W=12, Cin=16, seed=0):
    rng = np.random.RandomState(seed)
    vol = jnp.asarray(rng.randn(D, H, W, Cin).astype(np.float32) * 0.5)
    knet = KNet(feature_dim=64)
    params = knet.init(jax.random.PRNGKey(seed), vol[None])
    return vol, knet, params


def test_packed_conv_equals_unpacked():
    """The structured-sparse packed kernel computes the identical conv:
    pack(x) * pack(w) == pack(x * w) for zero-padded 3x3x3 convs."""
    rng = np.random.RandomState(1)
    D, H, W, Ci, Co = 4, 6, 10, 16, 24
    x = jnp.asarray(rng.randn(D, H, W, Ci).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, Ci, Co).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x[None], w, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]
    xp = x.reshape(D, H, W // 2, 2 * Ci)
    got = jax.lax.conv_general_dilated(
        xp[None], pack_kernel_pairs(w), (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]
    got = got.reshape(D, H, W, Co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_full_knet_matches_oracle_fp32():
    vol, knet, params = _setup()
    want = np.asarray(knet.apply(params, vol[None])[0])
    got = np.asarray(
        knet_paired_apply(params["params"], vol, dtype=jnp.float32))
    # only summation order differs (conv exact; BN moments folded per lane
    # half) => fp32-roundoff-class agreement
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-4)
    assert np.abs(got - want).mean() < 2e-5


def test_paired_knet_is_differentiable_and_grads_match():
    vol, knet, params = _setup(D=4, H=6, W=8)

    def loss_native(p, v):
        return jnp.sum(jnp.square(knet.apply(p, v[None])[0]))

    def loss_paired(p, v):
        return jnp.sum(jnp.square(
            knet_paired_apply(p["params"], v, dtype=jnp.float32)))

    g_n = jax.grad(loss_native, argnums=1)(params, vol)
    g_p = jax.grad(loss_paired, argnums=1)(params, vol)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_n),
                               rtol=5e-2, atol=5e-4)


def test_kvnet_paired_flag_routes_and_matches():
    """KVNet(paired_knet=True) must match the native path at fp32."""
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

    base = make_infer_step(cfg, fast_sweep=False, paired_knet=False)
    paired = make_infer_step(cfg, fast_sweep=False, paired_knet=True)
    o_base = base(state.params, b, bvp(), valid)
    o_paired = paired(state.params, b, bvp(), valid)
    np.testing.assert_allclose(np.asarray(o_paired.depth),
                               np.asarray(o_base.depth),
                               rtol=1e-3, atol=1e-3)
    # the recurrence carry must match too (it feeds every later frame)
    np.testing.assert_allclose(np.asarray(o_paired.bv_predict),
                               np.asarray(o_base.bv_predict),
                               rtol=1e-3, atol=1e-3)
