"""Pair-packed implicit-GEMM K-Net chain (ops/pallas/conv3d_pair.py).

Oracle: models/knet.KNet (Flax), itself oracle-parity-tested against the
reference KV_NET_BASIC forward (basic.py:53-139). Kernels run in interpret
mode on the CPU test backend.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import neuralrgbd_tpu.ops.pallas.conv3d_pair as cp
from neuralrgbd_tpu.models.knet import KNet


@pytest.fixture(autouse=True)
def _interpret():
    cp.INTERPRET = True
    yield
    cp.INTERPRET = False


def _setup(D=6, H=8, W=12, Cin=16, seed=0):
    rng = np.random.RandomState(seed)
    vol = jnp.asarray(rng.randn(D, H, W, Cin).astype(np.float32) * 0.5)
    knet = KNet(feature_dim=64)
    params = knet.init(jax.random.PRNGKey(seed), vol[None])
    return vol, knet, params


def test_pack_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 8, 12, 64).astype(np.float32))
    z = cp.pack_dense(x)
    back = cp.unpack_dense(z, 8, 12)
    np.testing.assert_allclose(np.asarray(back, np.float32),
                               np.asarray(x.astype(jnp.bfloat16),
                                          np.float32))


def test_dense_to_xp2_layout():
    """xp2[p, m] must hold padded voxels (2m, 2m+1) where padded voxel
    v = dense voxel r + WP + 1 (left/top pad of 1, depth pad of 1)."""
    H, W = 8, 12
    WP, P2, RU2 = cp._geom(H, W)
    rng = np.random.RandomState(2)
    x = rng.randn(3, H, W, 64).astype(np.float32)
    z = cp.pack_dense(jnp.asarray(x))
    xp2 = np.asarray(cp.dense_to_xp2(z, H, W), np.float32)
    zn = np.asarray(z, np.float32)

    # padded voxel array, built directly
    vox = np.zeros((3 + 2, RU2 * 2, 64), np.float32)
    dense_vox = zn.reshape(3, P2 * 2, 64)
    for p in range(3):
        vox[p + 1, WP + 1:WP + 1 + P2 * 2] = dense_vox[p]
    want = vox.reshape(5, RU2, 128)
    np.testing.assert_array_equal(xp2, want)


def test_single_layer_matches_xla_conv():
    rng = np.random.RandomState(3)
    D, H, W = 6, 8, 12
    x = jnp.asarray(rng.randn(D, H, W, 64).astype(np.float32) * 0.5
                    ).astype(jnp.bfloat16)
    w = jnp.asarray((rng.randn(3, 3, 3, 64, 64) * 0.05).astype(np.float32))
    z = cp.pack_dense(x.astype(jnp.float32))
    xp2 = cp.dense_to_xp2(z, H, W)
    zc, stats = cp.conv_pair_layer(xp2, cp.pack_weights(w), H, W,
                                   interpret=True)
    got = np.asarray(cp.unpack_dense(zc, H, W), np.float32)
    ref = np.asarray(jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32), w, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0])
    # bf16 output cast is the only error source
    np.testing.assert_allclose(got, ref, atol=4e-2, rtol=1e-2)
    # in-kernel BN moments: sum/sumsq over the valid voxels
    ssum = np.asarray(stats[0, :64] + stats[0, 64:])
    np.testing.assert_allclose(ssum, ref.sum((0, 1, 2)), rtol=2e-2,
                               atol=2e-1)


def test_full_chain_matches_oracle_to_bf16_class():
    """The chain must sit in the SAME numeric class as a bf16 XLA K-Net:
    its deviation from the fp32 oracle may not exceed 2x the bf16 XLA
    oracle's own deviation."""
    vol, knet, params = _setup()
    want32 = np.asarray(knet.apply(params, vol[None])[0])
    want16 = np.asarray(
        KNet(feature_dim=64, dtype=jnp.bfloat16).apply(params, vol[None])[0],
        np.float32)
    got = np.asarray(cp.knet_fast_apply(params["params"], vol), np.float32)
    bf16_dev = np.abs(want16 - want32).max()
    fast_dev = np.abs(got - want32).max()
    assert fast_dev < 2.0 * bf16_dev + 1e-3, (fast_dev, bf16_dev)
    # and strong overall agreement
    rel = fast_dev / (np.abs(want32).max() + 1e-6)
    assert rel < 0.05, rel


def test_kvnet_fast_flag_routes_through_chain(monkeypatch):
    """KVNet(fast_knet=True) must produce the chain's output (and create
    the identical param tree at init)."""
    from neuralrgbd_tpu.config import ModelConfig
    from neuralrgbd_tpu.data.synthetic import synthetic_batch
    from neuralrgbd_tpu.infer.step import make_infer_step
    from neuralrgbd_tpu.train import create_train_state
    from neuralrgbd_tpu.config import TrainConfig

    cfg = ModelConfig(ndepth=8, d_min=0.5, d_max=4.0, infer_dtype=None)
    batch, _ = synthetic_batch(cfg, n_lanes=1, img_hw=(32, 48), seed=0)
    state = create_train_state(cfg, TrainConfig(), batch)
    b = {k: jnp.asarray(batch[k])
         for k in ("ref", "srcs", "poses", "K", "pose_next")}
    bvp = jnp.full((1, 8, 8, 12), -np.log(8.0), jnp.float32)
    valid = jnp.ones((1,), bool)

    slow = make_infer_step(cfg, fast_sweep=False, fast_knet=False)
    fast = make_infer_step(cfg, fast_sweep=False, fast_knet=True)
    o_slow = slow(state.params, b, bvp, valid)
    # the step donates its bv_predict argument: fresh buffer per call
    o_fast = fast(state.params, b,
                  jnp.full((1, 8, 8, 12), -np.log(8.0), jnp.float32), valid)
    d_slow = np.asarray(o_slow.depth)
    d_fast = np.asarray(o_fast.depth)
    assert np.isfinite(d_fast).all()
    # bf16-class agreement on the final depth
    assert np.abs(d_fast - d_slow).mean() < 0.05
