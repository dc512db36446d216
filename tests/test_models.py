"""Shape, parameter-count, and invariant tests for the network modules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig
from neuralrgbd_tpu.models import FeatureExtractor, KNet, KVNet, RNet
from neuralrgbd_tpu.ops.camera import camera_from_K

# small operating point for fast tests: image 64x48, DPV 16x12, D=8
CFG = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                  d_min=0.5, d_max=4.0)
H, W = 48, 64
h, w = H // 4, W // 4
V = CFG.n_views
D = CFG.ndepth


def _cam():
    K = np.array(
        [[w / 2 / np.tan(np.radians(30)), 0, w / 2],
         [0, h / 2 / np.tan(np.radians(24)), h / 2],
         [0, 0, 1]],
        np.float32,
    )
    return camera_from_K(K)


def test_feature_extractor_shapes(rng):
    fe = FeatureExtractor(feature_dim=16, multi_scale=True)
    x = jnp.asarray(rng.randn(5, H, W, 3).astype(np.float32))
    params = fe.init(jax.random.PRNGKey(0), x)
    layer1, feat = fe.apply(params, x)
    assert layer1.shape == (5, H // 2, W // 2, 32)
    assert feat.shape == (5, H // 4, W // 4, 16)
    assert np.isfinite(np.asarray(feat)).all()


def test_feature_extractor_param_count():
    """Reference layer inventory: firstconv(3) + 3+16+3+3 blocks + 4 branches
    + lastconv(2). Spot-check total conv params exist and BN affine pairs."""
    fe = FeatureExtractor(feature_dim=16)
    x = jnp.zeros((1, H, W, 3))
    params = fe.init(jax.random.PRNGKey(0), x)
    leaves = jax.tree_util.tree_leaves_with_path(params)
    names = {jax.tree_util.keystr(p) for p, _ in leaves}
    assert any("layer2_15" in n for n in names)   # 16 blocks in layer2
    assert any("branch3" in n for n in names)
    n_params = sum(np.prod(v.shape) for _, v in leaves)
    assert n_params > 1e5


def test_knet_shapes(rng):
    knet = KNet(feature_dim=16)
    vol = jnp.asarray(rng.randn(1, D, h, w, CFG.kvnet_in_channels).astype(np.float32))
    params = knet.init(jax.random.PRNGKey(0), vol)
    out = knet.apply(params, vol)
    assert out.shape == (1, D, h, w)
    assert np.isfinite(np.asarray(out)).all()


def test_rnet_shapes_and_normalization(rng):
    rnet = RNet(D=D)
    dpv = jax.nn.softmax(jnp.asarray(rng.randn(1, h, w, D).astype(np.float32)), -1)
    f0 = jnp.asarray(rng.randn(1, h, w, 16).astype(np.float32))
    f1 = jnp.asarray(rng.randn(1, 2 * h, 2 * w, 32).astype(np.float32))
    img = jnp.asarray(rng.randn(1, 4 * h, 4 * w, 3).astype(np.float32))
    params = rnet.init(jax.random.PRNGKey(0), dpv, f0, f1, img)
    out = rnet.apply(params, dpv, f0, f1, img)
    assert out.shape == (1, H, W, D)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, atol=1e-4)


@pytest.fixture(scope="module")
def kvnet_setup():
    rng = np.random.RandomState(0)
    model = KVNet(cfg=CFG)
    ref = jnp.asarray(rng.randn(H, W, 3).astype(np.float32))
    srcs = jnp.asarray(rng.randn(V, H, W, 3).astype(np.float32))
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (V, 1, 1))
    poses = poses.at[:, 0, 3].set(jnp.asarray([-0.1, -0.05, 0.05, 0.1]))
    d_candi = jnp.asarray(CFG.d_candi)
    bvp = jnp.full((D, h, w), -np.log(D), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), ref, srcs, poses, _cam(), d_candi, bvp,
        jnp.asarray(True),
    )
    return model, params, (ref, srcs, poses, d_candi, bvp)


def test_kvnet_forward_shapes(kvnet_setup):
    model, params, (ref, srcs, poses, d_candi, bvp) = kvnet_setup
    out = model.apply(params, ref, srcs, poses, _cam(), d_candi, bvp,
                      jnp.asarray(True))
    assert out.bv_cur.shape == (D, h, w)
    assert out.dpv.shape == (D, h, w)
    assert out.dpv_refined.shape == (D, H, W)
    # log-DPVs normalized
    np.testing.assert_allclose(np.exp(np.asarray(out.bv_cur)).sum(0), 1.0,
                               atol=1e-4)
    np.testing.assert_allclose(np.exp(np.asarray(out.dpv)).sum(0), 1.0,
                               atol=1e-4)
    np.testing.assert_allclose(np.exp(np.asarray(out.dpv_refined)).sum(0), 1.0,
                               atol=1e-4)


def test_kvnet_first_frame_bypasses_fusion(kvnet_setup):
    """bv_valid=False => dpv == bv_cur and dpv_refined == dpv_cur_refined
    (KVNET.py:138-143)."""
    model, params, (ref, srcs, poses, d_candi, bvp) = kvnet_setup
    out = model.apply(params, ref, srcs, poses, _cam(), d_candi, bvp,
                      jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(out.dpv), np.asarray(out.bv_cur))
    np.testing.assert_array_equal(
        np.asarray(out.dpv_refined), np.asarray(out.dpv_cur_refined)
    )


def test_kvnet_fusion_uses_prediction(kvnet_setup):
    """A non-uniform bv_predict must change the fused posterior."""
    model, params, (ref, srcs, poses, d_candi, bvp) = kvnet_setup
    out_u = model.apply(params, ref, srcs, poses, _cam(), d_candi, bvp,
                        jnp.asarray(True))
    peaked = np.full((D, h, w), -20.0, np.float32)
    peaked[3] = -0.01
    out_p = model.apply(params, ref, srcs, poses, _cam(), d_candi,
                        jnp.asarray(peaked), jnp.asarray(True))
    assert not np.allclose(np.asarray(out_u.dpv), np.asarray(out_p.dpv))
    # measurement path unaffected by the prediction
    np.testing.assert_array_equal(np.asarray(out_u.bv_cur),
                                  np.asarray(out_p.bv_cur))
