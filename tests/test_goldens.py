"""Golden-value tests: pin the numerics of every network block.

SURVEY.md section 4(b): golden tests vs small fixture tensors. The goldens
are generated once (deterministic PRNG seeds, CPU) and committed; future
optimization rounds (Pallas kernels, layout changes, bf16 modes) must keep
matching them or consciously regenerate with REGEN_GOLDENS=1.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig
from neuralrgbd_tpu.models import FeatureExtractor, KNet, KVNet, RNet
from neuralrgbd_tpu.ops.camera import camera_from_K
from neuralrgbd_tpu.ops.dpv import resample_dpv
from neuralrgbd_tpu.ops.sweep import sweep_cost_volume

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "network_goldens.npz")
CFG = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                  d_min=0.5, d_max=4.0)
H, W = 48, 64


def _cam():
    K = np.array(
        [[8 / np.tan(np.radians(30)), 0, 8], [0, 6 / np.tan(np.radians(24)), 6],
         [0, 0, 1]],
        np.float32,
    )
    return camera_from_K(K)


def _compute_all():
    rng = np.random.RandomState(7)
    out = {}

    fe = FeatureExtractor(feature_dim=16, multi_scale=True)
    x = jnp.asarray(rng.randn(2, H, W, 3).astype(np.float32))
    p = fe.init(jax.random.PRNGKey(7), x)
    l1, f = fe.apply(p, x)
    out["fe_layer1"] = np.asarray(l1)[..., ::8]
    out["fe_final"] = np.asarray(f)[..., ::4]

    knet = KNet(feature_dim=16)
    vol = jnp.asarray(rng.randn(1, 8, 12, 16, CFG.kvnet_in_channels)
                      .astype(np.float32))
    kp = knet.init(jax.random.PRNGKey(8), vol)
    out["knet"] = np.asarray(knet.apply(kp, vol))[0, ::2]

    rnet = RNet(D=8)
    dpv = jax.nn.softmax(jnp.asarray(rng.randn(1, 12, 16, 8)
                                     .astype(np.float32)), -1)
    f0 = jnp.asarray(rng.randn(1, 12, 16, 16).astype(np.float32))
    f1 = jnp.asarray(rng.randn(1, 24, 32, 32).astype(np.float32))
    img = jnp.asarray(rng.randn(1, 48, 64, 3).astype(np.float32))
    rp = rnet.init(jax.random.PRNGKey(9), dpv, f0, f1, img)
    out["rnet"] = np.asarray(rnet.apply(rp, dpv, f0, f1, img))[0, ::8, ::8]

    # geometry ops
    cam = _cam()
    d_candi = jnp.asarray(CFG.d_candi)
    ref = jnp.asarray(rng.randn(12, 16, 7).astype(np.float32))
    srcs = jnp.asarray(rng.randn(2, 12, 16, 7).astype(np.float32))
    Rs = jnp.tile(jnp.eye(3), (2, 1, 1))
    ts = jnp.asarray([[0.1, -0.05, 0.02], [-0.08, 0.03, 0.0]])
    out["sweep"] = np.asarray(
        sweep_cost_volume(ref, srcs, Rs, ts, cam, d_candi, 10.0))[::2]

    dpv3 = jnp.log(jax.nn.softmax(
        jnp.asarray(rng.randn(8, 12, 16).astype(np.float32)), 0))
    rel = jnp.eye(4).at[0, 3].set(0.03)
    out["resample"] = np.asarray(
        resample_dpv(dpv3, rel, cam, d_candi, float(np.log(1 / 8))))[::2]

    # full KVNet forward
    model = KVNet(cfg=CFG)
    reff = jnp.asarray(rng.randn(H, W, 3).astype(np.float32))
    srcf = jnp.asarray(rng.randn(4, H, W, 3).astype(np.float32))
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (4, 1, 1))
    poses = poses.at[:, 0, 3].set(jnp.asarray([-0.1, -0.05, 0.05, 0.1]))
    bvp = jnp.full((8, 12, 16), -np.log(8.0), jnp.float32)
    mp = model.init(jax.random.PRNGKey(10), reff, srcf, poses, cam, d_candi,
                    bvp, jnp.asarray(True))
    o = model.apply(mp, reff, srcf, poses, cam, d_candi, bvp,
                    jnp.asarray(True))
    out["kvnet_dpv"] = np.asarray(o.dpv)[::2]
    out["kvnet_refined"] = np.asarray(o.dpv_refined)[::2, ::8, ::8]
    return out


def test_network_goldens():
    got = _compute_all()
    if os.environ.get("REGEN_GOLDENS") or not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez_compressed(GOLDEN_PATH, **got)
        if not os.environ.get("REGEN_GOLDENS"):
            pytest.skip("goldens generated; rerun to compare")
    ref = np.load(GOLDEN_PATH)
    for k in got:
        np.testing.assert_allclose(
            got[k], ref[k], rtol=5e-4, atol=5e-5,
            err_msg=f"golden drift in {k} — if intentional, REGEN_GOLDENS=1",
        )
