"""Parity of the Pallas resample kernel vs the XLA oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.ops.camera import camera_from_K
from neuralrgbd_tpu.ops.dpv import resample_dpv
from neuralrgbd_tpu.ops.pallas.resample import resample_dpv_pallas
from neuralrgbd_tpu.ops.rotations import unitq_to_rotation


def _setup(D=16, H=16, W=24, seed=0):
    rng = np.random.RandomState(seed)
    K = np.array(
        [[W / 2 / np.tan(np.radians(30)), 0, W / 2],
         [0, H / 2 / np.tan(np.radians(24)), H / 2],
         [0, 0, 1]],
        np.float32,
    )
    cam = camera_from_K(K)
    d_candi = jnp.linspace(0.5, 4.0, D)
    logits = rng.randn(D, H, W).astype(np.float32)
    dpv = jnp.log(jax.nn.softmax(jnp.asarray(logits), 0))
    return cam, d_candi, dpv


@pytest.mark.parametrize("pose", ["identity", "translation", "rotation"])
def test_pallas_matches_xla(pose):
    cam, d_candi, dpv = _setup()
    D = dpv.shape[0]
    rel = jnp.eye(4)
    if pose == "translation":
        rel = rel.at[:3, 3].set(jnp.asarray([0.05, -0.03, 0.08]))
    elif pose == "rotation":
        # a few degrees — the realistic inter-frame regime
        R = unitq_to_rotation(jnp.asarray([1.0, 0.02, -0.015]))
        rel = rel.at[:3, :3].set(R).at[:3, 3].set(
            jnp.asarray([0.02, 0.01, -0.03]))

    pad = float(np.log(1.0 / D))
    ref = resample_dpv(dpv, rel, cam, d_candi, pad)
    got = resample_dpv_pallas(dpv, rel, cam, d_candi, pad, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_nonsquare_width():
    cam, d_candi, dpv = _setup(D=8, H=12, W=40)
    rel = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.04, 0.0, 0.02]))
    pad = float(np.log(1.0 / 8))
    ref = resample_dpv(dpv, rel, cam, d_candi, pad)
    got = resample_dpv_pallas(dpv, rel, cam, d_candi, pad, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape", [(16, 32, 160), (12, 40, 288)])
def test_pallas_wide_multi_lane_tile(shape):
    """W > 128 engages the statically-aligned double band (BYL=16) that
    Mosaic requires at multi-lane-tile widths — the image-res LBA resample
    (cli/test_kvnet_lba.lba_maps, 64x256x384) and wide-W KITTI dpv shapes."""
    D, H, W = shape
    cam, d_candi, dpv = _setup(D=D, H=H, W=W)
    R = unitq_to_rotation(jnp.asarray([1.0, 0.015, -0.01]))
    rel = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(
        jnp.asarray([0.03, -0.02, 0.05]))
    pad = float(np.log(1.0 / D))
    ref = resample_dpv(dpv, rel, cam, d_candi, pad)
    got = resample_dpv_pallas(dpv, rel, cam, d_candi, pad, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
