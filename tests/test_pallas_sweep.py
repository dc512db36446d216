"""Parity of the Pallas sweep kernel vs the XLA oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.ops.camera import camera_from_K
from neuralrgbd_tpu.ops.pallas.sweep import sweep_cost_volume_pallas
from neuralrgbd_tpu.ops.rotations import unitq_to_rotation
from neuralrgbd_tpu.ops.sweep import sweep_cost_volume


def _setup(H=16, W=24, C=11, V=2, D=6, seed=0):
    rng = np.random.RandomState(seed)
    K = np.array(
        [[W / 2 / np.tan(np.radians(30)), 0, W / 2],
         [0, H / 2 / np.tan(np.radians(24)), H / 2],
         [0, 0, 1]],
        np.float32,
    )
    cam = camera_from_K(K)
    d_candi = jnp.linspace(0.5, 4.0, D)
    ref = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
    srcs = jnp.asarray(rng.randn(V, H, W, C).astype(np.float32))
    return cam, d_candi, ref, srcs


@pytest.mark.parametrize("pose", ["identity", "translation", "rotation"])
def test_pallas_sweep_matches_xla(pose):
    cam, d_candi, ref, srcs = _setup()
    V = srcs.shape[0]
    Rs = jnp.tile(jnp.eye(3), (V, 1, 1))
    ts = jnp.zeros((V, 3))
    if pose == "translation":
        ts = jnp.asarray([[0.2, -0.1, 0.05], [-0.15, 0.08, 0.0]])
    elif pose == "rotation":
        R = unitq_to_rotation(jnp.asarray([1.0, 0.015, -0.01]))
        Rs = jnp.stack([R, R.T])
        ts = jnp.asarray([[0.1, 0.0, 0.0], [0.0, 0.1, 0.0]])

    expect = sweep_cost_volume(ref, srcs, Rs, ts, cam, d_candi, 10.0)
    got = sweep_cost_volume_pallas(ref, srcs, Rs, ts, cam, d_candi, 10.0,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)


def test_pallas_sweep_keep_channels():
    cam, d_candi, ref, srcs = _setup(C=11)
    V = srcs.shape[0]
    Rs = jnp.tile(jnp.eye(3), (V, 1, 1))
    ts = jnp.asarray([[0.2, -0.1, 0.05], [-0.15, 0.08, 0.0]])
    expect_cost, expect_kept = sweep_cost_volume(
        ref, srcs, Rs, ts, cam, d_candi, 10.0, keep_last_channels=3)
    got_cost, got_kept = sweep_cost_volume_pallas(
        ref, srcs, Rs, ts, cam, d_candi, 10.0, keep_last_channels=3,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got_cost), np.asarray(expect_cost),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_kept), np.asarray(expect_kept),
                               rtol=1e-4, atol=1e-4)


def test_pallas_sweep_far_out_of_frustum():
    """Whole-frustum-out pose: cost must equal ||ref||^2/sigma (zeros pad)."""
    cam, d_candi, ref, srcs = _setup(V=1)
    Rs = jnp.eye(3)[None]
    ts = jnp.asarray([[50.0, 50.0, -20.0]])
    got = sweep_cost_volume_pallas(ref, srcs, Rs, ts, cam, d_candi, 10.0,
                                   interpret=True)
    expect = jnp.broadcast_to(jnp.sum(ref * ref, -1) / 10.0, got.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-4)
