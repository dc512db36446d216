"""Regression guard: the sweep's kept intensity channels ARE the K-Net
input warps (the claim behind the keep_last_channels fusion)."""

import numpy as np

import jax.numpy as jnp

from neuralrgbd_tpu.ops.camera import camera_from_K
from neuralrgbd_tpu.ops.rotations import unitq_to_rotation
from neuralrgbd_tpu.ops.sweep import sweep_cost_volume, warp_to_ref_over_depths


def test_kept_channels_equal_separate_warp(rng):
    H, W, C, V, D = 16, 24, 11, 2, 5
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
    R = unitq_to_rotation(jnp.asarray([1.0, 0.02, -0.01]))
    Rs = jnp.stack([R, R.T])
    ts = jnp.asarray([[0.2, -0.1, 0.05], [-0.1, 0.05, 0.1]])

    _, kept = sweep_cost_volume(ref, srcs, Rs, ts, cam, d_candi, 10.0,
                                keep_last_channels=3)
    separate = warp_to_ref_over_depths(srcs[..., C - 3:], Rs, ts, cam,
                                       d_candi)
    np.testing.assert_allclose(np.asarray(kept), np.asarray(separate),
                               rtol=1e-4, atol=5e-5)
