"""Closed-form tests for the camera model, plane-sweep, and DPV resample."""

import numpy as np
import pytest

import jax.numpy as jnp

from neuralrgbd_tpu.ops.camera import camera_from_K, rescale_K, unit_rays
from neuralrgbd_tpu.ops.dpv import (
    depth_regression,
    resample_dpv,
    uniform_dpv,
)
from neuralrgbd_tpu.ops.sweep import (
    backward_warp_by_depth,
    sweep_cost_volume,
    warp_to_ref_over_depths,
)


def _centered_cam(W, H, f=50.0):
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]], np.float32)
    return camera_from_K(K)


def test_unit_rays_half_pixel_offset():
    W, H = 8, 6
    cam = _centered_cam(W, H, f=10.0)
    rays = np.asarray(unit_rays(cam, H, W)).reshape(3, H, W)
    # pixel (0,0): ray x = (0.5 - 4)/10
    np.testing.assert_allclose(rays[0, 0, 0], (0.5 - 4.0) / 10.0, rtol=1e-6)
    np.testing.assert_allclose(rays[1, 0, 0], (0.5 - 3.0) / 10.0, rtol=1e-6)
    np.testing.assert_allclose(rays[2], 1.0)
    # symmetric about the center
    np.testing.assert_allclose(rays[0, :, 0], -rays[0, :, -1], rtol=1e-6)


def test_rescale_K_fov_roundtrip():
    K = np.array([[580.0, 0, 320.5], [0, 578.0, 239.2], [0, 0, 1.0]])
    K2 = rescale_K(K, (640, 480), (96, 64))
    # principal point at center
    assert K2[0, 2] == 48.0 and K2[1, 2] == 32.0
    # fov preserved
    np.testing.assert_allclose(
        np.arctan(K2[0, 2] / K2[0, 0]), np.arctan(K[0, 2] / K[0, 0]), rtol=1e-6
    )


def test_identity_pose_warp_is_identity(rng):
    """R=I, t=0 => the warped source equals the source at every depth
    (up to the align-corners sub-pixel mapping, exact for centered K)."""
    H, W, C = 16, 24, 4
    cam = _centered_cam(W, H)
    img = rng.randn(H, W, C).astype(np.float32)
    d_candi = jnp.linspace(0.5, 5.0, 8)
    warped = np.asarray(
        warp_to_ref_over_depths(
            jnp.asarray(img)[None],
            jnp.eye(3)[None],
            jnp.zeros((1, 3)),
            cam,
            d_candi,
        )
    )[0]
    # identity homography: p = K ur d / d = K ur -> u = fx*rx + cx = x + .5
    # pixel coord px = u (W-1) / (2 cx) = (x+.5)(W-1)/W — a fixed sub-pixel
    # shear from the align_corners grid convention. Check against direct
    # bilinear interp of the source at those coords for the middle.
    from neuralrgbd_tpu.ops.sampling import grid_sample_2d

    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    px = (xs + 0.5) * (W - 1) / W
    py = (ys + 0.5) * (H - 1) / H
    expect = np.asarray(
        grid_sample_2d(jnp.asarray(img), jnp.stack([px, py], -1))
    )
    for d in range(warped.shape[0]):
        np.testing.assert_allclose(warped[d], expect, atol=1e-5)


def test_pure_z_translation_analytic_disparity(rng):
    """Pure-x camera translation: a point at depth d shifts by fx*tx/d in u.

    Verify the sweep samples exactly there by warping a linear-in-x image
    and checking the expected shift (away from borders).
    """
    H, W = 12, 32
    f = 20.0
    cam = _centered_cam(W, H, f=f)
    # src image = x coordinate (linear ramp) so bilinear sampling is exact
    xs = np.tile(np.arange(W, dtype=np.float32), (H, 1))
    img = xs[..., None]
    tx = 0.5
    d = 2.0
    warped = np.asarray(
        warp_to_ref_over_depths(
            jnp.asarray(img)[None],
            jnp.eye(3)[None],
            jnp.asarray([[tx, 0.0, 0.0]]),
            cam,
            jnp.asarray([d]),
        )
    )[0, 0, :, :, 0]
    # u_src = fx*(rx + tx/d) + cx = (x+.5) + fx*tx/d ; sample grid maps u to
    # pixel coord u*(W-1)/W.  The ramp image value at pixel coord p is p.
    ys_c, xs_c = np.mgrid[0:H, 0:W]
    u = (xs_c + 0.5) + f * tx / d
    expect = u * (W - 1) / W
    valid = (expect >= 0) & (expect <= W - 1)
    inner = valid & (xs_c > 1) & (xs_c < W - 2)
    np.testing.assert_allclose(warped[inner], expect[inner], rtol=1e-5)


def test_cost_volume_zero_for_matching_view(rng):
    """If the source IS the reference (identity pose) and the image is
    constant, cost must be ~0 at all depths."""
    H, W, C = 8, 8, 3
    cam = _centered_cam(W, H)
    img = np.ones((H, W, C), np.float32) * 3.3
    d_candi = jnp.linspace(1.0, 4.0, 5)
    cost = np.asarray(
        sweep_cost_volume(
            jnp.asarray(img),
            jnp.asarray(img)[None],
            jnp.eye(3)[None],
            jnp.zeros((1, 3)),
            cam,
            d_candi,
            sigma=10.0,
        )
    )
    assert cost.shape == (5, H, W)
    np.testing.assert_allclose(cost, 0.0, atol=1e-5)


def test_cost_volume_argmin_at_true_depth(rng):
    """A textured plane at depth d*, viewed from a translated camera: the
    sweep cost over depth should be minimized at d* (interior pixels)."""
    H, W, C = 16, 24, 8
    f = 30.0
    cam = _centered_cam(W, H, f=f)
    src = rng.randn(H, W, C).astype(np.float32)
    d_true = 2.0
    t = np.array([0.3, 0.0, 0.0], np.float32)
    d_candi = jnp.linspace(1.0, 4.0, 13)  # includes 2.0 exactly at index 4
    true_idx = int(np.argmin(np.abs(np.asarray(d_candi) - d_true)))

    # Build the reference view through the op's own sample chain at d_true:
    # then the sweep cost is exactly 0 at d_true and positive elsewhere
    # (random texture), so argmin over depth must recover d_true.
    ref = np.asarray(
        warp_to_ref_over_depths(
            jnp.asarray(src)[None], jnp.eye(3)[None], jnp.asarray(t)[None],
            cam, jnp.asarray([d_true]),
        )
    )[0, 0]

    cost = np.asarray(
        sweep_cost_volume(
            jnp.asarray(ref),
            jnp.asarray(src)[None],
            jnp.eye(3)[None],
            jnp.asarray(t)[None],
            cam,
            d_candi,
            sigma=10.0,
        )
    )
    amin = cost.argmin(axis=0)
    interior = amin[2:-2, 6:-6]
    assert (interior == true_idx).mean() > 0.95
    np.testing.assert_allclose(cost[true_idx], 0.0, atol=1e-6)


def test_resample_dpv_identity_pose():
    """Identity relative pose: resampled DPV ~= original away from borders."""
    D, H, W = 8, 10, 14
    cam = _centered_cam(W, H, f=12.0)
    d_candi = jnp.linspace(0.5, 4.0, D)
    rng_ = np.random.RandomState(1)
    logits = rng_.randn(D, H, W).astype(np.float32)
    dpv = np.asarray(jnp.log(jnp.exp(logits) / jnp.exp(logits).sum(0)))
    out = np.asarray(
        resample_dpv(jnp.asarray(dpv), jnp.eye(4), cam, d_candi,
                     padding_value=float(np.log(1.0 / D)))
    )
    assert out.shape == (D, H, W)
    # interior voxels: the identity warp lands within half a voxel of itself
    # (align-corner subpixel shear), so values are close after interpolation
    diff = np.abs(out[2:-2, 2:-2, 2:-2] - dpv[2:-2, 2:-2, 2:-2])
    assert np.median(diff) < 0.35
    assert np.isfinite(out).all()
    assert (out <= 0).all() and (out >= -1000).all()


def test_depth_regression_onehot():
    D, H, W = 4, 3, 3
    d_candi = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    dpv = np.full((D, H, W), -1e3, np.float32)
    dpv[2] = 0.0  # prob 1 at depth 3.0
    out = np.asarray(depth_regression(jnp.asarray(dpv), d_candi))
    np.testing.assert_allclose(out, 3.0, rtol=1e-5)


def test_uniform_dpv_normalized():
    u = np.asarray(uniform_dpv(16, 4, 4))
    np.testing.assert_allclose(np.exp(u).sum(0), 1.0, rtol=1e-5)


def test_backward_warp_identity(rng):
    H, W, C = 10, 12, 3
    cam = _centered_cam(W, H)
    img = rng.randn(H, W, C).astype(np.float32)
    dmap = np.full((H, W), 2.0, np.float32)
    out = np.asarray(
        backward_warp_by_depth(
            jnp.asarray(img)[None], jnp.asarray(dmap),
            jnp.eye(3)[None], jnp.zeros((1, 3)), cam,
        )
    )[0]
    # same fixed subpixel mapping as the homography warp
    from neuralrgbd_tpu.ops.sampling import grid_sample_2d

    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    px = (xs + 0.5) * (W - 1) / W
    py = (ys + 0.5) * (H - 1) / H
    expect = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.stack([px, py], -1)))
    np.testing.assert_allclose(out, expect, atol=1e-5)
