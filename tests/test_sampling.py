"""Parity tests for the resampling core against torch.grid_sample.

These nail the align_corners=True / padding conventions the reference
relies on (SURVEY.md section 7.3 'grid_sample parity').
"""

import numpy as np
import pytest

import jax.numpy as jnp

from neuralrgbd_tpu.ops.sampling import (
    grid_sample_2d,
    grid_sample_3d,
    normalized_to_pixel,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _rand_grid(rng, shape, lo=-1.4, hi=1.4):
    return rng.uniform(lo, hi, size=shape).astype(np.float32)


def test_quad_matches_taps(rng):
    H, W, C = 11, 15, 7
    img = rng.randn(H, W, C).astype(np.float32)
    coords = rng.uniform(-20, 30, size=(800, 2)).astype(np.float32)
    a = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords),
                                  "zeros", method="quad"))
    b = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords),
                                  "zeros"))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_quad_grads_match_taps(rng):
    """Coord- and image-gradients of the quad path == the taps path.

    The LBA optimizer (pose/lba.py) differentiates the photometric loss
    through the quad gather; this locks the VJP, not just the forward.
    Interior coords only — at exact integer/border coords the bilinear
    weight derivative is subgradient territory for both paths.
    """
    import jax

    H, W, C = 11, 15, 3
    img = rng.randn(H, W, C).astype(np.float32)
    coords = rng.uniform(1.2, 9.3, size=(300, 2)).astype(np.float32)
    coords += 0.13  # keep away from integer lattice points

    def loss(method, im, co):
        out = grid_sample_2d(im, co, "zeros", method=method)
        return jnp.sum(jnp.sin(out))

    for argnum, label in ((0, "img"), (1, "coords")):
        g_taps = jax.grad(lambda im, co: loss(None, im, co), argnum)(
            jnp.asarray(img), jnp.asarray(coords))
        g_quad = jax.grad(lambda im, co: loss("quad", im, co), argnum)(
            jnp.asarray(img), jnp.asarray(coords))
        np.testing.assert_allclose(np.asarray(g_quad), np.asarray(g_taps),
                                   atol=2e-5, err_msg=label)


def test_fast_matches_taps_far_out_of_range(rng):
    """Far-out-of-frustum coords (|g| >> 1) through both gather paths."""
    H, W, C = 9, 11, 4
    img = rng.randn(H, W, C).astype(np.float32)
    coords = rng.uniform(-60, 60, size=(500, 2)).astype(np.float32)
    for padding in ("zeros", "border"):
        a = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords),
                                      padding=padding, fast=True))
        b = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords),
                                      padding=padding, fast=False))
        np.testing.assert_allclose(a, b, atol=1e-6)
    vol = rng.randn(5, 9, 11).astype(np.float32)
    c3 = rng.uniform(-60, 60, size=(500, 3)).astype(np.float32)
    for padding in ("zeros", "border"):
        a = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(c3),
                                      padding=padding, fast=True))
        b = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(c3),
                                      padding=padding, fast=False))
        np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.parametrize("fast", [True, False])
@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_grid_sample_2d_matches_torch(rng, padding, fast):
    H, W, C = 13, 17, 5
    img = rng.randn(H, W, C).astype(np.float32)
    grid = _rand_grid(rng, (9, 11, 2))  # normalized [-1,1]-ish incl. out-of-range

    ref = F.grid_sample(
        torch.from_numpy(img).permute(2, 0, 1)[None],
        torch.from_numpy(grid)[None],
        mode="bilinear",
        padding_mode=padding,
        align_corners=True,
    )[0].permute(1, 2, 0).numpy()

    coords = np.stack(
        [
            normalized_to_pixel(grid[..., 0], W),
            normalized_to_pixel(grid[..., 1], H),
        ],
        axis=-1,
    )
    out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords),
                                    padding=padding, fast=fast))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("fast", [True, False])
@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_grid_sample_3d_matches_torch(rng, padding, fast):
    D, H, W = 7, 9, 11
    vol = rng.randn(D, H, W).astype(np.float32)
    grid = _rand_grid(rng, (4, 5, 6, 3))  # (..., 3) = (x, y, z)

    ref = F.grid_sample(
        torch.from_numpy(vol)[None, None],
        torch.from_numpy(grid)[None],
        mode="bilinear",
        padding_mode=padding,
        align_corners=True,
    )[0, 0].numpy()

    coords = np.stack(
        [
            normalized_to_pixel(grid[..., 0], W),
            normalized_to_pixel(grid[..., 1], H),
            normalized_to_pixel(grid[..., 2], D),
        ],
        axis=-1,
    )
    out = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords),
                                    padding=padding, fast=fast))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_2d_identity():
    H, W, C = 8, 12, 3
    img = np.arange(H * W * C, dtype=np.float32).reshape(H, W, C)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    coords = np.stack([xs, ys], axis=-1)
    out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords)))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_grid_sample_2d_gradients_flow(rng):
    import jax

    H, W, C = 6, 6, 2
    img = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
    coords = jnp.asarray(rng.uniform(1, 4, size=(10, 2)).astype(np.float32))

    g_img = jax.grad(lambda im: jnp.sum(grid_sample_2d(im, coords) ** 2))(img)
    g_crd = jax.grad(lambda c: jnp.sum(grid_sample_2d(img, c) ** 2))(coords)
    assert np.isfinite(np.asarray(g_img)).all()
    assert np.isfinite(np.asarray(g_crd)).all()
    assert np.abs(np.asarray(g_crd)).sum() > 0


def test_oct_matches_taps_3d(rng):
    """The oct-packed 3-D gather == the 8-tap path, border padding,
    including far-out-of-range coords (the DPV resample clips to
    [-2, dim+1] — cover beyond that too)."""
    from neuralrgbd_tpu.ops.sampling import grid_sample_3d

    D, H, W = 9, 13, 17
    vol = rng.randn(D, H, W).astype(np.float32)
    coords = np.stack([rng.uniform(-4, W + 4, 700),
                       rng.uniform(-4, H + 4, 700),
                       rng.uniform(-4, D + 4, 700)], -1).astype(np.float32)
    a = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords),
                                  "border", method="oct"))
    b = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords),
                                  "border"))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_resample_dpv_oct_matches_default():
    """resample_dpv(gather_method='oct') == the default path at a
    realistic relative pose (the lba_maps / wide-predict_next fast path)."""
    import math

    import jax

    from neuralrgbd_tpu.ops.camera import camera_from_K
    from neuralrgbd_tpu.ops.dpv import resample_dpv
    from neuralrgbd_tpu.ops.rotations import unitq_to_rotation

    rng = np.random.RandomState(7)
    D, H, W = 16, 24, 36
    K = np.array([[W / 1.2, 0, W / 2], [0, H / 1.1, H / 2], [0, 0, 1]],
                 np.float32)
    cam = camera_from_K(K)
    d_candi = jnp.linspace(0.4, 4.0, D)
    dpv = jnp.log(jax.nn.softmax(
        jnp.asarray(rng.randn(D, H, W).astype(np.float32)), 0))
    R = unitq_to_rotation(jnp.asarray([1.0, 0.02, -0.01]))
    rel = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(
        jnp.asarray([0.05, -0.03, 0.08]))
    pad = float(math.log(1.0 / D))
    ref = resample_dpv(dpv, rel, cam, d_candi, pad)
    got = resample_dpv(dpv, rel, cam, d_candi, pad, gather_method="oct")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
