"""Parity of the tiled wide-W Pallas resample vs the XLA oracle
(interpret mode), including the spread predicate and the lax.cond
composite's fallback behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.ops.camera import camera_from_K
from neuralrgbd_tpu.ops.dpv import resample_dpv
from neuralrgbd_tpu.ops.pallas.resample import resample_pixel_coords
from neuralrgbd_tpu.ops.pallas.resample_tiled import (
    resample_dpv_tiled, resample_dpv_wide, resample_spread_ok)
from neuralrgbd_tpu.ops.rotations import unitq_to_rotation


def _setup(D=16, H=24, W=160, seed=0):
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


def _rel(pose):
    rel = jnp.eye(4)
    if pose == "translation":
        rel = rel.at[:3, 3].set(jnp.asarray([0.06, -0.03, 0.08]))
    elif pose == "rotation":
        R = unitq_to_rotation(jnp.asarray([1.0, 0.015, -0.01]))
        rel = rel.at[:3, :3].set(R).at[:3, 3].set(
            jnp.asarray([0.03, 0.01, -0.04]))
    return rel


@pytest.mark.parametrize("pose", ["identity", "translation", "rotation"])
@pytest.mark.parametrize("shape", [(16, 24, 160), (12, 20, 288)])
def test_tiled_matches_xla(pose, shape):
    D, H, W = shape
    cam, d_candi, dpv = _setup(D=D, H=H, W=W)
    rel = _rel(pose)
    pad = float(np.log(1.0 / D))

    cx, cy, cz = resample_pixel_coords(cam, rel, d_candi, H, W)
    assert bool(resample_spread_ok(cx, cy, cz, D, H, W, 4, 8)), \
        "fixture pose must fit the default band (else the test is vacuous)"

    ref = resample_dpv(dpv, rel, cam, d_candi, pad)
    got = resample_dpv_tiled(dpv, rel, cam, d_candi, pad, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_tiled_single_tile_width():
    """W <= 128 (single tile, edge-clamped halo blocks on both sides)."""
    cam, d_candi, dpv = _setup(D=12, H=16, W=96)
    rel = _rel("rotation")
    pad = float(np.log(1.0 / 12))
    ref = resample_dpv(dpv, rel, cam, d_candi, pad)
    got = resample_dpv_tiled(dpv, rel, cam, d_candi, pad, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_spread_flags_extreme_motion():
    """A near-field translation with > 127 px of parallax must trip the
    x-halo predicate (the case the composite routes to the oct path)."""
    D, H, W = 16, 24, 288
    cam, d_candi, dpv = _setup(D=D, H=H, W=W)
    rel = jnp.eye(4).at[:3, 3].set(jnp.asarray([1.5, 0.0, 0.0]))
    cx, cy, cz = resample_pixel_coords(cam, rel, d_candi, H, W)
    assert not bool(resample_spread_ok(cx, cy, cz, D, H, W, 4, 8))

    # the composite must still be exact there (oct branch)
    pad = float(np.log(1.0 / D))
    with jax.disable_jit():   # lax.cond -> python if, avoids pallas trace
        got = resample_dpv_wide(dpv, rel, cam, d_candi, pad)
    ref = resample_dpv(dpv, rel, cam, d_candi, pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_spread_accepts_video_motion():
    D, H, W = 16, 24, 288
    cam, d_candi, dpv = _setup(D=D, H=H, W=W)
    cx, cy, cz = resample_pixel_coords(cam, _rel("rotation"), d_candi, H, W)
    assert bool(resample_spread_ok(cx, cy, cz, D, H, W, 4, 8))
