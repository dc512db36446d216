"""Parity of the fused Pallas sweep kernel vs the XLA oracle (interpret mode).

The oracle is ``ops.sweep.sweep_cost_volume`` which is itself parity-tested
against torch grid_sample semantics (tests/test_sampling.py) and against the
reference composition (tests/test_oracle_parity.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.ops.camera import camera_from_K
from neuralrgbd_tpu.ops.pallas.sweep_fused import (band_spread,
                                                   sweep_cost_volume_fused)
from neuralrgbd_tpu.ops.rotations import unitq_to_rotation
from neuralrgbd_tpu.ops.sweep import sweep_cost_volume


def _setup(V=2, D=8, H=16, W=24, C=11, seed=0):
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


def _poses(kind, V=2):
    Rs, ts = [], []
    for v in range(V):
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
        if kind == "translation":
            t = np.array([0.08, -0.05, 0.1], np.float32) * (v + 1)
        elif kind == "rotation":
            R = np.asarray(unitq_to_rotation(
                jnp.asarray([1.0, 0.02 * (v + 1), -0.015])))
            t = np.array([0.03, 0.02, -0.04], np.float32)
        elif kind == "wide":
            # pushes many taps out of frame: exercises the zero-padding
            # (bare ||ref||^2) branch and partially-out rows
            R = np.asarray(unitq_to_rotation(jnp.asarray([1.0, 0.0, 0.03])))
            t = np.array([0.9, 0.25, -0.3], np.float32) * (v + 1)
        Rs.append(R)
        ts.append(t)
    return jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(ts))


@pytest.mark.parametrize("pose", ["identity", "translation", "rotation",
                                  "wide"])
@pytest.mark.parametrize("feat_dist", ["L2", "L1"])
@pytest.mark.parametrize("dot_mode", ["loop", "mfold", "bm"])
def test_fused_matches_xla(pose, feat_dist, dot_mode):
    cam, d_candi, ref, srcs = _setup()
    Rs, ts = _poses(pose)
    sigma = 10.0
    want_cost, want_kept = sweep_cost_volume(
        ref, srcs, Rs, ts, cam, d_candi, sigma, feat_dist=feat_dist,
        keep_last_channels=3)
    spread = float(band_spread(Rs, ts, cam, d_candi, ref.shape[0],
                               ref.shape[1]))
    assert spread <= 7, f"test pose exceeds the BY=8 band ({spread})"
    got_cost, got_kept = sweep_cost_volume_fused(
        ref, srcs, Rs, ts, cam, d_candi, sigma, feat_dist=feat_dist,
        keep_last_channels=3, band_matmul=dot_mode == "bm",
        m_fold=dot_mode == "mfold", interpret=True)
    np.testing.assert_allclose(np.asarray(got_cost), np.asarray(want_cost),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_kept), np.asarray(want_kept),
                               rtol=1e-4, atol=1e-5)


def test_fused_bf16_taps_close():
    """tap_dtype=bfloat16 keeps cost parity to bf16-class tolerance (a
    measured PERF negative for speed on v5e — the dots are issue-bound —
    but the option must stay numerically correct)."""
    cam, d_candi, ref, srcs = _setup()
    Rs, ts = _poses("translation")
    want, _ = sweep_cost_volume(ref, srcs, Rs, ts, cam, d_candi, 10.0,
                                keep_last_channels=3)
    got, _ = sweep_cost_volume_fused(
        ref, srcs, Rs, ts, cam, d_candi, 10.0, keep_last_channels=3,
        tap_dtype=jnp.bfloat16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)


def test_fused_no_kept_channels():
    cam, d_candi, ref, srcs = _setup(C=7)
    Rs, ts = _poses("translation")
    want = sweep_cost_volume(ref, srcs, Rs, ts, cam, d_candi, 5.0)
    got = sweep_cost_volume_fused(ref, srcs, Rs, ts, cam, d_candi, 5.0,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_operating_point_channels():
    # C=67 (feature_dim 64 + RGB), V=4 — the real channel/view count on a
    # shrunken spatial grid so interpret mode stays fast
    cam, d_candi, ref, srcs = _setup(V=4, D=6, H=12, W=20, C=67)
    Rs, ts = _poses("rotation", V=4)
    want_cost, want_kept = sweep_cost_volume(
        ref, srcs, Rs, ts, cam, d_candi, 10.0, keep_last_channels=3)
    got_cost, got_kept = sweep_cost_volume_fused(
        ref, srcs, Rs, ts, cam, d_candi, 10.0, keep_last_channels=3,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got_cost), np.asarray(want_cost),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_kept), np.asarray(want_kept),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("band", [4, 16])
def test_fused_band_variants(band):
    """BY=4 (the small-motion fast path) and BY=16 (graceful degradation)
    match the oracle whenever the poses' spread fits band - 1."""
    cam, d_candi, ref, srcs = _setup()
    Rs, ts = _poses("translation")
    spread = float(band_spread(Rs, ts, cam, d_candi, ref.shape[0],
                               ref.shape[1]))
    assert spread <= band - 1, f"test pose exceeds BY={band} ({spread})"
    want_cost, want_kept = sweep_cost_volume(
        ref, srcs, Rs, ts, cam, d_candi, 10.0, keep_last_channels=3)
    got_cost, got_kept = sweep_cost_volume_fused(
        ref, srcs, Rs, ts, cam, d_candi, 10.0, keep_last_channels=3,
        band=band, interpret=True)
    np.testing.assert_allclose(np.asarray(got_cost), np.asarray(want_cost),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_kept), np.asarray(want_kept),
                               rtol=1e-4, atol=1e-5)


def test_fused_wide_w_tiling():
    """W=192 (the 768-wide KITTI no-crop feature width): the x-tile grid
    axis must reproduce the XLA oracle across tile boundaries."""
    cam, d_candi, ref, srcs = _setup(V=2, D=5, H=10, W=192, C=9)
    Rs, ts = _poses("rotation")
    want_cost, want_kept = sweep_cost_volume(
        ref, srcs, Rs, ts, cam, d_candi, 10.0, keep_last_channels=3)
    got_cost, got_kept = sweep_cost_volume_fused(
        ref, srcs, Rs, ts, cam, d_candi, 10.0, keep_last_channels=3,
        interpret=True)
    # tolerance note: at x ~ 190 the fp32 fractional tap weight wx loses
    # ~1e-5 to cancellation (px - floor(px) at larger magnitudes), and the
    # oracle computes the same weight along a different fp32 path — the
    # honest parity bound grows with W (verified band-independent: band=8
    # and band=H produce the identical 1.3e-4 max deviation)
    np.testing.assert_allclose(np.asarray(got_cost), np.asarray(want_cost),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_kept), np.asarray(want_kept),
                               rtol=5e-4, atol=5e-4)


def test_fused_wide_w_translation_spans_tiles():
    # a large x-translation pushes taps across the 128-lane tile boundary
    cam, d_candi, ref, srcs = _setup(V=2, D=4, H=8, W=160, C=8)
    Rs = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * 2))
    ts = jnp.asarray(np.array([[0.6, 0.0, 0.0], [-0.8, 0.05, 0.1]],
                              np.float32))
    want = sweep_cost_volume(ref, srcs, Rs, ts, cam, d_candi, 5.0)
    got = sweep_cost_volume_fused(ref, srcs, Rs, ts, cam, d_candi, 5.0,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_band_spread_seq_matches_vmap():
    from neuralrgbd_tpu.ops.pallas.sweep_fused import band_spread_seq

    cam, d_candi, ref, srcs = _setup()
    Rs, ts = _poses("rotation")
    a = float(band_spread(Rs, ts, cam, d_candi, ref.shape[0], ref.shape[1]))
    b = float(band_spread_seq(Rs, ts, cam, d_candi, ref.shape[0],
                              ref.shape[1]))
    assert a == b


def test_band_spread_flags_violations():
    # a huge roll tilts rows far beyond any 8-row band
    cam, d_candi, ref, srcs = _setup()
    R = np.asarray(unitq_to_rotation(jnp.asarray([1.0, 0.0, 0.5])))
    Rs = jnp.asarray(np.stack([R, R]))
    ts = jnp.zeros((2, 3), jnp.float32)
    spread = float(band_spread(Rs, ts, cam, d_candi, ref.shape[0],
                               ref.shape[1]))
    assert spread > 7


def test_mutually_exclusive_dot_modes_raise():
    cam, d_candi, ref, srcs = _setup()
    Rs, ts = _poses("identity")
    with pytest.raises(ValueError, match="mutually exclusive"):
        sweep_cost_volume_fused(ref, srcs, Rs, ts, cam, d_candi, 5.0,
                                band_matmul=True, m_fold=True,
                                interpret=True)
