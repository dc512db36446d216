"""Aux subsystems: metrics, .mat export, guided filter/DGF, dpv stats, gif."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_depth_metrics_exact():
    from neuralrgbd_tpu.infer.metrics import depth_metrics

    gt = np.array([[1.0, 2.0], [0.0, 4.0]])  # one invalid pixel
    pred = np.array([[1.1, 2.0], [9.9, 5.0]])
    m = depth_metrics(pred, gt)
    assert m["n_valid"] == 3
    np.testing.assert_allclose(m["abs_rel"], (0.1 / 1 + 0 + 1 / 4) / 3,
                               rtol=1e-6)
    np.testing.assert_allclose(m["delta1"], 2 / 3)  # 1.25x: 1.1 ok, 2.0 ok, 5/4=1.25 not < 1.25


def test_metric_accumulator_weighted():
    from neuralrgbd_tpu.infer.metrics import MetricAccumulator, depth_metrics

    acc = MetricAccumulator()
    gt1 = np.ones((2, 2))
    acc.update(depth_metrics(np.full((2, 2), 1.1), gt1))
    acc.update(depth_metrics(np.full((2, 2), 1.3), gt1))
    r = acc.result()
    np.testing.assert_allclose(r["abs_rel"], (0.1 + 0.3) / 2, rtol=1e-5)
    assert r["n_valid"] == 8


def test_export_mat_roundtrip(tmp_path, rng):
    import scipy.io as sio

    from neuralrgbd_tpu.infer.export import export_frame_mat

    d = rng.rand(8, 12).astype(np.float32)
    c = rng.rand(8, 12).astype(np.float32)
    img = (rng.rand(8, 12, 3) * 255).astype(np.uint8)
    pose = np.eye(4)
    export_frame_mat(str(tmp_path), 3, d, c, img, cam_pose=pose,
                     K=np.eye(3))
    back = sio.loadmat(str(tmp_path / "res_00003.mat"))
    np.testing.assert_allclose(back["dmap"], d)
    np.testing.assert_allclose(back["confMap"], c)
    np.testing.assert_allclose(back["cam_pose"], pose)


def test_box_filter_matches_naive(rng):
    from neuralrgbd_tpu.models.guided_filter import box_filter

    x = rng.rand(10, 14).astype(np.float32)
    r = 2
    got = np.asarray(box_filter(jnp.asarray(x), r))
    naive = np.zeros_like(x)
    H, W = x.shape
    for i in range(H):
        for j in range(W):
            naive[i, j] = x[max(0, i - r):i + r + 1,
                            max(0, j - r):j + r + 1].sum()
    np.testing.assert_allclose(got, naive, rtol=1e-5)


def test_guided_filter_edge_preserving(rng):
    from neuralrgbd_tpu.models.guided_filter import GuidedFilter

    # step-edge guide: the filtered output should keep the step sharper
    # than a box blur of the noisy source
    g = np.zeros((16, 32), np.float32)
    g[:, 16:] = 1.0
    src = g + rng.randn(16, 32).astype(np.float32) * 0.05
    out = np.asarray(GuidedFilter(r=3, eps=1e-4)(jnp.asarray(g),
                                                 jnp.asarray(src)))
    assert abs(out[:, :12].mean() - 0.0) < 0.05
    assert abs(out[:, 20:].mean() - 1.0) < 0.05
    edge_jump = out[:, 17].mean() - out[:, 14].mean()
    assert edge_jump > 0.8  # edge preserved, not smeared


def test_dgf_refine_head(rng):
    from neuralrgbd_tpu.models.guided_filter import RefineNetDGF

    dgf = RefineNetDGF()
    dmap = jnp.asarray(rng.rand(16, 24).astype(np.float32) * 3)
    img = jnp.asarray(rng.rand(64, 96, 3).astype(np.float32))
    params = dgf.init(jax.random.PRNGKey(0), dmap, img)
    out = dgf.apply(params, dmap, img)
    assert out.shape == (64, 96)
    assert np.isfinite(np.asarray(out)).all()


def test_dpv_statistics(rng):
    from neuralrgbd_tpu.ops.dpv import dpv_statistics

    D, H, W = 6, 4, 5
    d_candi = jnp.linspace(1.0, 4.0, D)
    logits = jnp.asarray(rng.randn(D, H, W).astype(np.float32))
    dpv = jax.nn.log_softmax(logits, axis=0)
    stats = np.asarray(dpv_statistics(dpv, d_candi))
    assert stats.shape == (4, H, W)
    assert (stats[0] >= 1.0 - 1e-5).all() and (stats[0] <= 4.0 + 1e-5).all()
    assert (stats[2] >= stats[3]).all()  # max >= min


def test_results_to_gif(tmp_path, rng):
    from neuralrgbd_tpu.infer.export import export_pgm, results_to_gif

    for i in range(3):
        export_pgm(str(tmp_path / f"d_{i:05d}.pgm"),
                   (rng.rand(8, 12) * 4000).astype(np.uint16))
    n = results_to_gif(str(tmp_path), str(tmp_path / "out.gif"))
    assert n == 3
    assert os.path.getsize(str(tmp_path / "out.gif")) > 0
