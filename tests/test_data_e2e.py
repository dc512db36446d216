"""End-to-end data-layer + CLI test on a synthetic ScanNet-layout scene.

This is the run_demo.sh-equivalent integration test (SURVEY.md section 4e):
write a scene to disk, run the inference CLI, and check the documented
output contract (README.md:65-72) byte-for-structure.
"""

import os

import numpy as np
import pytest

from neuralrgbd_tpu.data.synthetic import write_scannet_scene


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet")
    write_scannet_scene(str(root), n_frames=10)
    return str(root)


def test_scannet_paths_and_intrinsics(scene_root):
    from neuralrgbd_tpu.data.scannet import get_paths, read_info_txt

    fldr, imgs, dmaps, poses, info = get_paths(0, 5, scene_root)
    assert len(imgs) == 10
    assert imgs[3].endswith("frame-000015.color.jpg")
    K, (w, h) = read_info_txt(info)
    assert (w, h) == (640, 480)
    np.testing.assert_allclose(K[0, 0], 585.0)
    np.testing.assert_allclose(K[0, 2], 323.7)


def test_trajectory_frames(scene_root):
    from neuralrgbd_tpu.data.scannet import make_trajectory

    d_candi = np.linspace(0.5, 4.0, 8).astype(np.float32)
    traj = make_trajectory(0, 5, scene_root, img_size_wh=(96, 64),
                           d_candi=d_candi)
    rec = traj.frame(2)
    assert rec.img.shape == (64, 96, 3)
    assert rec.img_raw.dtype == np.uint8
    assert rec.dmap.shape == (16, 24)
    # depth decoded to meters in the synthetic range
    assert 0.7 < rec.dmap[rec.dmap > 0].min() < 1.0
    assert 2.8 < rec.dmap.max() < 3.3
    # digitized bins within range, not all ignore
    assert rec.dmap_digit.max() <= 7 and (rec.dmap_digit > 0).mean() > 0.9
    # pose: world->cam = inv(cam-to-world)
    np.testing.assert_allclose(rec.ext_M[0, 3], -0.02 * 2, atol=1e-6)


def test_window_batch_contract(scene_root):
    from neuralrgbd_tpu.data.scannet import make_trajectory
    from neuralrgbd_tpu.data.trajectory import window_batch

    d_candi = np.linspace(0.5, 4.0, 8).astype(np.float32)
    traj = make_trajectory(0, 5, scene_root, img_size_wh=(96, 64),
                           d_candi=d_candi)
    batch, ref, valid = window_batch(traj, 3, 2, with_labels=True)
    assert valid
    assert batch["srcs"].shape == (1, 4, 64, 96, 3)
    assert batch["poses"].shape == (1, 4, 4, 4)
    # relative pose of src 0 (frame 1 vs ref 3): camera moved +x by 0.04
    # world->cam composition: t_rel = -0.02*1 - (-0.02*3) = +0.04
    np.testing.assert_allclose(batch["poses"][0, 0, 0, 3], 0.04, atol=1e-6)
    np.testing.assert_allclose(batch["pose_next"][0, 0, 3], -0.02, atol=1e-6)


def test_cli_end_to_end(scene_root, tmp_path):
    """Drive the real CLI main() and verify the export contract."""
    from neuralrgbd_tpu.cli.test_kvnet import main
    from neuralrgbd_tpu.infer.export import read_pgm

    res = str(tmp_path / "results")
    main([
        "--dataset", "scannet", "--dataset_path", scene_root,
        "--ndepth", "8", "--feature_dim", "16", "--d_min", "0.5",
        "--d_max", "4.0", "--img_width", "96", "--img_height", "64",
        "--res_dir", res, "--exp_name", "t",
    ])
    out_dir = os.path.join(res, "t_0")
    # window [2, L-3): refs 2,3,4,5,6 => 5 frames
    files = sorted(os.listdir(out_dir))
    assert "scene_path_info.txt" in files
    imgs = [f for f in files if f.startswith("img_")]
    ds = [f for f in files if f.startswith("d_")]
    confs = [f for f in files if f.startswith("conf_")]
    assert len(imgs) == len(ds) == len(confs) == 5
    assert ds[0] == "d_00000.pgm"

    d = read_pgm(os.path.join(out_dir, "d_00000.pgm"))
    assert d.dtype.kind in "iu" and d.shape == (64, 96)
    # meters*1000 within the depth range
    assert 400 <= d.min() and d.max() <= 4100

    c = read_pgm(os.path.join(out_dir, "conf_00000.pgm"))
    assert c.max() <= 1000

    lines = open(os.path.join(out_dir, "scene_path_info.txt")).read().splitlines()
    assert len(lines) == 6  # scene header + 5 frames
    assert lines[1].split("  ")[0] == "0"
    assert lines[1].split("  ")[1].endswith("frame-000010.color.jpg")


def test_chunked_loop_matches_per_frame(scene_root, tmp_path):
    """run_trajectory's chunked scan path (chunk_t=8, in-jit window
    assembly, padded tail, carry from the last real step) must reproduce
    the per-frame stepping path (chunk_t=1) pgm-for-pgm. The 10-frame
    scene gives 5 refs = one partial chunk, exercising the padding."""
    from neuralrgbd_tpu.config import ModelConfig, TrainConfig
    from neuralrgbd_tpu.data.scannet import make_trajectory
    from neuralrgbd_tpu.data.trajectory import window_batch
    from neuralrgbd_tpu.infer.export import read_pgm
    from neuralrgbd_tpu.infer.loop import run_trajectory
    from neuralrgbd_tpu.train import create_train_state

    cfg = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                      d_min=0.5, d_max=4.0)
    traj = make_trajectory(0, 5, scene_root, img_size_wh=(96, 64),
                           d_candi=cfg.d_candi)
    sample, _, _ = window_batch(traj, 2, 2, with_labels=True)
    state = create_train_state(cfg, TrainConfig(), sample)

    d_chunk = str(tmp_path / "chunk")
    d_step = str(tmp_path / "step")
    n1 = run_trajectory(state.params, cfg, traj, d_chunk, verbose=False,
                        chunk_t=8)
    n2 = run_trajectory(state.params, cfg, traj, d_step, verbose=False,
                        chunk_t=1)
    assert n1 == n2 == 5
    for i in range(n1):
        for pre in ("d", "conf"):
            a = read_pgm(os.path.join(d_chunk, f"{pre}_{i:05d}.pgm"))
            b = read_pgm(os.path.join(d_step, f"{pre}_{i:05d}.pgm"))
            np.testing.assert_allclose(
                a.astype(np.int64), b.astype(np.int64), atol=1,
                err_msg=f"{pre}_{i}: chunked loop diverged from per-frame")


def test_cli_invalid_pose_resets(scene_root, tmp_path_factory, tmp_path):
    """A scene with one invalid pose: the frame is skipped, the loop
    continues, and the contract still holds (test_KVNet.py:241-246)."""
    root = str(tmp_path_factory.mktemp("scannet_bad"))
    write_scannet_scene(root, n_frames=10, invalid_pose_at=8)
    from neuralrgbd_tpu.cli.test_kvnet import main

    res = str(tmp_path / "results")
    main([
        "--dataset", "scannet", "--dataset_path", root,
        "--ndepth", "8", "--feature_dim", "16", "--d_min", "0.5",
        "--d_max", "4.0", "--img_width", "96", "--img_height", "64",
        "--res_dir", res, "--exp_name", "t",
    ])
    out_dir = os.path.join(res, "t_0")
    ds = [f for f in sorted(os.listdir(out_dir)) if f.startswith("d_")]
    # refs 2..6; only ref 6's window [4..8] touches the bad pose at 8,
    # so exactly 4 frames survive
    assert len(ds) == 4


def test_chunked_loop_cached_features(scene_root, tmp_path):
    """run_trajectory(cache_features=True): every unique frame featurized
    once per chunk (per-frame BN statistics) must reproduce the stepwise
    per-frame-BN oracle pgm-for-pgm — caching is pure reuse."""
    import jax
    import jax.numpy as jnp

    from neuralrgbd_tpu.config import ModelConfig, TrainConfig
    from neuralrgbd_tpu.data.scannet import make_trajectory
    from neuralrgbd_tpu.data.trajectory import window_batch
    from neuralrgbd_tpu.infer.export import read_pgm
    from neuralrgbd_tpu.infer.loop import run_trajectory
    from neuralrgbd_tpu.infer.step import make_frame_features, make_infer_step
    from neuralrgbd_tpu.train import create_train_state

    cfg = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                      d_min=0.5, d_max=4.0)
    traj = make_trajectory(0, 5, scene_root, img_size_wh=(96, 64),
                           d_candi=cfg.d_candi)
    sample, _, _ = window_batch(traj, 2, 2, with_labels=True)
    state = create_train_state(cfg, TrainConfig(), sample)

    d_cache = str(tmp_path / "cache")
    n1 = run_trajectory(state.params, cfg, traj, d_cache, verbose=False,
                        chunk_t=8, cache_features=True)
    assert n1 == 5

    fe1 = make_frame_features(cfg)
    step = make_infer_step(cfg, with_features=True)
    D = cfg.ndepth
    w_dpv, h_dpv = traj.dpv_size_wh
    bv = jnp.full((1, D, h_dpv, w_dpv), -np.log(D), jnp.float32)
    valid = jnp.zeros((1,), bool)
    for k, ref_indx in enumerate(range(2, 7)):
        b, rec, ok = window_batch(traj, ref_indx, 2)
        assert ok
        sb = jax.tree.map(jnp.asarray, b)
        window = list(sb["srcs"][0]) + [sb["ref"][0]]
        l1s, fs = zip(*[fe1(state.params, fr) for fr in window])
        feats = (jnp.stack(l1s)[None], jnp.stack(fs)[None])
        out = step(state.params, sb, bv, valid, feats)
        bv, valid = out.bv_predict, jnp.ones((1,), bool)
        want_d = np.clip(np.asarray(out.depth[0]) * 1000.0, 0,
                         65535).astype(np.uint16)
        got_d = read_pgm(os.path.join(d_cache, f"d_{k:05d}.pgm"))
        np.testing.assert_allclose(
            got_d.astype(np.int64), want_d.astype(np.int64), atol=1,
            err_msg=f"frame {k}: cached-feature chunk loop diverged")


def test_chunked_loop_eager_fetch_matches_double_buffer(scene_root, tmp_path,
                                                        monkeypatch):
    """NRGBD_NO_DOUBLE_BUFFER=1 (eager per-chunk fetch) and the default
    double-buffered fetch ordering must export identical bytes — the
    buffering changes only WHEN the stacked fetch RPC is issued."""
    from neuralrgbd_tpu.config import ModelConfig, TrainConfig
    from neuralrgbd_tpu.data.scannet import make_trajectory
    from neuralrgbd_tpu.data.trajectory import window_batch
    from neuralrgbd_tpu.infer.export import read_pgm
    from neuralrgbd_tpu.infer.loop import run_trajectory
    from neuralrgbd_tpu.train import create_train_state

    cfg = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                      d_min=0.5, d_max=4.0)
    traj = make_trajectory(0, 5, scene_root, img_size_wh=(96, 64),
                           d_candi=cfg.d_candi)
    sample, _, _ = window_batch(traj, 2, 2, with_labels=True)
    state = create_train_state(cfg, TrainConfig(), sample)

    d_db = str(tmp_path / "db")
    n1 = run_trajectory(state.params, cfg, traj, d_db, verbose=False,
                        chunk_t=2)
    monkeypatch.setenv("NRGBD_NO_DOUBLE_BUFFER", "1")
    d_eager = str(tmp_path / "eager")
    n2 = run_trajectory(state.params, cfg, traj, d_eager, verbose=False,
                        chunk_t=2)
    assert n1 == n2 == 5
    for i in range(n1):
        for pre in ("d", "conf"):
            a = read_pgm(os.path.join(d_db, f"{pre}_{i:05d}.pgm"))
            b = read_pgm(os.path.join(d_eager, f"{pre}_{i:05d}.pgm"))
            np.testing.assert_array_equal(a, b)
