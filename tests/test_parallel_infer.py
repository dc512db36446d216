"""Lockstep DP inference over trajectories on the virtual mesh."""

import os

import numpy as np
import pytest

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.data.scannet import make_trajectory
from neuralrgbd_tpu.data.synthetic import write_scannet_scene
from neuralrgbd_tpu.data.trajectory import window_batch

CFG = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                  d_min=0.5, d_max=4.0)
IMG_WH = (96, 64)


def test_run_trajectories_parallel(tmp_path):
    import jax

    from neuralrgbd_tpu.infer.loop import run_trajectories_parallel
    from neuralrgbd_tpu.parallel import make_mesh
    from neuralrgbd_tpu.train import create_train_state

    # two scenes of different lengths
    rootA = str(tmp_path / "a")
    rootB = str(tmp_path / "b")
    write_scannet_scene(rootA, n_frames=10, seed=0)
    write_scannet_scene(rootB, n_frames=8, seed=1)
    trajs = [
        make_trajectory(0, 5, rootA, img_size_wh=IMG_WH, d_candi=CFG.d_candi),
        make_trajectory(0, 5, rootB, img_size_wh=IMG_WH, d_candi=CFG.d_candi),
    ]

    sample, _, _ = window_batch(trajs[0], 2, 2, with_labels=True)
    state = create_train_state(CFG, TrainConfig(), sample)

    res_dirs = [str(tmp_path / "res_a"), str(tmp_path / "res_b")]
    mesh = make_mesh(2)
    counts = run_trajectories_parallel(
        state.params, CFG, trajs, res_dirs, mesh=mesh, verbose=False
    )
    # traj A: refs 2..6 => 5 frames; traj B: refs 2..4 => 3 frames
    assert counts == [5, 3]
    for rd, c in zip(res_dirs, counts):
        files = os.listdir(rd)
        assert sum(f.startswith("d_") for f in files) == c
        assert "scene_path_info.txt" in files

    # lane A's outputs must match single-lane inference exactly (lane
    # independence through the shared mesh step)
    from neuralrgbd_tpu.infer.loop import run_trajectory

    solo_dir = str(tmp_path / "solo_a")
    run_trajectory(state.params, CFG, trajs[0], solo_dir, verbose=False)
    from neuralrgbd_tpu.infer.export import read_pgm

    for i in range(5):
        a = read_pgm(os.path.join(res_dirs[0], f"d_{i:05d}.pgm"))
        b = read_pgm(os.path.join(solo_dir, f"d_{i:05d}.pgm"))
        np.testing.assert_allclose(a.astype(np.int64), b.astype(np.int64),
                                   atol=1)  # uint16 mm, 1mm slop


def test_run_trajectories_parallel_cached_features(tmp_path):
    """Lockstep DP inference with per-chunk feature caching must match the
    single-lane cached loop pgm-for-pgm (lane independence of the cached
    path's double-vmap featurization)."""
    from neuralrgbd_tpu.infer.export import read_pgm
    from neuralrgbd_tpu.infer.loop import (run_trajectories_parallel,
                                           run_trajectory)
    from neuralrgbd_tpu.parallel import make_mesh
    from neuralrgbd_tpu.train import create_train_state

    rootA = str(tmp_path / "a")
    rootB = str(tmp_path / "b")
    write_scannet_scene(rootA, n_frames=10, seed=0)
    write_scannet_scene(rootB, n_frames=8, seed=1)
    trajs = [
        make_trajectory(0, 5, rootA, img_size_wh=IMG_WH, d_candi=CFG.d_candi),
        make_trajectory(0, 5, rootB, img_size_wh=IMG_WH, d_candi=CFG.d_candi),
    ]
    sample, _, _ = window_batch(trajs[0], 2, 2, with_labels=True)
    state = create_train_state(CFG, TrainConfig(), sample)

    res_dirs = [str(tmp_path / "res_a"), str(tmp_path / "res_b")]
    counts = run_trajectories_parallel(
        state.params, CFG, trajs, res_dirs, mesh=make_mesh(2),
        verbose=False, cache_features=True)
    assert counts == [5, 3]

    solo_dir = str(tmp_path / "solo_a")
    run_trajectory(state.params, CFG, trajs[0], solo_dir, verbose=False,
                   cache_features=True)
    for i in range(5):
        a = read_pgm(os.path.join(res_dirs[0], f"d_{i:05d}.pgm"))
        b = read_pgm(os.path.join(solo_dir, f"d_{i:05d}.pgm"))
        np.testing.assert_allclose(a.astype(np.int64), b.astype(np.int64),
                                   atol=1)


def test_run_trajectories_parallel_more_lanes_than_devices(tmp_path):
    """4 ragged lanes block-mapped onto a 2-device mesh (lane i -> device
    i // 2): the one-chip multi-trajectory shape (tools/bench_multi_traj.py)
    where every lane batches onto the same device. Each lane's exports must
    match its own single-lane run exactly."""
    from neuralrgbd_tpu.infer.export import read_pgm
    from neuralrgbd_tpu.infer.loop import (run_trajectories_parallel,
                                           run_trajectory)
    from neuralrgbd_tpu.parallel import make_mesh
    from neuralrgbd_tpu.train import create_train_state

    lengths = [10, 8, 9, 11]
    trajs = []
    for li, L in enumerate(lengths):
        root = str(tmp_path / f"s{li}")
        write_scannet_scene(root, n_frames=L, seed=li)
        trajs.append(make_trajectory(0, 5, root, img_size_wh=IMG_WH,
                                     d_candi=CFG.d_candi))
    sample, _, _ = window_batch(trajs[0], 2, 2, with_labels=True)
    state = create_train_state(CFG, TrainConfig(), sample)

    res_dirs = [str(tmp_path / f"res{li}") for li in range(4)]
    counts = run_trajectories_parallel(
        state.params, CFG, trajs, res_dirs, mesh=make_mesh(2), verbose=False)
    assert counts == [L - 5 for L in lengths]

    for li in (0, 3):                      # one lane per device block
        solo = str(tmp_path / f"solo{li}")
        run_trajectory(state.params, CFG, trajs[li], solo, verbose=False)
        for i in range(counts[li]):
            a = read_pgm(os.path.join(res_dirs[li], f"d_{i:05d}.pgm"))
            b = read_pgm(os.path.join(solo, f"d_{i:05d}.pgm"))
            np.testing.assert_allclose(a.astype(np.int64),
                                       b.astype(np.int64), atol=1)
