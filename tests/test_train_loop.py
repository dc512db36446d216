"""Training loop + scheduler + checkpoint round-trip on synthetic scenes."""

import os

import numpy as np
import pytest

import jax

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.data.batch_loader import BatchScheduler
from neuralrgbd_tpu.data.scannet import make_trajectory
from neuralrgbd_tpu.data.synthetic import write_scannet_scene

CFG = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                  d_min=0.5, d_max=4.0)
TCFG = TrainConfig(lr=1e-4, tb_add_img_interv=5, save_model_interv=100000)
IMG_WH = (96, 64)


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet_train")
    write_scannet_scene(str(root), n_frames=12)
    return str(root)


def _make_traj_factory(root):
    def make(i):
        return make_trajectory(0, 5, root, img_size_wh=IMG_WH,
                               d_candi=CFG.d_candi)

    return make


def test_batch_scheduler_shapes(scene_root):
    make = _make_traj_factory(scene_root)
    sched = BatchScheduler(make, n_traj=4, batch_size=2, t_win_r=2)
    assert len(sched) == 2
    group = next(iter(sched))
    assert group.traj_len > 0
    batch, refs = group.frame_batch(0)
    assert batch["ref"].shape == (2, 64, 96, 3)
    assert batch["dmap_digit"].shape == (2, 16, 24)
    assert batch["lane_valid"].shape == (2,)
    assert len(refs) == 2


def test_train_epochs_runs_and_checkpoints(scene_root, tmp_path):
    from neuralrgbd_tpu.data.trajectory import window_batch
    from neuralrgbd_tpu.train import create_train_state
    from neuralrgbd_tpu.train.loop import train_epochs
    from neuralrgbd_tpu.utils.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
    )

    make = _make_traj_factory(scene_root)
    sample, _, _ = window_batch(make(0), 2, 2, with_labels=True)
    state = create_train_state(CFG, TCFG, sample)
    save_dir = str(tmp_path / "ckpt")

    out_state = train_epochs(
        state, CFG, TCFG, make, n_traj=2, batch_size=2, n_epoch=1,
        log_dir=str(tmp_path / "tb"), save_dir=save_dir, max_steps=3,
        verbose=False,
    )
    assert int(out_state.step) == 3
    # params changed
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(out_state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))

    # checkpoint round-trip
    path = latest_checkpoint(save_dir)
    assert path is not None
    restored, extra = restore_checkpoint(path, state)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(out_state.params)[0]),
    )
    assert int(restored.step) == 3

    # TB event files exist
    tb_files = os.listdir(str(tmp_path / "tb"))
    assert any("tfevents" in f for f in tb_files)

    # params-only restore across an OPTIMIZER STRUCTURE change: a ckpt
    # saved from an LR-schedule run must restore into a constant-LR eval
    # template (regression: the r4 coarse-D gate failed exactly here)
    from neuralrgbd_tpu.utils.checkpoint import restore_params_only

    sched_tcfg = TrainConfig(lr=1e-4, lr_schedule="cosine",
                             lr_decay_steps=100,
                             save_model_interv=100000)
    sample, _, _ = window_batch(make(0), 2, 2, with_labels=True)
    sched_state = create_train_state(CFG, sched_tcfg, sample)
    assert (jax.tree.structure(sched_state.opt_state)
            != jax.tree.structure(state.opt_state))
    eval_state = restore_params_only(path, sched_state)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(eval_state.params)[0]),
        np.asarray(jax.tree.leaves(out_state.params)[0]),
    )
    assert int(eval_state.step) == 3


def test_train_cli_smoke(scene_root, tmp_path):
    """Drive the real training CLI end-to-end for a few steps."""
    from neuralrgbd_tpu.cli.train_kvnet import main

    main([
        "--exp_name", "t", "--dataset", "scannet",
        "--dataset_path", scene_root,
        "--ndepth", "8", "--feature_dim", "16", "--d_min", "0.5",
        "--d_max", "4.0", "--img_width", "96", "--img_height", "64",
        "--batch_size", "2", "--max_steps", "2", "--LR", "1e-4",
        "--grad_clip_max", "2.0",
        "--save_dir", str(tmp_path / "sm"), "--log_dir", str(tmp_path / "runs"),
    ])
    assert os.path.isfile(str(tmp_path / "runs" / "t" / "tr_paras.txt"))
    cks = os.listdir(str(tmp_path / "sm" / "t"))
    assert any(c.startswith("ckpt_") for c in cks)


def test_lr_schedule_shapes():
    """make_lr_schedule: constant reproduces the reference fixed LR;
    cosine decays to lr*lr_min_ratio at the horizon; step halves."""
    from neuralrgbd_tpu.config import TrainConfig
    from neuralrgbd_tpu.train.step import make_lr_schedule

    assert make_lr_schedule(TrainConfig(lr=1e-4)) == 1e-4
    cos = make_lr_schedule(TrainConfig(
        lr=1e-4, lr_schedule="cosine", lr_decay_steps=100,
        lr_min_ratio=0.1, lr_warmup_steps=10))
    assert float(cos(0)) < 2e-5          # warmup from 0
    assert abs(float(cos(10)) - 1e-4) < 1e-9
    assert abs(float(cos(100)) - 1e-5) < 1e-9
    assert abs(float(cos(1000)) - 1e-5) < 1e-9  # clamped past horizon
    step = make_lr_schedule(TrainConfig(
        lr=1e-4, lr_schedule="step", lr_decay_steps=50))
    assert abs(float(step(0)) - 1e-4) < 1e-9
    assert abs(float(step(50)) - 5e-5) < 1e-9
    assert abs(float(step(100)) - 2.5e-5) < 1e-9
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown lr_schedule"):
        make_lr_schedule(TrainConfig(lr_schedule="bogus"))
