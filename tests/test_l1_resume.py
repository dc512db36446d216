"""L1 loss branch + train-CLI resume."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.data import synthetic_batch
from neuralrgbd_tpu.train import create_train_state, make_train_step

CFG = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                  d_min=0.5, d_max=4.0)


def test_l1_loss_branch_trains():
    tcfg = TrainConfig(lr=1e-4, loss_type="L1", weight_var=1e-3)
    batch, _ = synthetic_batch(CFG, n_lanes=1, img_hw=(32, 48), seed=0)
    state = create_train_state(CFG, tcfg, batch)
    step = make_train_step(CFG, tcfg)
    b = jax.tree.map(jnp.asarray, batch)
    bvp = jnp.full((1, 8, 8, 12), -np.log(8.0), jnp.float32)
    out = step(state, b, bvp, jnp.zeros((1,), bool), jax.random.PRNGKey(0))
    l1 = float(out.loss)
    assert np.isfinite(l1) and l1 > 0
    # L1 losses are metric-scale (meters), much smaller than NLL values
    assert l1 < 50
    out2 = step(out.state, b, out.bv_predict, jnp.ones((1,), bool),
                jax.random.PRNGKey(1))
    assert np.isfinite(float(out2.loss))


def test_train_cli_resume(tmp_path):
    from neuralrgbd_tpu.cli.train_kvnet import main
    from neuralrgbd_tpu.data.synthetic import write_scannet_scene

    root = str(tmp_path / "scene")
    write_scannet_scene(root, n_frames=12)
    common = [
        "--exp_name", "r", "--dataset", "scannet", "--dataset_path", root,
        "--ndepth", "8", "--feature_dim", "16", "--d_min", "0.5",
        "--d_max", "4.0", "--img_width", "96", "--img_height", "64",
        "--batch_size", "1", "--LR", "1e-4",
        "--save_dir", str(tmp_path / "sv"), "--log_dir", str(tmp_path / "lg"),
    ]
    s1 = main(common + ["--max_steps", "2"])
    assert int(s1.step) == 2
    s2 = main(common + ["--max_steps", "3", "--resume"])
    # resumed from step 2, ran 3 more
    assert int(s2.step) == 5
