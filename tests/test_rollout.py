"""On-device scan rollout: matches the per-step loop frame by frame."""

import numpy as np

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.data import synthetic_batch
from neuralrgbd_tpu.infer import make_infer_step
from neuralrgbd_tpu.infer.rollout import make_rollout
from neuralrgbd_tpu.train import create_train_state

CFG = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                  d_min=0.5, d_max=4.0)


def test_rollout_matches_stepwise():
    T = 3
    batch, _ = synthetic_batch(CFG, n_lanes=1, img_hw=(32, 48), seed=0)
    state = create_train_state(CFG, TrainConfig(), batch)
    keys = ("ref", "srcs", "poses", "K", "pose_next")
    frames = {k: jnp.asarray(np.stack([batch[k]] * T)) for k in keys}

    def bvp0():
        # fresh array per consumer: both rollout and infer_step DONATE the
        # carry buffer, so sharing one array raises 'Array has been deleted'
        return jnp.full((1, 8, 8, 12), -np.log(8.0), jnp.float32)

    valid0 = jnp.zeros((1,), bool)

    rollout = make_rollout(CFG)
    depths, confs, bv_final = rollout(state.params, frames, bvp0(), valid0)
    assert depths.shape == (T, 1, 32, 48)

    # stepwise reference
    step = make_infer_step(CFG)
    bvp, valid = bvp0(), valid0
    sb = {k: jnp.asarray(batch[k]) for k in keys}
    for t in range(T):
        out = step(state.params, sb, bvp, valid)
        np.testing.assert_allclose(np.asarray(depths[t]),
                                   np.asarray(out.depth), rtol=2e-4,
                                   atol=1e-4)
        bvp, valid = out.bv_predict, jnp.ones((1,), bool)
    np.testing.assert_allclose(np.asarray(bv_final), np.asarray(bvp),
                               rtol=2e-4, atol=1e-4)
