"""Cached-feature rollout (infer/rollout.make_rollout(cache_features=True)).

Consecutive sliding windows share V of their V+1 frames, so the cached
rollout featurizes one frame per step (per-frame BN statistics — the
window-independent semantics that make caching coherent) and must match a
stepwise recompute that featurizes every window frame fresh with the SAME
per-frame statistics. Reference behavior being accelerated:
``test_utils/test_KVNet.py:19-67`` per-window forward over
``basic.py:245-252`` features.
"""

import numpy as np

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig
from neuralrgbd_tpu.data.scannet import make_trajectory
from neuralrgbd_tpu.data.synthetic import write_plane_scene
from neuralrgbd_tpu.data.trajectory import window_batch
from neuralrgbd_tpu.infer.rollout import make_rollout
from neuralrgbd_tpu.infer.step import make_infer_step
from neuralrgbd_tpu.models.feature_extractor import FeatureExtractor
from neuralrgbd_tpu.train import create_train_state
from neuralrgbd_tpu.config import TrainConfig

CFG = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                  d_min=0.5, d_max=4.0)
T_WIN_R = 2


def _sliding_frames(tmp_path, T=3):
    """Real sliding windows from a rendered multi-view-consistent scene."""
    root = str(tmp_path)
    write_plane_scene(root, 0, n_frames=T + 2 * T_WIN_R + 1)
    traj = make_trajectory(0, 5, root, img_size_wh=(48, 32),
                           d_candi=CFG.d_candi)
    batches = []
    for t in range(T):
        b, _, valid = window_batch(traj, T_WIN_R + t, T_WIN_R)
        assert valid
        batches.append(b)
    return {k: jnp.asarray(np.stack([b[k] for b in batches]))
            for k in batches[0]}


def test_cached_rollout_matches_perframe_stepwise(tmp_path):
    T = 3
    frames = _sliding_frames(tmp_path, T)
    batch0 = {k: np.asarray(v[0]) for k, v in frames.items()}
    state = create_train_state(CFG, TrainConfig(), batch0)

    D, h, w = CFG.ndepth, 8, 12

    def bvp0():
        return jnp.full((1, D, h, w), -np.log(float(D)), jnp.float32)

    valid0 = jnp.zeros((1,), bool)

    rollout = make_rollout(CFG, cache_features=True)
    depths, confs, bv_final = rollout(state.params, frames, bvp0(), valid0)
    assert depths.shape == (T, 1, 32, 48)
    assert np.isfinite(np.asarray(depths)).all()

    # stepwise oracle: featurize EVERY window frame fresh, per-frame BN
    fe = FeatureExtractor(feature_dim=CFG.feature_dim, multi_scale=True,
                          dtype=jnp.dtype(CFG.dtype))

    def fe1(frame):
        l1, f = fe.apply(
            {"params": state.params["params"]["feature_extractor"]},
            frame[None])
        return l1[0], f[0]

    step = make_infer_step(CFG, with_features=True)
    bvp, valid = bvp0(), valid0
    for t in range(T):
        sb = {k: v[t] for k, v in frames.items()}
        window = list(sb["srcs"][0]) + [sb["ref"][0]]  # [srcs..., ref]
        l1s, fs = zip(*[fe1(fr) for fr in window])
        feats = (jnp.stack(l1s)[None], jnp.stack(fs)[None])
        out = step(state.params, sb, bvp, valid, feats)
        np.testing.assert_allclose(np.asarray(depths[t]),
                                   np.asarray(out.depth), rtol=2e-4,
                                   atol=1e-4)
        bvp, valid = out.bv_predict, jnp.ones((1,), bool)
    np.testing.assert_allclose(np.asarray(bv_final), np.asarray(bvp),
                               rtol=2e-4, atol=1e-4)


def test_cached_rollout_depth_class_vs_default(tmp_path):
    """Per-frame vs window BN statistics: same scene, depths must stay in
    the same class (it's a deviation, not a different function)."""
    T = 3
    frames = _sliding_frames(tmp_path, T)
    batch0 = {k: np.asarray(v[0]) for k, v in frames.items()}
    state = create_train_state(CFG, TrainConfig(), batch0)
    D, h, w = CFG.ndepth, 8, 12

    def bvp0():
        return jnp.full((1, D, h, w), -np.log(float(D)), jnp.float32)

    valid0 = jnp.zeros((1,), bool)
    d_cached, _, _ = make_rollout(CFG, cache_features=True)(
        state.params, frames, bvp0(), valid0)
    d_def, _, _ = make_rollout(CFG)(state.params, frames, bvp0(), valid0)
    # random weights exaggerate BN-stat sensitivity; just bound the class
    dd = np.abs(np.asarray(d_cached) - np.asarray(d_def))
    assert np.isfinite(dd).all()
    assert dd.mean() < 0.5, dd.mean()


def test_fe_per_frame_bn_model_matches_cached_rollout(tmp_path):
    """ModelConfig.fe_per_frame_bn=True bakes the cached rollout's
    per-frame BN statistics into the model itself (the trainable
    deployment configuration, VERDICT r4 item 3): the UNCACHED rollout on
    that config must match the cached rollout — caching is then pure
    reuse with no semantic deviation at all."""
    cfg = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                      d_min=0.5, d_max=4.0, fe_per_frame_bn=True)
    T = 3
    frames = _sliding_frames(tmp_path, T)
    batch0 = {k: np.asarray(v[0]) for k, v in frames.items()}
    state = create_train_state(cfg, TrainConfig(), batch0)
    D, h, w = cfg.ndepth, 8, 12

    def bvp0():
        return jnp.full((1, D, h, w), -np.log(float(D)), jnp.float32)

    valid0 = jnp.zeros((1,), bool)
    d_plain, _, bv_plain = make_rollout(cfg, cache_features=False)(
        state.params, frames, bvp0(), valid0)
    d_cached, _, bv_cached = make_rollout(cfg, cache_features=True)(
        state.params, frames, bvp0(), valid0)
    np.testing.assert_allclose(np.asarray(d_plain), np.asarray(d_cached),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bv_plain), np.asarray(bv_cached),
                               rtol=2e-4, atol=1e-4)


def test_fe_per_frame_bn_trains():
    """The per-frame-BN + coarse-D deployment configuration is trainable:
    gradients are finite and a step reduces the loss on a fixed batch."""
    from neuralrgbd_tpu.data import synthetic_batch
    from neuralrgbd_tpu.train import make_train_step

    cfg = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                      d_min=0.5, d_max=4.0, fe_per_frame_bn=True,
                      knet_coarse_d=2)
    batch, _ = synthetic_batch(cfg, n_lanes=1, img_hw=(32, 48), seed=0)
    batch = jax.tree.map(jnp.asarray, batch)
    state = create_train_state(cfg, TrainConfig(lr=1e-3), batch)
    step = make_train_step(cfg, TrainConfig(lr=1e-3))
    D = cfg.ndepth
    bvp = jnp.full((1, D, 8, 12), -np.log(float(D)), jnp.float32)
    losses = []
    for i in range(3):
        out = step(state, batch, bvp, jnp.zeros((1,), bool),
                   jax.random.PRNGKey(i))
        state = out.state
        bvp = jnp.full((1, D, 8, 12), -np.log(float(D)), jnp.float32)
        losses.append(float(out.loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
