"""refine_dup (4x depth-upsampled refinement labels) + augmentation wiring.

Reference: train_utils/train_KVNet.py:25,74-75,107-108 (loss branch),
scanNet.py:327,419-422 (dmap_up4_imgsize_digit labels), Refine.py:44-49
(upsample_D), utils/preprocess.py:67-77 (the shipped-but-unwired
augmentation suite, wired here behind TrainConfig.augment).
"""

import numpy as np

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.data.batch_loader import BatchGroup
from neuralrgbd_tpu.data.scannet import make_trajectory
from neuralrgbd_tpu.data.synthetic import synthetic_batch, write_plane_scene
from neuralrgbd_tpu.train import create_train_state, make_train_step

CFG = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                  d_min=0.5, d_max=4.0, refine_dup=True)
TCFG = TrainConfig(lr=1e-4)


def _traj(tmp_path, up4=True):
    root = str(tmp_path)
    write_plane_scene(root, 0, n_frames=8)
    t = make_trajectory(0, 5, root, img_size_wh=(48, 32),
                        d_candi=CFG.d_candi, up4_labels=up4)
    return t


def test_up4_labels_match_reference_formula(tmp_path):
    traj = _traj(tmp_path)
    rec = traj.frame(2)
    assert rec.dmap_up4_imgsize_digit is not None
    # scanNet.py:327,419-421: digitize against linspace(min, max, 4*D),
    # clamp into [0, 4D-1]
    dup4 = np.linspace(CFG.d_min, CFG.d_max, 4 * CFG.ndepth)
    want = np.digitize(rec.dmap_imgsize, dup4)
    want = np.clip(want, 0, len(dup4) - 1).astype(np.int32)
    np.testing.assert_array_equal(rec.dmap_up4_imgsize_digit, want)
    assert rec.dmap_up4_imgsize_digit.max() < 4 * CFG.ndepth
    # and the up4 grid genuinely refines: more distinct bins than D-grid
    assert (len(np.unique(rec.dmap_up4_imgsize_digit))
            >= len(np.unique(rec.dmap_imgsize_digit)))


def test_enable_up4_labels_post_hoc(tmp_path):
    traj = _traj(tmp_path, up4=False)
    assert traj.frame(2).dmap_up4_imgsize_digit is None
    traj.enable_up4_labels()
    assert traj.frame(2).dmap_up4_imgsize_digit is not None


def test_refine_dup_train_step_runs():
    batch, _ = synthetic_batch(CFG, n_lanes=1, img_hw=(32, 48), seed=0)
    state = create_train_state(CFG, TCFG, batch)
    step = make_train_step(CFG, TCFG)
    h, w = 8, 12
    bvp = jnp.full((1, CFG.ndepth, h, w), -np.log(CFG.ndepth), jnp.float32)
    out = step(state, jax.tree.map(jnp.asarray, batch), bvp,
               jnp.ones((1,), bool), jax.random.PRNGKey(0))
    assert np.isfinite(float(out.loss))
    # params moved
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(out.state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_refine_dup_infer_depth_uses_up4_grid():
    from neuralrgbd_tpu.infer import make_infer_step

    batch, _ = synthetic_batch(CFG, n_lanes=1, img_hw=(32, 48), seed=0)
    state = create_train_state(CFG, TCFG, batch)
    istep = make_infer_step(CFG)
    b = {k: jnp.asarray(batch[k])
         for k in ("ref", "srcs", "poses", "K", "pose_next")}
    bvp = jnp.full((1, CFG.ndepth, 8, 12), -np.log(CFG.ndepth), jnp.float32)
    out = istep(state.params, b, bvp, jnp.ones((1,), bool))
    assert out.dpv_refined.shape == (1, 4 * CFG.ndepth, 32, 48)
    assert np.isfinite(np.asarray(out.depth)).all()
    d = np.asarray(out.depth)
    assert d.min() >= CFG.d_min - 1e-3 and d.max() <= CFG.d_max + 1e-3


def test_augment_window_consistent(tmp_path):
    traj = _traj(tmp_path)
    rng = np.random.RandomState(0)
    g_aug = BatchGroup([traj, traj], t_win_r=1, step=1, rng=rng,
                       augment=True)
    g_raw = BatchGroup([traj, traj], t_win_r=1, step=1,
                       rng=np.random.RandomState(0))
    b0, _ = g_aug.frame_batch(0)
    b1, _ = g_aug.frame_batch(1)
    r0, _ = g_raw.frame_batch(0)
    # augmentation changed the images
    assert not np.allclose(b0["ref"], r0["ref"])
    # photoconsistency: frame i+1's window shares frames with frame i's —
    # the shared frame must carry the IDENTICAL augmented pixels.
    # window at t=0 (t_win_r=1): srcs = [ref-1, ref+1]; at t=1 its ref
    # IS window-0's right source.
    np.testing.assert_array_equal(b0["srcs"][:, 1], b1["ref"])
    # different lanes draw different parameters
    assert not np.allclose(b0["ref"][0], b0["ref"][1])
