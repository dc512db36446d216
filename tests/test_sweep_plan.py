"""Per-trajectory sweep planning (infer/loop.plan_sweep).

The fused Pallas sweep is exact only while each output row's y-taps fit a
``band``-row source band; the plan measures the trajectory's actual worst-
case spread up front (ADVICE round 2, medium) and picks the smallest exact
band — 4 for small motion (halves the selection matmuls), 8/16 as the
ladder, XLA fallback with a loud warning beyond.
"""

import warnings

import numpy as np
import pytest

from neuralrgbd_tpu.config import ModelConfig
from neuralrgbd_tpu.data.scannet import make_trajectory
from neuralrgbd_tpu.data.synthetic import write_plane_scene
from neuralrgbd_tpu.infer.loop import plan_sweep

CFG = ModelConfig()


def _traj(tmp_path, roll_deg=0.0):
    root = str(tmp_path)
    scene = write_plane_scene(root, 0, n_frames=8)
    if roll_deg:
        # overwrite poses with a per-frame roll about the optical axis:
        # rows of the source view tilt by ~W*tan(roll) pixels — the exact
        # failure mode the band precondition protects against
        for i in range(8):
            a = np.radians(roll_deg) * i
            c2w = np.eye(4)
            c2w[:3, :3] = np.array([[np.cos(a), -np.sin(a), 0],
                                    [np.sin(a), np.cos(a), 0],
                                    [0, 0, 1]])
            np.savetxt(f"{scene}/frame-{i * 5:06d}.pose.txt", c2w,
                       fmt="%.7f")
    return make_trajectory(0, 5, root, img_size_wh=(384, 256),
                           d_candi=CFG.d_candi)


def test_small_motion_picks_tight_band(tmp_path):
    traj = _traj(tmp_path)
    fast, band = plan_sweep(traj, CFG, t_win_r=2, step=1, enabled=True)
    assert fast is True
    assert band in (4, 8)    # plane scenes move gently; 4 expected


def test_large_roll_falls_back_to_xla(tmp_path):
    traj = _traj(tmp_path, roll_deg=12.0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fast, band = plan_sweep(traj, CFG, t_win_r=2, step=1, enabled=True)
    assert fast is False
    assert any("fused" in str(x.message) for x in w)


def test_disabled_backend_is_neutral(tmp_path):
    traj = _traj(tmp_path)
    assert plan_sweep(traj, CFG, t_win_r=2, step=1, enabled=False) == (None, 8)
