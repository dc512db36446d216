"""LBA optimizer + DSO driver contract tests."""

import os
import stat

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.ops.camera import camera_from_K, rescale_K
from neuralrgbd_tpu.ops.rotations import unitq_to_rotation
from neuralrgbd_tpu.ops.sweep import backward_warp_by_depth
from neuralrgbd_tpu.pose import dso
from neuralrgbd_tpu.pose.lba import local_ba_direct, make_lba_program


def _cam_for(W, H, f=60.0):
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]], np.float32)
    return camera_from_K(K)


def test_lba_recovers_pose():
    """Construct an exact photometric problem: ref := warp(src, d, P*).
    Then loss(P*) = 0 and LBA from a perturbed init must move toward P*."""
    rng = np.random.RandomState(0)
    H, W, C = 64, 96, 3
    cams = [_cam_for(W // s, H // s, f=60.0 / s) for s in (4, 2, 1)]

    # smooth source texture (so photometric gradients are informative)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    src = np.stack([
        np.sin(xs / 7.0 + c) + np.cos(ys / 5.0 - c) for c in range(C)
    ], -1) + 0.1 * rng.rand(H, W, C).astype(np.float32)

    dmap = np.full((H, W), 2.0, np.float32)
    t_true = np.array([0.06, -0.03, 0.02], np.float32)
    R_true = np.eye(3, dtype=np.float32)
    pose_true = np.eye(4, dtype=np.float32)
    pose_true[:3, 3] = t_true

    ref = np.asarray(backward_warp_by_depth(
        jnp.asarray(src)[None], jnp.asarray(dmap),
        jnp.asarray(R_true)[None], jnp.asarray(t_true)[None], cams[-1]))[0]

    conf = np.ones((H, W), np.float32)
    init = pose_true.copy()
    init[:3, 3] += np.array([0.03, 0.02, -0.02], np.float32)  # perturb t

    out = np.asarray(local_ba_direct(
        ref, src[None], dmap, conf, cams, init[None],
        max_iter=60, step=0.01, opt_vars=(0, 1),
    ))[0]

    err_init = np.linalg.norm(init[:3, 3] - t_true)
    err_opt = np.linalg.norm(out[:3, 3] - t_true)
    assert err_opt < 0.4 * err_init, (err_init, err_opt)


def test_lba_program_matches_local_ba_direct():
    """The fused one-dispatch program (pyramid + chart + Adam + SE(3)
    assembly in a single jit; cli/test_kvnet_lba.py hot path) must agree
    with the building-block composition AND still solve the pose problem.

    Tolerance note: the two builds trace the same math through different
    jit boundaries; XLA fusion rounding differs at ~1e-7 and Adam on a
    photometric landscape amplifies it per iteration, so exact equality is
    not expected — a smooth well-conditioned problem keeps agreement tight.
    """
    rng = np.random.RandomState(1)
    H, W, C, V = 64, 96, 3, 2
    cams = [_cam_for(W // s, H // s, f=60.0 / s) for s in (4, 2, 1)]

    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    src = np.stack([
        np.sin(xs / 7.0 + c) + np.cos(ys / 5.0 - c) for c in range(C)
    ], -1) + 0.1 * rng.rand(H, W, C).astype(np.float32)
    imgs_src = np.stack([src, src])
    dmap = np.full((H, W), 2.0, np.float32)
    conf = np.ones((H, W), np.float32)

    t_true = np.array([0.06, -0.03, 0.02], np.float32)
    img_ref = np.asarray(backward_warp_by_depth(
        jnp.asarray(src)[None], jnp.asarray(dmap),
        jnp.eye(3, dtype=np.float32)[None], jnp.asarray(t_true)[None],
        cams[-1]))[0]

    inits = np.stack([np.eye(4, dtype=np.float32)] * V)
    inits[:, :3, 3] = t_true
    inits[0, :3, 3] += [0.03, 0.02, -0.02]
    inits[1, :3, 3] += [-0.02, 0.01, 0.015]

    ref_out = np.asarray(local_ba_direct(
        img_ref, imgs_src, dmap, conf, cams, inits,
        max_iter=8, step=0.01, opt_vars=(0, 1)))
    run = make_lba_program(cams, max_iter=8, step=0.01, opt_vars=(0, 1))
    fused_out = np.asarray(run(jnp.asarray(img_ref), jnp.asarray(imgs_src),
                               jnp.asarray(dmap), jnp.asarray(conf),
                               jnp.asarray(inits)))
    # (recovery itself is covered by test_lba_recovers_pose on
    # local_ba_direct; this allclose ties the fused program to it)
    np.testing.assert_allclose(fused_out, ref_out, rtol=1e-4, atol=2e-4)


def _write_result_txt(path, n=12, invalid_at=(3,)):
    rows = []
    for i in range(n):
        if i in invalid_at:
            rows.append(f"{i} InvalidPose")
        else:
            rows.append(f"{i} {0.01*i} {0.002*i} {-0.005*i} 0 0 0 1")
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


def test_dso_parser_and_validity(tmp_path):
    res = str(tmp_path / "result.txt")
    _write_result_txt(res)
    poses = dso.read_camera_poses(res)
    assert len(poses) == 12
    assert poses[3] == -1
    assert isinstance(poses[5], np.ndarray)
    np.testing.assert_allclose(poses[5][:3, 3], [0.05, 0.01, -0.025],
                               atol=1e-8)
    # identity (frame 0) and -1 are invalid; real poses valid
    assert not dso.valid_pose(poses[0])
    assert not dso.valid_pose(poses[3])
    assert dso.valid_pose(poses[5])
    assert not dso.valid_poses(poses, [2, 3])
    assert dso.valid_poses(poses, [2, 4])


def test_dso_filter_smooths_translation(tmp_path):
    res = str(tmp_path / "result.txt")
    rng = np.random.RandomState(0)
    rows = []
    n = 60
    for i in range(n):
        t = 0.01 * i + 0.005 * rng.randn(3)
        rows.append(f"{i} {t[0]} {t[1]} {t[2]} 0 0 0 1")
    with open(res, "w") as f:
        f.write("\n".join(rows) + "\n")
    raw = dso.read_camera_poses(res, if_filter=False)
    filt = dso.read_camera_poses(res, if_filter=True)
    tx_raw = np.array([p[0, 3] for p in raw])
    tx_f = np.array([p[0, 3] for p in filt])
    # smoother: smaller second difference energy, same endpoints-ish
    assert np.abs(np.diff(tx_f, 2)).mean() < 0.5 * np.abs(np.diff(tx_raw, 2)).mean()
    # homogeneous row untouched (the reference's filter bug wrote row 3)
    assert all(np.allclose(p[3], [0, 0, 0, 1]) for p in filt)


def test_run_dso_subprocess_contract(tmp_path):
    """Fake dso_dataset binary: check camera.txt + invocation + parsing."""
    bin_path = str(tmp_path / "dso_dataset")
    result_capture = str(tmp_path / "seen_args.txt")
    with open(bin_path, "w") as f:
        f.write(
            "#!/bin/sh\n"
            f'echo "$@" > {result_capture}\n'
            'echo "0 InvalidPose" > result.txt\n'
            'echo "1 0.1 0.0 0.0 0 0 0 1" >> result.txt\n'
        )
    os.chmod(bin_path, os.stat(bin_path).st_mode | stat.S_IEXEC)

    K = np.array([[585.0, 0, 319.5], [0, 585.0, 239.5], [0, 0, 1]])
    poses = dso.run_dso(
        str(tmp_path / "imgs"), K, (640, 480), dso_bin_path=bin_path,
        result_path=str(tmp_path / "out.txt"), workdir=str(tmp_path),
    )
    assert poses[0] == -1 and isinstance(poses[1], np.ndarray)
    seen = open(result_capture).read()
    assert "preset=2" in seen and "mode=1" in seen and "nogui=1" in seen
    cam = open(str(tmp_path / "camera.txt")).read().splitlines()
    fx, fy, cx, cy, gamma = [float(x) for x in cam[0].split()]
    np.testing.assert_allclose(fx, 585.0 / 640)
    np.testing.assert_allclose(cx, (319.5 + 0.5) / 640)
    assert cam[1] == "640 480" and cam[2] == "crop"


def test_init_traj_and_scale():
    poses = [np.eye(4) for _ in range(10)]
    for i in range(10):
        p = np.eye(4)
        p[:3, 3] = [0.02 * i, 0, 0]
        p[0, 1] = 1e-9  # not exactly identity => valid
        poses[i] = p
    traj = [np.linalg.inv(p) for p in poses]
    s = dso.estimate_metric_scale(traj, focal_length=100.0, d_max=5.0,
                                  dat_indx_step=1)
    # baselines |t_i - t_{i-2}| = 0.04 => scale = 5/(100*0.04/2) = 2.5
    np.testing.assert_allclose(s, 2.5, rtol=1e-5)
    dso.rescale_traj_t(traj, s)
    np.testing.assert_allclose(traj[2][:3, 3],
                               np.linalg.inv(poses[2])[:3, 3] * 2.5)
