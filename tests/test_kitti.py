"""KITTI raw-format parsing on a fabricated drive."""

import os

import numpy as np
import PIL.Image
import pytest

from neuralrgbd_tpu.data import kitti


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    date = "2011_09_26"
    drive = f"{date}_drive_0001_sync"
    date_dir = root / date
    ddir = date_dir / drive
    (ddir / "image_02" / "data").mkdir(parents=True)
    (ddir / "oxts" / "data").mkdir(parents=True)

    W, H = 1242, 375
    fx, fy, cx, cy = 721.5, 721.5, 609.6, 172.9
    with open(date_dir / "calib_cam_to_cam.txt", "w") as f:
        f.write(f"S_rect_02: {W} {H}\n")
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write(f"P_rect_02: {fx} 0 {cx} -337.0 0 {fy} {cy} 0 0 0 1 0\n")
    with open(date_dir / "calib_velo_to_cam.txt", "w") as f:
        f.write("R: 0 -1 0 0 0 -1 1 0 0\nT: 0.27 0.0 -0.08\n")
    with open(date_dir / "calib_imu_to_velo.txt", "w") as f:
        f.write("R: 1 0 0 0 1 0 0 0 1\nT: -0.8 0.3 0.8\n")

    rng = np.random.RandomState(0)
    n = 16
    lat0, lon0 = 49.0, 8.43
    for i in range(n):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        PIL.Image.fromarray(img).save(
            ddir / "image_02" / "data" / f"{i:010d}.png")
        # drive east: longitude increases
        row = np.zeros(30)
        row[0] = lat0
        row[1] = lon0 + i * 1e-6
        row[2] = 112.0  # alt
        row[5] = 0.1    # yaw
        np.savetxt(ddir / "oxts" / "data" / f"{i:010d}.txt", row[None])
    return str(root)


def test_list_and_calib(kitti_root):
    drives = kitti.list_drives(kitti_root)
    assert len(drives) == 1
    K, T_cam2_imu, wh = kitti.load_calib(
        os.path.join(kitti_root, "2011_09_26"))
    assert wh == (1242, 375)
    np.testing.assert_allclose(K[0, 0], 721.5)
    # imu->velo->cam chain applied
    assert not np.allclose(T_cam2_imu, np.eye(4))


def test_oxts_poses_translate(kitti_root):
    rows = [np.array([49.0, 8.43 + i * 1e-6, 112.0, 0, 0, 0.1])
            for i in range(4)]
    poses = kitti.oxts_to_pose(rows)
    assert np.allclose(poses[0][:3, 3], 0)
    # eastward motion => x grows by scale*dlon*pi*R/180
    expect_dx = np.cos(np.radians(49.0)) * 1e-6 * np.pi * kitti.EARTH_RADIUS / 180
    np.testing.assert_allclose(poses[1][0, 3], expect_dx, rtol=1e-6)


def test_kitti_trajectory_shapes(kitti_root):
    d_candi = np.linspace(1.0, 60.0, 8).astype(np.float32)
    traj = kitti.make_trajectory(0, kitti_root, img_size_wh=(768, 256),
                                 crop_w=384, d_candi=d_candi)
    # 16 images, first/last 5 dropped
    assert len(traj) == 6
    rec = traj.frame(2)
    assert rec.img.shape == (256, 384, 3)        # cropped
    assert rec.img_raw.shape == (256, 384, 3)
    assert rec.pose_valid
    # K at the cropped DPV size: principal point at crop center
    assert traj.K_dpv[0, 2] == 384 * 0.25 / 2
    assert traj.dpv_size_wh == (96, 64)
    # consecutive frames: forward motion of ~0.08 m between frames in cam x/z
    from neuralrgbd_tpu.data.trajectory import window_batch

    batch, ref, valid = window_batch(traj, 2, 1)
    assert valid
    assert batch["srcs"].shape == (1, 2, 256, 384, 3)
    t = batch["poses"][0, 0, :3, 3]
    assert 0.01 < np.linalg.norm(t) < 0.2
