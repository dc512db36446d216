"""Data-layer failure modes: the validity gates must absorb real-dataset
messiness (missing files, ragged logs, stray archives) instead of crashing
or silently mis-posing frames."""

import os

import numpy as np
import PIL.Image
import pytest

from neuralrgbd_tpu.data import kitti
from neuralrgbd_tpu.data.scannet import read_pose_txt
from neuralrgbd_tpu.data.sevenscenes import get_seq_dirs
from neuralrgbd_tpu.data.synthetic import write_plane_scene
from neuralrgbd_tpu.data.trajectory import window_batch


def test_missing_pose_file_is_invalid(tmp_path):
    assert not np.isfinite(read_pose_txt(str(tmp_path / "nope.txt"))).any()


def test_malformed_pose_file_is_invalid(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("not a matrix\n")
    assert not np.isfinite(read_pose_txt(str(p))).any()


def test_missing_pose_resets_window(tmp_path):
    """Deleting one frame's pose file invalidates exactly the windows that
    touch it (the e2e recurrence-reset path is covered in test_data_e2e)."""
    from neuralrgbd_tpu.data.scannet import make_trajectory

    write_plane_scene(str(tmp_path), 0, n_frames=8)
    os.remove(tmp_path / "scene0000_00" / "frame-000020.pose.txt")
    traj = make_trajectory(0, 5, str(tmp_path))
    for ref in range(2, 6):
        _, _, ok = window_batch(traj, ref, 2)
        touches_4 = abs(ref - 4) <= 2
        assert ok == (not touches_4)


def test_missing_depth_file_digitizes_to_ignore(tmp_path):
    from neuralrgbd_tpu.config import ModelConfig
    from neuralrgbd_tpu.data.scannet import make_trajectory

    cfg = ModelConfig()
    write_plane_scene(str(tmp_path), 0, n_frames=6)
    os.remove(tmp_path / "scene0000_00" / "frame-000010.depth.pgm")
    traj = make_trajectory(0, 5, str(tmp_path), d_candi=cfg.d_candi)
    rec = traj.frame(2)
    assert rec.pose_valid                      # pose is fine, only GT gone
    assert (rec.dmap == 0).all()               # all-invalid depth
    assert (rec.dmap_digit == 0).all()         # the ignore bin
    rec3 = traj.frame(3)
    assert rec3.dmap.max() > 0                 # neighbors unaffected


def test_7scenes_stray_files_not_trajectories(tmp_path):
    scene = tmp_path / "office"
    for s in ("seq-01", "seq-02"):
        d = scene / s
        d.mkdir(parents=True)
    (scene / "seq-01.zip").write_bytes(b"PK")
    (scene / "seq-readme.txt").write_text("notes")
    dirs = get_seq_dirs(str(tmp_path))
    assert [os.path.basename(d) for d in dirs] == ["seq-01", "seq-02"]


def _write_kitti_drive(root, date, drive_num, n=14, skip_img=(),
                       skip_oxts=()):
    date_dir = root / date
    ddir = date_dir / f"{date}_drive_{drive_num:04d}_sync"
    (ddir / "image_02" / "data").mkdir(parents=True, exist_ok=True)
    (ddir / "oxts" / "data").mkdir(parents=True, exist_ok=True)
    W, H = 128, 64
    if not (date_dir / "calib_cam_to_cam.txt").exists():
        with open(date_dir / "calib_cam_to_cam.txt", "w") as f:
            f.write(f"S_rect_02: {W} {H}\n")
            f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
            f.write(f"P_rect_02: 100 0 {W/2} -30.0 0 100 {H/2} 0 0 0 1 0\n")
        with open(date_dir / "calib_velo_to_cam.txt", "w") as f:
            f.write("R: 0 -1 0 0 0 -1 1 0 0\nT: 0.27 0.0 -0.08\n")
        with open(date_dir / "calib_imu_to_velo.txt", "w") as f:
            f.write("R: 1 0 0 0 1 0 0 0 1\nT: -0.8 0.3 0.8\n")
    rng = np.random.RandomState(drive_num)
    for i in range(n):
        if i not in skip_img:
            img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
            PIL.Image.fromarray(img).save(
                ddir / "image_02" / "data" / f"{i:010d}.png")
        if i not in skip_oxts:
            row = np.zeros(30)
            row[0], row[1], row[2] = 49.0, 8.43 + i * 1e-6, 112.0
            np.savetxt(ddir / "oxts" / "data" / f"{i:010d}.txt", row[None])
    return ddir


def test_kitti_multi_date_multi_drive_listing(tmp_path):
    _write_kitti_drive(tmp_path, "2011_09_26", 1)
    _write_kitti_drive(tmp_path, "2011_09_26", 5)
    _write_kitti_drive(tmp_path, "2011_10_03", 27)
    drives = kitti.list_drives(str(tmp_path))
    assert drives == [
        ("2011_09_26", "2011_09_26_drive_0001_sync"),
        ("2011_09_26", "2011_09_26_drive_0005_sync"),
        ("2011_10_03", "2011_10_03_drive_0027_sync"),
    ]
    assert kitti.n_trajectories(str(tmp_path)) == 3
    # each index loads ITS drive (calib shared per date)
    t2 = kitti.make_trajectory(2, str(tmp_path), img_size_wh=(128, 64),
                               crop_w=64)
    assert t2.name == "2011_10_03_drive_0027_sync"


def test_kitti_short_oxts_log_invalidates_not_shifts(tmp_path):
    """OXTS log ends 3 packets early: the affected frames must become
    invalid-pose, and the EARLIER frames' poses must be unchanged (no
    off-by-one shift from positional pairing)."""
    _write_kitti_drive(tmp_path, "2011_09_26", 1, n=14,
                       skip_oxts={11, 12, 13})
    full = _write_kitti_drive(tmp_path / "full", "2011_09_26", 1, n=14)
    t_short = kitti.make_trajectory(0, str(tmp_path),
                                    img_size_wh=(128, 64), crop_w=64)
    t_full = kitti.make_trajectory(0, str(tmp_path / "full"),
                                   img_size_wh=(128, 64), crop_w=64)
    # frames map to ids 5..8 (len 4): ids 5..7 fine either way
    assert len(t_short) == 4
    for i in range(3):
        np.testing.assert_allclose(t_short.frame(i).ext_M,
                                   t_full.frame(i).ext_M)
        assert t_short.frame(i).pose_valid
    # id 8 < 11, still valid; now drop a MIDDLE packet instead
    _write_kitti_drive(tmp_path / "mid", "2011_09_26", 1, n=14,
                       skip_oxts={6})
    t_mid = kitti.make_trajectory(0, str(tmp_path / "mid"),
                                  img_size_wh=(128, 64), crop_w=64)
    assert not t_mid.frame(1).pose_valid          # id 6: missing packet
    assert t_mid.frame(2).pose_valid              # id 7: NOT shifted
    np.testing.assert_allclose(t_mid.frame(2).ext_M, t_full.frame(2).ext_M)
    _, _, ok = window_batch(t_mid, 1, 1)
    assert not ok


def test_kitti_missing_camera_frame_keeps_id_pairing(tmp_path):
    """A dropped camera frame compresses the image list; id-pairing must
    keep every remaining image on its own packet."""
    _write_kitti_drive(tmp_path, "2011_09_26", 1, n=15, skip_img={7})
    full = _write_kitti_drive(tmp_path / "full", "2011_09_26", 1, n=15)
    t = kitti.make_trajectory(0, str(tmp_path), img_size_wh=(128, 64),
                              crop_w=64)
    t_full = kitti.make_trajectory(0, str(tmp_path / "full"),
                                   img_size_wh=(128, 64), crop_w=64)
    # image list: ids 0..6,8..14 -> after drop-5: ids 6,8,9 (len(13-10)=3+1?)
    ids = [int(os.path.splitext(os.path.basename(p))[0])
           for p in t.img_paths]
    for i, fid in enumerate(ids):
        assert t.frame(i).pose_valid
        j = [int(os.path.splitext(os.path.basename(p))[0])
             for p in t_full.img_paths].index(fid) \
            if fid in [int(os.path.splitext(os.path.basename(p))[0])
                       for p in t_full.img_paths] else None
        if j is not None:
            np.testing.assert_allclose(t.frame(i).ext_M,
                                       t_full.frame(j).ext_M)


def test_kitti_missing_depth_gt_is_zero(tmp_path):
    _write_kitti_drive(tmp_path, "2011_09_26", 1, n=14)
    t = kitti.make_trajectory(0, str(tmp_path), img_size_wh=(128, 64),
                              crop_w=64, depth_gt_root=str(tmp_path / "gt"))
    rec = t.frame(0)
    assert rec.pose_valid
    assert (rec.dmap_imgsize == 0).all()
