"""End-to-end inference CLI runs on the KITTI and 7Scenes dataset layouts
(fabricated fixtures) — the loaders are unit-tested elsewhere; this drives
the FULL path: listing -> loader -> window loop -> chunked inference ->
export contract, per dataset family."""

import os

import numpy as np
import PIL.Image

from neuralrgbd_tpu.infer.export import read_pgm
from tests.test_data_hardening import _write_kitti_drive


def test_kitti_cli_end_to_end(tmp_path):
    _write_kitti_drive(tmp_path / "kitti", "2011_09_26", 1, n=20)
    from neuralrgbd_tpu.cli.test_kvnet import main

    res = str(tmp_path / "res")
    main([
        "--dataset", "kitti", "--dataset_path", str(tmp_path / "kitti"),
        "--ndepth", "8", "--feature_dim", "16",
        "--d_min", "1.0", "--d_max", "60.0",
        "--img_width", "192", "--img_height", "64", "--crop_w", "96",
        "--res_dir", res, "--exp_name", "k",
    ])
    out = os.path.join(res, "k_0")
    files = sorted(os.listdir(out))
    # 20 images - 10 dropped = 10 frames; refs 2..6 => 5 exports
    ds = [f for f in files if f.startswith("d_")]
    assert len(ds) == 5
    d = read_pgm(os.path.join(out, "d_00000.pgm"))
    assert d.shape == (64, 96)          # center-cropped width
    assert "scene_path_info.txt" in files


def _write_7scenes_seq(root, scene, seq, n=10):
    d = root / scene / seq
    d.mkdir(parents=True)
    rng = np.random.RandomState(hash(seq) % 2**31)
    for i in range(n):
        stem = d / f"frame-{i:06d}"
        img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
        PIL.Image.fromarray(img).save(str(stem) + ".color.png")
        dep = np.full((480, 640), 2000, np.uint16)
        dep[:10] = 65535                     # invalid-marker band
        PIL.Image.fromarray(dep).save(str(stem) + ".depth.png")
        pose = np.eye(4)
        pose[0, 3] = 0.03 * i
        np.savetxt(str(stem) + ".pose.txt", pose)
    return d


def test_7scenes_cli_end_to_end(tmp_path):
    root = tmp_path / "7scenes"
    _write_7scenes_seq(root, "office", "seq-01", n=10)
    from neuralrgbd_tpu.cli.test_kvnet import main

    res = str(tmp_path / "res")
    main([
        "--dataset", "7scenes", "--dataset_path", str(root),
        "--ndepth", "8", "--feature_dim", "16",
        "--d_min", "0.5", "--d_max", "4.0",
        "--img_width", "96", "--img_height", "64",
        "--res_dir", res, "--exp_name", "s",
    ])
    out = os.path.join(res, "s_0")
    files = sorted(os.listdir(out))
    ds = [f for f in files if f.startswith("d_")]
    assert len(ds) == 5                      # refs 2..6 of 10 frames
    d = read_pgm(os.path.join(out, "d_00000.pgm"))
    assert d.shape == (64, 96)
    c = read_pgm(os.path.join(out, "conf_00000.pgm"))
    assert c.max() <= 1000


def test_7scenes_cli_step3(tmp_path):
    """dat_indx_step=3 (the reference 7Scenes test setting) subsamples the
    frame list before windowing."""
    root = tmp_path / "7scenes"
    _write_7scenes_seq(root, "office", "seq-01", n=24)
    from neuralrgbd_tpu.cli.test_kvnet import main

    res = str(tmp_path / "res")
    main([
        "--dataset", "7scenes", "--dataset_path", str(root),
        "--dat_indx_step", "3",
        "--ndepth", "8", "--feature_dim", "16",
        "--d_min", "0.5", "--d_max", "4.0",
        "--img_width", "96", "--img_height", "64",
        "--res_dir", res, "--exp_name", "s3",
    ])
    out = os.path.join(res, "s3_0")
    ds = [f for f in sorted(os.listdir(out)) if f.startswith("d_")]
    # 24 frames step 3 -> 8; refs 2..4 => 3 exports
    assert len(ds) == 3
    lines = open(os.path.join(out, "scene_path_info.txt")).read().splitlines()
    assert lines[1].split("  ")[1].endswith("frame-000006.color.png")
