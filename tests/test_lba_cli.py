"""End-to-end pose-free pipeline test: single-folder capture + fake DSO
result -> test_kvnet_lba CLI -> export contract."""

import json
import os

import numpy as np
import pytest

from neuralrgbd_tpu.data.synthetic import write_scannet_scene


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    """Synthetic capture: reuse the ScanNet scene writer for images, plus a
    single-folder intrinsics file and a DSO-format result.txt derived from
    the scene's true poses (scaled, as monocular VO would produce)."""
    root = tmp_path_factory.mktemp("capture")
    scene = write_scannet_scene(str(root), n_frames=12)

    intrin = {
        "IntM": [[585.0, 0, 323.7], [0, 585.0, 237.9], [0, 0, 1]],
        "img_size": [640, 480],
    }
    intrin_path = str(root / "cam_info.json")
    with open(intrin_path, "w") as f:
        json.dump(intrin, f)

    # DSO cam-to-world: true poses with an arbitrary monocular scale
    dso_scale = 7.0
    lines = []
    for i in range(12):
        tx = 0.02 * i * dso_scale
        # tiny off-identity so frame 0 isn't flagged 'DSO did not return'
        lines.append(f"{i} {tx} {1e-6} {1e-6} 1e-6 0 0 1")
    result_path = str(root / "result.txt")
    with open(result_path, "w") as f:
        f.write("\n".join(lines) + "\n")

    return {
        "img_glob": os.path.join(scene, "*.color.jpg"),
        "intrin_path": intrin_path,
        "dso_res_path": result_path,
        "root": str(root),
    }


@pytest.mark.parametrize("coarse", [1, 2])
def test_lba_cli_end_to_end(capture, tmp_path, coarse):
    from neuralrgbd_tpu.cli.test_kvnet_lba import main

    res = str(tmp_path / "res")
    n = main([
        "--exp_name", "t",
        "--img_glob", capture["img_glob"],
        "--intrin_path", capture["intrin_path"],
        "--dso_res_path", capture["dso_res_path"],
        "--ndepth", "8", "--feature_dim", "16",
        "--d_min", "0.5", "--d_max", "4.0",
        "--img_width", "96", "--img_height", "64",
        "--LBA_max_iter", "4", "--LBA_step", "0.01",
        "--knet_coarse_d", str(coarse),
        "--res_dir", res,
    ])
    assert n >= 3
    out = os.path.join(res, "t")
    files = sorted(os.listdir(out))
    assert "scene_path_info.txt" in files
    assert sum(f.startswith("d_") for f in files) == n
    from neuralrgbd_tpu.infer.export import read_pgm

    d = read_pgm(os.path.join(out, "d_00000.pgm"))
    assert d.shape == (64, 96)
    assert 400 <= d.max() <= 4100


def test_twin_pose_indices():
    from neuralrgbd_tpu.cli.test_kvnet_lba import twin_pose_indices

    pose_idx, opt_idx = twin_pose_indices(10, 2, 1)
    # reference mutils/misc.py:37-44 with step=1:
    assert pose_idx == [8, 9, 11, 11]   # last entry: t*s + ref - 1 = 11
    assert opt_idx == [8, 9, 11, 12]
    pose_idx, opt_idx = twin_pose_indices(10, 2, 3)
    assert pose_idx == [4, 7, 13, 15]
    assert opt_idx == [4, 7, 13, 16]
