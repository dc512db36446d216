"""Round-trip test: write a synthetic .sens, decode with the C++ binary,
and load the result through the ScanNet data layer."""

import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native",
                          "sensreader")


@pytest.fixture(scope="module")
def sens_binary():
    binp = os.path.join(NATIVE_DIR, "sens_decode")
    r = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True,
                       text=True)
    if r.returncode != 0 or not os.path.exists(binp):
        pytest.skip(f"cannot build sens_decode: {r.stderr[-300:]}")
    return binp


def test_sens_roundtrip(sens_binary, tmp_path):
    from neuralrgbd_tpu.data.sens_writer import jpeg_bytes, write_sens

    rng = np.random.RandomState(0)
    W, H = 64, 48
    n = 11
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 60.0
    K[0, 2], K[1, 2] = 32.2, 23.8

    colors, depths, poses = [], [], []
    for i in range(n):
        rgb = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        colors.append(jpeg_bytes(rgb))
        depths.append((1000 + 50 * i + np.zeros((H, W))).astype(np.uint16))
        p = np.eye(4, dtype=np.float32)
        p[0, 3] = 0.1 * i
        poses.append(p)

    sens_path = str(tmp_path / "scene.sens")
    write_sens(sens_path, colors, depths, poses, K,
               color_wh=(W, H), depth_wh=(W, H))

    out = str(tmp_path / "decoded" / "scene0000_00")
    r = subprocess.run([sens_binary, sens_path, out], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr

    # every 5th frame: 0, 5, 10
    files = sorted(os.listdir(out))
    assert "_info.txt" in files
    for i in (0, 5, 10):
        assert f"frame-{i:06d}.color.jpg" in files
        assert f"frame-{i:06d}.depth.pgm" in files
        assert f"frame-{i:06d}.pose.txt" in files
    assert "frame-000001.color.jpg" not in files

    # load through the real data layer (intrinsics parser + pgm + pose)
    from neuralrgbd_tpu.data.scannet import make_trajectory, read_info_txt

    K_parsed, (w, h) = read_info_txt(os.path.join(out, "_info.txt"))
    np.testing.assert_allclose(K_parsed[0, 0], 60.0)
    assert (w, h) == (W, H)

    d_candi = np.linspace(0.5, 4.0, 8).astype(np.float32)
    traj = make_trajectory(0, 5, str(tmp_path / "decoded"),
                           img_size_wh=(W, H), d_candi=d_candi)
    assert len(traj) == 3
    rec = traj.frame(1)  # original frame 5
    np.testing.assert_allclose(rec.dmap.mean(), 1.25, atol=1e-3)  # 1250 mm
    np.testing.assert_allclose(rec.ext_M[0, 3], -0.5, atol=1e-5)  # inv pose
    assert rec.img.shape == (H, W, 3)


def test_sens_decoder_rejects_garbage(sens_binary, tmp_path):
    bad = str(tmp_path / "bad.sens")
    with open(bad, "wb") as f:
        f.write(b"\x07\x00\x00\x00garbage")
    r = subprocess.run([sens_binary, bad, str(tmp_path / "o")],
                       capture_output=True, text=True)
    assert r.returncode == 1
    assert "unsupported .sens version" in r.stderr
