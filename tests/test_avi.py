"""MJPEG-AVI writer round-trip + container structure (infer/avi.py).

Parity target: ``mio/vidIO.py:169-206`` writeVideo / :126-166
re_write_video_from_img_res_1 (the reference's imageio/ffmpeg path; here
the RIFF container is written by hand since no encoder is bundled).
"""

import struct

import numpy as np
import pytest

from neuralrgbd_tpu.infer.avi import (read_avi_mjpeg, results_to_avi,
                                      write_avi, write_video)


def _frames(n=6, h=48, w=64):
    fs = []
    for i in range(n):
        y, x = np.mgrid[0:h, 0:w]
        f = ((y * 3 + x * 2 + i * 17) % 256).astype(np.uint8)
        fs.append(np.repeat(f[..., None], 3, axis=-1))
    return fs


def test_roundtrip(tmp_path):
    path = str(tmp_path / "t.avi")
    frames = _frames()
    assert write_avi(frames, path, fps=15) == 6
    out, fps = read_avi_mjpeg(path)
    assert fps == 15 and len(out) == 6
    for a, b in zip(out, frames):
        assert a.shape == b.shape
        assert np.abs(a.astype(float) - b.astype(float)).mean() < 3.0  # JPEG

    # container invariants: RIFF size field spans the file; idx1 present
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert len(data) == 8 + struct.unpack("<I", data[4:8])[0]
    assert b"idx1" in data and b"MJPG" in data and b"vids" in data


def test_write_video_norm_modes(tmp_path):
    floats = [np.full((16, 16), 2.0), np.full((16, 16), 4.0)]
    p0 = str(tmp_path / "m0.avi")
    write_video(floats, p0, norm_m=0, max_v=4.0)
    out, _ = read_avi_mjpeg(p0)
    # norm_m=0: global max scaling => frame0 mid-gray, frame1 white
    assert abs(int(np.asarray(out[0]).mean()) - 127) < 8
    assert int(np.asarray(out[1]).mean()) > 245
    p1 = str(tmp_path / "m1.avi")
    write_video(floats, p1, norm_m=1)
    out, _ = read_avi_mjpeg(p1)
    # norm_m=1: per-frame max => both ~white
    assert all(int(np.asarray(f).mean()) > 245 for f in out)


def test_results_to_avi(tmp_path):
    # exported pgm contract: 16-bit P5 files named d_*.pgm
    for i in range(3):
        d = ((np.mgrid[0:32, 0:40][0] * 50) + i * 100).astype(np.uint16)
        with open(tmp_path / f"d_{i:05d}.pgm", "wb") as f:
            f.write(b"P5\n40 32\n65535\n" + d.astype(">u2").tobytes())
    n = results_to_avi(str(tmp_path), str(tmp_path / "res.avi"))
    assert n == 3
    out, fps = read_avi_mjpeg(str(tmp_path / "res.avi"))
    assert len(out) == 3 and fps == 15


def test_rejects_mixed_sizes(tmp_path):
    with pytest.raises(ValueError):
        write_avi([np.zeros((8, 8, 3), np.uint8),
                   np.zeros((9, 8, 3), np.uint8)], str(tmp_path / "x.avi"))
