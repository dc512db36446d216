"""The consistent plane-scene renderer must be actually multi-view
consistent: warping frame j into frame i via the stored GT depth + poses
must reproduce frame i to within JPEG/bilinear noise. This is the property
that makes the synthetic training campaign meaningful (photoconsistency is
the signal the plane-sweep volume feeds the network)."""

import os

import numpy as np
import PIL.Image
import pytest

from neuralrgbd_tpu.config import ModelConfig
from neuralrgbd_tpu.data.synthetic import synthetic_dataset, write_plane_scene


def _load(scene, i):
    img = np.asarray(
        PIL.Image.open(f"{scene}/frame-{i * 5:06d}.color.jpg"), np.float64)
    with open(f"{scene}/frame-{i * 5:06d}.depth.pgm", "rb") as f:
        f.readline()
        W, H = map(int, f.readline().split())
        f.readline()
        d = np.frombuffer(f.read(), ">u2").reshape(H, W) / 1000.0
    pose = np.loadtxt(f"{scene}/frame-{i * 5:06d}.pose.txt")
    return img, d, pose


@pytest.mark.parametrize("seed", [0, 3])
def test_plane_scene_photoconsistent(tmp_path, seed):
    scene = write_plane_scene(str(tmp_path), 0, n_frames=5, seed=seed)
    img0, d0, p0 = _load(scene, 0)
    img4, d4, p4 = _load(scene, 4)
    H, W = d0.shape
    fx = fy = 585.0
    cx, cy = W / 2 + 3.7, H / 2 - 2.1
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    rays = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], -1)
    Xw = (rays * d0[..., None]) @ p0[:3, :3].T + p0[:3, 3]
    Xc = (Xw - p4[:3, 3]) @ p4[:3, :3]
    u = Xc[..., 0] / Xc[..., 2] * fx + cx
    v = Xc[..., 1] / Xc[..., 2] * fy + cy
    iu, iv = np.floor(u).astype(int), np.floor(v).astype(int)
    inb = (iu >= 0) & (iu < W - 1) & (iv >= 0) & (iv < H - 1)
    assert inb.mean() > 0.85, "camera path leaves the plane's field of view"
    fu, fv = u - iu, v - iv
    iu, iv = iu.clip(0, W - 2), iv.clip(0, H - 2)
    samp = (img4[iv, iu] * ((1 - fu) * (1 - fv))[..., None]
            + img4[iv, iu + 1] * (fu * (1 - fv))[..., None]
            + img4[iv + 1, iu] * ((1 - fu) * fv)[..., None]
            + img4[iv + 1, iu + 1] * (fu * fv)[..., None])
    err = np.abs(samp - img0)[inb]
    assert err.mean() < 3.0, f"photometric error {err.mean():.2f}/255"

    # GT depth must also be cross-view consistent (z of the SAME surface)
    zc = Xc[..., 2]
    # resample frame-4 depth at the projected locations (nearest)
    d4s = d4[iv.clip(0, H - 1), iu.clip(0, W - 1)]
    rel = (np.abs(d4s - zc) / zc)[inb]
    assert np.percentile(rel, 95) < 0.01


@pytest.mark.parametrize("seed", [1, 5])
def test_multiplane_scene_photoconsistent_and_occluding(tmp_path, seed):
    from neuralrgbd_tpu.data.synthetic import write_multiplane_scene

    scene = write_multiplane_scene(str(tmp_path), 0, n_frames=5, seed=seed)
    img0, d0, p0 = _load(scene, 0)
    img4, d4, p4 = _load(scene, 4)
    H, W = d0.shape
    # occlusion structure exists: multiple depth modes + discontinuities
    valid = d0 > 0
    assert valid.mean() > 0.95
    grad = np.abs(np.diff(d0, axis=1))
    assert (grad > 0.3).mean() > 1e-4, "no depth discontinuities rendered"

    fx = fy = 585.0
    cx, cy = W / 2 + 3.7, H / 2 - 2.1
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    rays = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], -1)
    Xw = (rays * d0[..., None]) @ p0[:3, :3].T + p0[:3, 3]
    Xc = (Xw - p4[:3, 3]) @ p4[:3, :3]
    u = Xc[..., 0] / Xc[..., 2] * fx + cx
    v = Xc[..., 1] / Xc[..., 2] * fy + cy
    iu, iv = np.floor(u).astype(int), np.floor(v).astype(int)
    inb = (iu >= 0) & (iu < W - 1) & (iv >= 0) & (iv < H - 1) & valid
    fu, fv = u - iu, v - iv
    iu, iv = iu.clip(0, W - 2), iv.clip(0, H - 2)
    # occlusion-aware check: only where the frame-4 surface is the SAME
    # surface (depths agree), the warped color must match
    zc = Xc[..., 2]
    d4s = d4[iv.clip(0, H - 1), iu.clip(0, W - 1)]
    same = inb & (np.abs(d4s - zc) / np.maximum(zc, 1e-6) < 0.01)
    assert same.mean() > 0.6, "most pixels should stay co-visible"
    samp = (img4[iv, iu] * ((1 - fu) * (1 - fv))[..., None]
            + img4[iv, iu + 1] * (fu * (1 - fv))[..., None]
            + img4[iv + 1, iu] * ((1 - fu) * fv)[..., None]
            + img4[iv + 1, iu + 1] * (fu * fv)[..., None])
    err = np.abs(samp - img0)[same]
    assert err.mean() < 4.0, f"photometric error {err.mean():.2f}/255"


def test_mixed_dataset_kinds(tmp_path):
    cfg = ModelConfig()
    make_traj, n = synthetic_dataset(cfg, n_scenes=2, n_frames=4,
                                     root=str(tmp_path), kind="mixed")
    d_plane = make_traj(0).frame(0).dmap_imgsize
    d_multi = make_traj(1).frame(0).dmap_imgsize
    # the multiplane scene has discontinuities; the single plane does not
    assert (np.abs(np.diff(d_multi, axis=1)) > 0.3).any()
    assert not (np.abs(np.diff(d_plane, axis=1)) > 0.3).any()


def test_plane_scenes_distinct_and_in_range(tmp_path):
    cfg = ModelConfig()
    make_traj, n = synthetic_dataset(cfg, n_scenes=2, n_frames=4,
                                     root=str(tmp_path))
    assert n == 2
    t0, t1 = make_traj(0), make_traj(1)
    r0, r1 = t0.frame(0), t1.frame(0)
    assert not np.allclose(r0.img_raw, r1.img_raw), "scenes must differ"
    for rec in (r0, r1):
        d = rec.dmap_imgsize
        assert d.min() > cfg.d_min and d.max() < cfg.d_max, \
            f"GT depth {d.min():.2f}..{d.max():.2f} outside d_candi range"
        assert rec.pose_valid


def test_plane_dataset_window_batch(tmp_path):
    cfg = ModelConfig()
    make_traj, _ = synthetic_dataset(cfg, n_scenes=1, n_frames=6,
                                     root=str(tmp_path))
    from neuralrgbd_tpu.data.trajectory import window_batch

    b, rec, ok = window_batch(make_traj(0), 2, 2, with_labels=True)
    assert ok
    assert np.isfinite(b["ref"]).all()
    assert b["dmap_digit"].max() < cfg.ndepth
    assert b["dmap_digit"].min() >= 0


@pytest.mark.parametrize("seed", [2, 7])
def test_curved_scene_photoconsistent_and_curved(tmp_path, seed):
    from neuralrgbd_tpu.data.synthetic import write_curved_scene

    scene = write_curved_scene(str(tmp_path), 0, n_frames=5, seed=seed)
    img0, d0, p0 = _load(scene, 0)
    img4, d4, p4 = _load(scene, 4)
    H, W = d0.shape
    valid = d0 > 0
    assert valid.mean() > 0.95
    # curved structure: second derivative of depth along x must be non-zero
    # over a meaningful area (planes have ~0 curvature in z-over-ray space)
    d2 = np.abs(np.diff(d0, n=2, axis=1))
    assert (d2 > 5e-4).mean() > 0.01, "no curved surface rendered"

    fx = fy = 585.0
    cx, cy = W / 2 + 3.7, H / 2 - 2.1
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    rays = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], -1)
    Xw = (rays * d0[..., None]) @ p0[:3, :3].T + p0[:3, 3]
    Xc = (Xw - p4[:3, 3]) @ p4[:3, :3]
    u = Xc[..., 0] / Xc[..., 2] * fx + cx
    v = Xc[..., 1] / Xc[..., 2] * fy + cy
    iu, iv = np.floor(u).astype(int), np.floor(v).astype(int)
    inb = (iu >= 0) & (iu < W - 1) & (iv >= 0) & (iv < H - 1) & valid
    fu, fv = u - iu, v - iv
    iu, iv = iu.clip(0, W - 2), iv.clip(0, H - 2)
    zc = Xc[..., 2]
    d4s = d4[iv.clip(0, H - 1), iu.clip(0, W - 1)]
    same = inb & (np.abs(d4s - zc) / np.maximum(zc, 1e-6) < 0.01)
    assert same.mean() > 0.6, "most pixels should stay co-visible"
    samp = (img4[iv, iu] * ((1 - fu) * (1 - fv))[..., None]
            + img4[iv, iu + 1] * (fu * (1 - fv))[..., None]
            + img4[iv + 1, iu] * ((1 - fu) * fv)[..., None]
            + img4[iv + 1, iu + 1] * (fu * fv)[..., None])
    err = np.abs(samp - img0)[same]
    assert err.mean() < 4.0, f"photometric error {err.mean():.2f}/255"


def test_mixed3_dataset_cycles_kinds(tmp_path):
    cfg = ModelConfig()
    make_traj, n = synthetic_dataset(cfg, n_scenes=3, n_frames=4,
                                     root=str(tmp_path), kind="mixed3")
    d_plane = make_traj(0).frame(0).dmap_imgsize
    d_multi = make_traj(1).frame(0).dmap_imgsize
    d_curved = make_traj(2).frame(0).dmap_imgsize
    assert not (np.abs(np.diff(d_plane, axis=1)) > 0.3).any()
    assert (np.abs(np.diff(d_multi, axis=1)) > 0.3).any()
    assert (np.abs(np.diff(d_curved, n=2, axis=1)) > 5e-4).mean() > 0.01
    for d in (d_plane, d_multi, d_curved):
        assert d.min() > cfg.d_min and d.max() < cfg.d_max
