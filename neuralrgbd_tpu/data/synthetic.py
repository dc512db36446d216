"""Synthetic batches and on-disk scenes for tests, benchmarks, and demos.

``synthetic_batch`` generates random-texture windows with small known camera
motion at the reference operating point (step-layer batch contract).
``write_scannet_scene`` materializes a synthetic trajectory in the exact
ScanNet-decoded on-disk layout (frame-%06d.{color.jpg,depth.pgm,pose.txt} +
_info.txt) so the full CLI path — loader, intrinsics parser, window loop,
export contract — can run end-to-end without the real dataset. This is the
``run_demo.sh``-equivalent integration fixture.
"""

from __future__ import annotations

import os

import numpy as np

from neuralrgbd_tpu.config import ModelConfig


def synthetic_batch(cfg: ModelConfig, n_lanes: int = 1,
                    img_hw=(256, 384), seed: int = 0,
                    baseline: float = 0.04):
    """Returns (batch dict of np arrays, K_dpv) at the given operating point."""
    rng = np.random.RandomState(seed)
    H, W = img_hw
    h, w = H // 4, W // 4
    V = cfg.n_views
    D = cfg.ndepth

    K = np.array(
        [[w / 2 / np.tan(np.radians(30)), 0, w / 2],
         [0, h / 2 / np.tan(np.radians(24)), h / 2],
         [0, 0, 1]],
        np.float32,
    )

    def rand_pose(scale):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = rng.randn(3).astype(np.float32) * scale
        return pose

    batch = {
        "ref": rng.randn(n_lanes, H, W, 3).astype(np.float32),
        "srcs": rng.randn(n_lanes, V, H, W, 3).astype(np.float32),
        "poses": np.stack(
            [np.stack([rand_pose(baseline) for _ in range(V)])
             for _ in range(n_lanes)]
        ),
        "K": np.tile(K, (n_lanes, 1, 1)),
        "pose_next": np.stack([rand_pose(baseline) for _ in range(n_lanes)]),
        "dmap_digit": rng.randint(0, D, size=(n_lanes, h, w)).astype(np.int32),
        "dmap_imgsize_digit": rng.randint(0, D, size=(n_lanes, H, W)).astype(np.int32),
        "dmap_imgsize": rng.uniform(cfg.d_min, cfg.d_max,
                                    size=(n_lanes, H, W)).astype(np.float32),
        "lane_valid": np.ones((n_lanes,), bool),
    }
    return batch, K


def write_scannet_scene(root: str, n_frames: int = 10,
                        orig_wh=(640, 480), seed: int = 0,
                        invalid_pose_at=None) -> str:
    """Write a synthetic scene in the SensReader-decoded layout.

    A textured fronto-parallel scene at smoothly varying depth, viewed by a
    slowly translating camera. Returns the scene directory.
    """
    import PIL.Image

    rng = np.random.RandomState(seed)
    W, H = orig_wh
    scene = os.path.join(root, "scene0000_00")
    os.makedirs(scene, exist_ok=True)

    fx = fy = 585.0
    cx, cy = W / 2.0 + 3.7, H / 2.0 - 2.1  # off-center: exercises the fov roundtrip
    K4 = np.eye(4)
    K4[0, 0], K4[1, 1], K4[0, 2], K4[1, 2] = fx, fy, cx, cy
    with open(os.path.join(scene, "_info.txt"), "w") as f:
        f.write("m_versionNumber = 4\n")
        f.write("m_sensorName = synthetic\n")
        f.write(f"m_colorWidth = {W}\n")
        f.write(f"m_colorHeight = {H}\n")
        f.write(f"m_depthWidth = {W}\n")
        f.write(f"m_depthHeight = {H}\n")
        f.write("m_depthShift = 1000\n")
        f.write("m_calibrationColorIntrinsic = "
                + " ".join(f"{v:.6f}" for v in K4.reshape(-1)) + "\n")

    # smooth texture + smooth depth field
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    tex = (np.sin(xs / 11.0) + np.cos(ys / 7.0)
           + rng.rand(H, W).astype(np.float32) * 0.3)
    depth = 2.0 + 1.2 * np.sin(xs / 97.0) * np.cos(ys / 71.0)  # 0.8..3.2 m

    for i in range(n_frames):
        stem = os.path.join(scene, f"frame-{i * 5:06d}")
        rgb = np.stack([
            127 + 100 * np.sin(tex * (c + 1) + i * 0.05) for c in range(3)
        ], axis=-1).clip(0, 255).astype(np.uint8)
        PIL.Image.fromarray(rgb).save(stem + ".color.jpg", quality=92)

        dmm = (depth * 1000).astype(np.uint16)
        with open(stem + ".depth.pgm", "wb") as f:
            f.write(f"P5\n{W} {H}\n65535\n".encode())
            f.write(dmm.astype(">u2").tobytes())

        # cam-to-world pose, slow x-translation
        c2w = np.eye(4)
        c2w[0, 3] = 0.02 * i
        if invalid_pose_at is not None and i == invalid_pose_at:
            c2w = np.full((4, 4), -np.inf)  # decoder writes -inf on track loss
        np.savetxt(stem + ".pose.txt", c2w, fmt="%.7f")

    return scene
