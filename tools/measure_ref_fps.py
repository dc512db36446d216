"""Measure the reference implementation's per-frame inference cost (torch CPU)
and this repo's same-machine CPU cost at the identical operating point.

Establishes the missing baseline datum (BASELINE.md "plan to establish the
measured baseline"): the reference repo publishes no FPS number and its GPU
era is unavailable here, so the honest chain is

    ref torch CPU FPS  (measured, this machine)
    ours jax  CPU FPS  (measured, this machine, same inputs/op-point)
    ours TPU  FPS      (bench.py, chained methodology)

plus a documented FLOPs-based extrapolation of the reference's 2019-GPU FPS
(see BASELINE.md). Usage:

    PYTHONPATH=/root/repo python tools/measure_ref_fps.py [--frames 3] [--ndepth 64]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure_reference(ndepth: int, n_frames: int, img_hw=(256, 384)) -> dict:
    from tools.ref_oracle import ReferenceOracle

    oracle = ReferenceOracle(feature_dim=64, ndepth=ndepth, t_win_r=2,
                             img_hw=img_hw, seed=0)
    rng = np.random.RandomState(0)
    H, W = img_hw
    V = 4
    ref = rng.randn(H, W, 3).astype(np.float32)
    srcs = rng.randn(V, H, W, 3).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    for v in range(V):
        poses[v, :3, 3] = rng.randn(3).astype(np.float32) * 0.05
    h, w = H // 4, W // 4
    logits = rng.randn(ndepth, h, w).astype(np.float32)
    bv_predict = logits - np.log(
        np.sum(np.exp(logits), axis=0, keepdims=True))

    # warmup (allocator, thread pools)
    oracle.forward(ref, srcs, poses, bv_predict)

    times = []
    for _ in range(n_frames):
        t0 = time.perf_counter()
        out = oracle.forward(ref, srcs, poses, bv_predict)
        oracle.predict_next(out["dpv"], np.linalg.inv(poses[2]))
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times))
    return {"sec_per_frame": sec, "fps": 1.0 / sec, "times": times}


def measure_ours_cpu(ndepth: int, n_frames: int, img_hw=(256, 384)) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from neuralrgbd_tpu.config import ModelConfig
    from neuralrgbd_tpu.infer.step import make_infer_step
    from tools.ref_oracle import ReferenceOracle

    cfg = ModelConfig(feature_dim=64, kv_feature_dim=64, ndepth=ndepth,
                      t_win_r=2)
    oracle_K = ReferenceOracle(feature_dim=64, ndepth=ndepth, t_win_r=2,
                               img_hw=img_hw, seed=0).K_dpv
    rng = np.random.RandomState(0)
    H, W = img_hw
    V, h, w = 4, H // 4, W // 4
    batch = {
        "ref": jnp.asarray(rng.randn(1, H, W, 3), jnp.float32),
        "srcs": jnp.asarray(rng.randn(1, V, H, W, 3), jnp.float32),
        "poses": jnp.asarray(np.tile(np.eye(4, dtype=np.float32),
                                     (1, V, 1, 1))),
        "K": jnp.asarray(oracle_K[None]),
        "pose_next": jnp.asarray(np.eye(4, dtype=np.float32)[None]),
    }
    from neuralrgbd_tpu.models.kvnet import KVNet  # params via init
    import jax.random as jrandom

    step = make_infer_step(cfg)
    model = KVNet(cfg=cfg, single_refine=True)
    from neuralrgbd_tpu.ops.camera import Camera

    params = model.init(
        jrandom.PRNGKey(0), batch["ref"][0], batch["srcs"][0],
        batch["poses"][0], Camera(K=batch["K"][0]),
        jnp.asarray(cfg.d_candi),
        jnp.full((ndepth, h, w), np.log(1.0 / ndepth), jnp.float32),
        jnp.asarray(True),
    )
    bv = jnp.full((1, ndepth, h, w), np.log(1.0 / ndepth), jnp.float32)
    valid = jnp.ones((1,), bool)
    out = step(params, batch, bv, valid)  # compile + warmup
    jax.block_until_ready(out)
    times = []
    for _ in range(n_frames):
        bv_in = out.bv_predict
        t0 = time.perf_counter()
        out = step(params, batch, bv_in, valid)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times))
    return {"sec_per_frame": sec, "fps": 1.0 / sec, "times": times}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--ndepth", type=int, default=64)
    ap.add_argument("--skip-ours", action="store_true")
    args = ap.parse_args()

    ref = measure_reference(args.ndepth, args.frames)
    print(json.dumps({"which": "reference_torch_cpu", **ref}))
    if not args.skip_ours:
        ours = measure_ours_cpu(args.ndepth, args.frames)
        print(json.dumps({"which": "ours_jax_cpu", **ours}))
        print(json.dumps({
            "which": "summary",
            "ref_cpu_fps": ref["fps"],
            "ours_cpu_fps": ours["fps"],
            "same_machine_speedup": ours["fps"] / ref["fps"],
        }))


if __name__ == "__main__":
    main()
