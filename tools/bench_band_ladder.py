"""Worst-case sweep datum: full-pipeline FPS vs pose-forced sweep band
(VERDICT r3 item 8).

The headline bench's synthetic near-identity poses plan band=4 — the
gentlest regime. This measures the same rollout on trajectories whose
inter-frame ROLL forces band=8, band=16, and the XLA fallback
(plan_sweep's ladder, `est_swp_volume_v4` semantics under arbitrary
rotation, homography.py:293-331), bounding the headline's pose
sensitivity. Poses are built with controlled roll; the band is PLANNED
from the actual poses (band_spread), not forced, so each row is a real
operating regime.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_band_ladder.py
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.data import synthetic_batch
from neuralrgbd_tpu.infer.rollout import make_rollout
from neuralrgbd_tpu.ops.camera import Camera
from neuralrgbd_tpu.ops.pallas.sweep_fused import band_spread
from neuralrgbd_tpu.train import create_train_state

T = int(os.environ.get("BENCH_FRAMES", "32"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
COARSE = int(os.environ.get("BENCH_COARSE_KNET", "1"))
CACHE = bool(int(os.environ.get("BENCH_CACHE_FE", "1")))


def roll_pose(deg, baseline, rng):
    a = np.radians(deg)
    R = np.array([[np.cos(a), -np.sin(a), 0],
                  [np.sin(a), np.cos(a), 0],
                  [0, 0, 1]], np.float32)
    p = np.eye(4, dtype=np.float32)
    p[:3, :3] = R
    p[:3, 3] = rng.randn(3).astype(np.float32) * baseline
    return p


def bench_roll(roll_deg):
    cfg = ModelConfig()
    batch, _ = synthetic_batch(cfg, n_lanes=1, img_hw=(256, 384), seed=0)
    rng = np.random.RandomState(1)
    V = cfg.n_views
    batch["poses"] = np.stack(
        [np.stack([roll_pose(roll_deg * (v - V / 2 + 0.5), 0.04, rng)
                   for v in range(V)])])
    state = create_train_state(cfg, TrainConfig(), batch)
    keys = ("ref", "srcs", "poses", "K", "pose_next")
    frames = {k: jnp.asarray(np.stack([batch[k]] * T)) for k in keys}

    spread = int(jax.jit(
        lambda Rs, ts, K, dc: band_spread(
            Rs, ts, Camera(K=K), dc, 64, 96))(
        jnp.asarray(batch["poses"][0][:, :3, :3]),
        jnp.asarray(batch["poses"][0][:, :3, 3]),
        jnp.asarray(batch["K"][0]), jnp.asarray(cfg.d_candi)))
    band = next((b for b in (4, 8, 16) if spread <= b - 1), None)
    fast_sweep, sweep_band = (True, band) if band else (False, 8)

    rollout = make_rollout(cfg, jit=False, fast_sweep=fast_sweep,
                           sweep_band=sweep_band, cache_features=CACHE,
                           coarse_knet=COARSE)

    @jax.jit
    def run(params, frames, bvp, valid):
        depths, confs, bv = rollout(params, frames, bvp, valid)
        return jnp.sum(depths[:, :, ::64, ::64]) + jnp.sum(bv[:, :, ::16, ::16])

    D = cfg.ndepth
    bvp = jnp.full((1, D, 64, 96), -np.log(D), jnp.float32)
    valid = jnp.ones((1,), bool)
    float(run(state.params, frames, bvp, valid))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = float(run(state.params, frames, bvp, valid))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(s)
    fps = T / float(np.median(times))
    print(json.dumps({
        "roll_deg_per_view": roll_deg, "spread_px": spread,
        "planned_band": sweep_band if fast_sweep else "xla_fallback",
        "coarse_knet": COARSE, "cache_features": CACHE,
        "fps": round(fps, 3), "ms_per_frame": round(1000.0 / fps, 2),
    }), flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    # ladder: near-zero roll (band 4), moderate (8), strong (16), extreme
    # (XLA fallback) — thresholds from band_spread on the 96x64 DPV grid.
    # Measured spread is ~9.4 px/deg of per-view roll at this op point, so
    # the defaults land one row in each regime; override with BENCH_ROLLS.
    rolls = tuple(float(r) for r in
                  os.environ.get("BENCH_ROLLS", "0.0,0.5,1.2,2.5").split(","))
    for roll in rolls:
        bench_roll(roll)
