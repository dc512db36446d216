"""KITTI operating-point throughput on the chip (VERDICT r3 item 3).

The reference's second headline config (`/root/reference/code/mdataloader/
kitti.py:399-424`, `train_KVNet.py:229-237`, `docs/TE.md:55-58`): resize to
768x256, d in [1, 60] over 64 bins, t_win=2 — run BOTH ways:

- crop-384: center-crop width to 384 after the resize (the reference's
  training/test default) => model input 384x256, DPV 96x64 — the ScanNet
  shape at KITTI depth range;
- no-crop: full 768x256 => DPV 192x64 — the wide-W operating point that
  exercises the fused sweep's x-tiling and the tiled/oct resample
  (ops/pallas/{sweep_fused,resample_tiled}.py) in-context.

Methodology: bench.py's (scan rollout, chained carry, scalar fetch, median
of reps, slope-corrected by construction). Prints one JSON line per config.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_kitti_op.py
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


def bench_config(tag, img_hw, baseline):
    cfg = ModelConfig(d_min=1.0, d_max=60.0)   # KITTI depth range
    batch, _ = synthetic_batch(cfg, n_lanes=1, img_hw=img_hw, seed=0,
                               baseline=baseline)
    state = create_train_state(cfg, TrainConfig(), batch)
    keys = ("ref", "srcs", "poses", "K", "pose_next")
    frames = {k: jnp.asarray(np.stack([batch[k]] * T)) for k in keys}

    h, w = img_hw[0] // 4, img_hw[1] // 4
    spread = int(jax.jit(
        lambda Rs, ts, K, dc: band_spread(
            Rs, ts, Camera(K=K), dc, h, w))(
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
    bvp = jnp.full((1, D, h, w), -np.log(D), jnp.float32)
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
        "config": tag, "img_hw": list(img_hw), "dpv_hw": [h, w],
        "d_range": [cfg.d_min, cfg.d_max],
        "band": sweep_band if fast_sweep else "xla",
        "coarse_knet": COARSE, "cache_features": CACHE,
        "fps": round(fps, 3),
        "ms_per_frame": round(1000.0 / fps, 2),
        "reps_fps": [round(T / t, 2) for t in times],
    }), flush=True)
    return fps


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    # crop-384 (the reference KITTI default): kitti.py:399-424 crops the
    # 768-wide resize to 384 around the principal point
    bench_config("kitti_crop384", (256, 384), baseline=0.25)
    # no-crop wide: DPV 192x64, wide-W kernels in-context
    bench_config("kitti_nocrop768", (256, 768), baseline=0.25)
