"""Benchmark: steady-state KV-Net inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": ...}

Operating point = the reference's headline config (BASELINE.md): 384x256 RGB,
64 depth planes at 96x64, t_win=2 (4 source views), full K-Net temporal
fusion + R-Net refinement + the prediction resample — i.e. everything
test_utils/test_KVNet.py:19-67 does per frame.

Methodology: T frames are scanned on-device in ONE executable with the DPV
carry chained between frames (infer/rollout.py), and the result is reduced
to a scalar that is fetched to the host. On this environment's tunneled TPU,
``block_until_ready`` returns at dispatch and per-call host fetches are
relay-bandwidth-bound (~37 MB/s), so anything else mis-measures.

The reference publishes no FPS number (BASELINE.md); vs_baseline is reported
against the NEURALRGBD_REF_FPS env var if the driver provides one, else null.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from neuralrgbd_tpu.config import ModelConfig, TrainConfig
    from neuralrgbd_tpu.data import synthetic_batch
    from neuralrgbd_tpu.infer.rollout import make_rollout
    from neuralrgbd_tpu.train import create_train_state

    # default: bf16 inference compute (ModelConfig.infer_dtype, validated on
    # trained weights — tools/eval_bf16.py); BENCH_DTYPE=float32 reverts
    bd = os.environ.get("BENCH_DTYPE")
    cfg = ModelConfig(dtype=bd, infer_dtype=bd) if bd else ModelConfig()
    T = int(os.environ.get("BENCH_FRAMES", "32"))
    REPS = int(os.environ.get("BENCH_REPS", "3"))
    batch, _ = synthetic_batch(cfg, n_lanes=1, img_hw=(256, 384), seed=0)
    state = create_train_state(cfg, TrainConfig(), batch)

    keys = ("ref", "srcs", "poses", "K", "pose_next")
    frames = {k: jnp.asarray(np.stack([batch[k]] * T)) for k in keys}

    # per-trajectory sweep planning, same ladder the production loop uses
    # (infer/loop.plan_sweep): smallest exact band for these poses
    if jax.default_backend() == "tpu":
        from neuralrgbd_tpu.ops.camera import Camera
        from neuralrgbd_tpu.ops.pallas.sweep_fused import band_spread

        spread = int(jax.jit(
            lambda Rs, ts, K, dc: band_spread(
                Rs, ts, Camera(K=K), dc, 64, 96))(
            jnp.asarray(batch["poses"][0][:, :3, :3]),
            jnp.asarray(batch["poses"][0][:, :3, 3]),
            jnp.asarray(batch["K"][0]), jnp.asarray(cfg.d_candi)))
        band = next((b for b in (4, 8, 16) if spread <= b - 1), None)
        fast_sweep, sweep_band = (True, band) if band else (False, 8)
    else:
        fast_sweep, sweep_band = None, 8

    # Cached-feature rollout is the TPU default (per-frame BN deviation,
    # accuracy-gated on trained weights: holdout abs_rel 0.12434 cached vs
    # 0.12437 exact — PERF.md "Cached-feature rollout"). BENCH_CACHE_FE=0
    # measures the parity-exact joint-window path instead.
    cache_fe = bool(int(os.environ.get(
        "BENCH_CACHE_FE", "1" if jax.default_backend() == "tpu" else "0")))
    # Coarse-D K-Net (accuracy-gated deviation, PERF.md "Coarse-D K-Net"):
    # the TPU default runs the K-Net at D/2 with the gain trilinearly
    # D-upsampled (the reference's own basic.py:128-139 mechanism). Round-5
    # gate on deployment-TRAINED weights (tools/eval_coarse_knet.py, 9
    # never-trained holdout scenes): abs_rel exact 0.18883 vs deployment
    # (coarse + cached FE) 0.18878, delta1 0.72507 vs 0.72513, mean
    # |ddepth| 0.8 mm — training with the deviations active erased the
    # gap (round-4 weights: 4.8 mm). BENCH_COARSE_KNET=1 restores exact
    # reference K-Net semantics.
    coarse = int(os.environ.get(
        "BENCH_COARSE_KNET", "2" if jax.default_backend() == "tpu" else "1"))
    rollout = make_rollout(cfg, jit=False, fast_sweep=fast_sweep,
                           sweep_band=sweep_band, cache_features=cache_fe,
                           coarse_knet=coarse)

    @jax.jit
    def run(params, frames, bvp, valid):
        depths, confs, bv = rollout(params, frames, bvp, valid)
        # scalar fetch only: forces execution without relay-bound transfers
        return jnp.sum(depths[:, :, ::64, ::64]) + jnp.sum(bv[:, :, ::16, ::16])

    D, h, w = cfg.ndepth, 64, 96
    bvp = jnp.full((1, D, h, w), -np.log(D), jnp.float32)
    valid = jnp.ones((1,), bool)

    float(run(state.params, frames, bvp, valid))  # compile + warm
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = float(run(state.params, frames, bvp, valid))
        times.append(time.perf_counter() - t0)
        assert np.isfinite(s)
    fps = T / float(np.median(times))

    # vs_baseline: the reference publishes no FPS number. The measured datum
    # is the actual reference implementation at 0.0640 FPS on this machine's
    # torch CPU (tools/measure_ref_fps.py); BASELINE.md extrapolates that to
    # an estimated 5 FPS on the reference's 2019-era GPU (documented there,
    # deliberately generous to the reference). That estimate is the
    # denominator here, overridable via NEURALRGBD_REF_FPS.
    ref_fps = float(os.environ.get("NEURALRGBD_REF_FPS", "0") or 0)
    if not ref_fps:
        ref_fps = 5.0  # estimated reference GPU FPS (BASELINE.md, round 2)
    vs = round(fps / ref_fps, 3)
    print(json.dumps({
        "metric": "kvnet_infer_fps_384x256_d64_twin2",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
