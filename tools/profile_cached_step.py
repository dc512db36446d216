"""Stage budget of the cached-feature infer step at the operating point.

Slope-times each stage with the exact in-model shapes/dtypes the bf16
cached bench path uses, then compares the sum against the measured full
step — the residual is glue (layout changes, softmaxes, regression).

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_cached_step.py
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")
from true_profile import slope_time  # noqa: E402

from neuralrgbd_tpu.config import ModelConfig, TrainConfig  # noqa: E402
from neuralrgbd_tpu.data import synthetic_batch  # noqa: E402
from neuralrgbd_tpu.infer.rollout import make_rollout  # noqa: E402
from neuralrgbd_tpu.infer.step import (make_frame_features,  # noqa: E402
                                       make_infer_step, predict_next)
from neuralrgbd_tpu.models.knet_paired import knet_paired_apply  # noqa: E402
from neuralrgbd_tpu.models.rnet import RNet  # noqa: E402
from neuralrgbd_tpu.ops.camera import Camera  # noqa: E402
from neuralrgbd_tpu.ops.pallas.sweep_fused import (  # noqa: E402
    sweep_cost_volume_fused)
from neuralrgbd_tpu.train import create_train_state  # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = ModelConfig()
    bf16 = jnp.bfloat16
    H, W, h, w = 256, 384, 64, 96
    D, V, F = cfg.ndepth, cfg.n_views, cfg.feature_dim
    rng = np.random.RandomState(0)

    batch, _ = synthetic_batch(cfg, n_lanes=1, img_hw=(H, W), seed=0)
    state = create_train_state(cfg, TrainConfig(), batch)
    params = state.params
    cam = Camera(K=jnp.asarray(batch["K"][0]))
    d_candi = jnp.asarray(cfg.d_candi)
    Rs = jnp.asarray(batch["poses"][0][:, :3, :3])
    ts = jnp.asarray(batch["poses"][0][:, :3, 3])
    pose_next = jnp.asarray(batch["pose_next"][0])

    # --- FE, one frame (the cached steady-state featurization) ---
    fe1 = make_frame_features(cfg)
    frame = jnp.asarray(batch["ref"][0])

    def fe_step(x):
        l1, f = fe1(params, x)
        return x + 1e-12 * (jnp.sum(l1) + jnp.sum(f)).astype(x.dtype)

    slope_time(fe_step, frame, "FE single frame (per-frame BN)")

    # --- fused sweep, band 4, kept RGB channels ---
    C = F + 3
    ref_sw = jnp.asarray(rng.randn(h, w, C).astype(np.float32))
    srcs_sw = jnp.asarray(rng.randn(V, h, w, C).astype(np.float32))

    for bm in (False, True):
        def sweep_step(x, m=bm):
            c, k = sweep_cost_volume_fused(
                x, srcs_sw, Rs, ts, cam, d_candi, cfg.sigma_soft_max,
                keep_last_channels=3, band=4, band_matmul=m)
            return x + 1e-12 * (jnp.sum(c) + jnp.sum(k)).astype(x.dtype)

        slope_time(sweep_step, ref_sw, f"fused sweep band=4 bm={int(bm)}")

    # --- paired K-Net on the fusion volume ---
    vol = jnp.asarray(rng.randn(D, h, w, 3 * V + 4).astype(np.float32))

    def knet_step(x):
        g = knet_paired_apply(params["params"]["kv_net"], x, dtype=bf16)
        return x + 1e-12 * jnp.sum(g).astype(x.dtype)

    slope_time(knet_step, vol, "paired K-Net")

    # --- R-Net refine (exp + transposes + apply) ---
    rnet = RNet(D=D, upsample_D=False, dtype=bf16, name="r_net")
    dpv = jax.nn.log_softmax(
        jnp.asarray(rng.randn(D, h, w).astype(np.float32)), axis=0)
    feat_ref = jnp.asarray(rng.randn(h, w, F).astype(np.float32))
    layer1_ref = jnp.asarray(rng.randn(H // 2, W // 2, 32).astype(np.float32))

    def rnet_step(x):
        out = rnet.apply({"params": params["params"]["r_net"]},
                         jnp.exp(x).transpose(1, 2, 0)[None],
                         feat_ref[None], layer1_ref[None], frame[None])[0]
        return x + 1e-12 * jnp.sum(out).astype(x.dtype)

    slope_time(rnet_step, dpv, "R-Net refine (incl exp/transpose)")

    # --- prediction resample ---
    def pred_step(x):
        bv = predict_next(x, pose_next, cam, d_candi)
        return x + 1e-12 * jnp.sum(bv).astype(x.dtype)

    slope_time(pred_step, dpv, "predict_next resample")

    # --- image-res depth regression + confidence ---
    dpv_r = jax.nn.log_softmax(
        jnp.asarray(rng.randn(D, H, W).astype(np.float32)), axis=0)

    def reg_step(x):
        p = jnp.exp(x)
        depth = jnp.einsum("dhw,d->hw", p, d_candi)
        conf = jnp.max(p, axis=0)
        return x + 1e-12 * (jnp.sum(depth) + jnp.sum(conf)).astype(x.dtype)

    slope_time(reg_step, dpv_r, "image-res depth regression")

    # --- the full cached step for comparison ---
    rollout = make_rollout(cfg, jit=False, fast_sweep=True, sweep_band=4,
                           cache_features=True)
    T = 8
    keys = ("ref", "srcs", "poses", "K", "pose_next")
    frames = {k: jnp.asarray(np.stack([batch[k]] * T)) for k in keys}
    valid0 = jnp.ones((1,), bool)

    import time
    run = jax.jit(lambda bvp: jnp.sum(
        rollout(params, frames, bvp, valid0)[0][:, :, ::64, ::64]))
    bvp = jnp.full((1, D, h, w), -np.log(float(D)), jnp.float32)
    float(run(bvp))
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(bvp))
        print(f"cached rollout: {(time.perf_counter()-t0)/T*1e3:.2f} "
              f"ms/frame", flush=True)


if __name__ == "__main__":
    main()
