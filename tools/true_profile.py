"""Overhead-free component timing: fit out the per-run fetch latency.

The tunneled backend adds a large FIXED cost per host->device run call
(~30 ms relay round-trip to fetch the result scalar). Round-1 chain timings
divided (F + n*t) by small n, inflating every component by F/n. This tool
times each component at two chain lengths and reports the SLOPE
t = (T(n2) - T(n1)) / (n2 - n1), which is the true per-iteration cost.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/true_profile.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

N1, N2 = 8, 40


def slope_time(step_fn, init, label="", flops=0.0, reps=2):
    def make(n):
        @jax.jit
        def run(c):
            c = jax.lax.fori_loop(0, n, lambda i, c: step_fn(c), c)
            return jnp.sum(jax.tree_util.tree_leaves(c)[0].ravel()[:4])

        return run

    r1, r2 = make(N1), make(N2)
    float(r1(init)); float(r2(init))  # compile+warm
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(r1(init)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(r2(init)); t2s.append(time.perf_counter() - t0)
    t1, t2 = min(t1s), min(t2s)
    dt = (t2 - t1) / (N2 - N1)
    fixed = t1 - N1 * dt
    tf = flops / dt / 1e12 if flops else 0.0
    print(f"{label:<44s} {dt*1e3:8.2f} ms/iter  fixed {fixed*1e3:6.1f} ms"
          f"  {tf:6.1f} TFLOP/s", flush=True)
    return dt


def main():
    import os

    from neuralrgbd_tpu.config import ModelConfig
    from neuralrgbd_tpu.models import FeatureExtractor, KNet, RNet
    from neuralrgbd_tpu.ops import (
        camera_from_K, resample_dpv, sweep_cost_volume,
    )
    from neuralrgbd_tpu.ops.pallas.resample import resample_dpv_pallas

    dtype = jnp.dtype(os.environ.get("PROFILE_DTYPE", "float32"))
    print(f"component dtype: {dtype}", flush=True)
    cfg = ModelConfig(dtype=str(dtype))
    H, W, h, w = 256, 384, 64, 96
    D, V, F = cfg.ndepth, cfg.n_views, cfg.feature_dim
    rng = np.random.RandomState(0)
    cam = camera_from_K(np.array([[83, 0, 48], [0, 72, 32], [0, 0, 1]],
                                 np.float32))
    d_candi = jnp.asarray(cfg.d_candi)

    # feature extractor (5 frames)
    fe = FeatureExtractor(feature_dim=F, multi_scale=True, dtype=dtype)
    x5 = jnp.asarray(rng.randn(V + 1, H, W, 3).astype(np.float32))
    fe_params = fe.init(jax.random.PRNGKey(0), x5)

    def fe_step(x):
        l1, f = fe.apply(fe_params, x)
        return x + 1e-9 * jnp.sum(f).astype(x.dtype)

    slope_time(fe_step, x5, label=f"feature_extractor ({V+1} frames)",
               flops=0.225e12)

    # sweep (with kept channels, as the model calls it)
    ref_f = jnp.asarray(rng.randn(h, w, F + 3).astype(np.float32))
    src_f = jnp.asarray(rng.randn(V, h, w, F + 3).astype(np.float32))
    Rs = jnp.tile(jnp.eye(3), (V, 1, 1))
    ts = jnp.asarray(rng.randn(V, 3).astype(np.float32) * 0.1)

    def sweep_step(r):
        c, kept = sweep_cost_volume(r, src_f, Rs, ts, cam, d_candi, 10.0,
                                    keep_last_channels=3)
        return r + 1e-9 * (jnp.mean(c) + jnp.mean(kept))

    slope_time(sweep_step, ref_f, label=f"sweep+kept V={V} C={F+3}")

    # K-Net
    knet = KNet(feature_dim=cfg.kv_feature_dim, dtype=dtype)
    vol = jnp.asarray(rng.randn(1, D, h, w, cfg.kvnet_in_channels)
                      .astype(np.float32))
    kp = knet.init(jax.random.PRNGKey(0), vol)

    def knet_step(v):
        g = knet.apply(kp, v)
        return v + 1e-9 * jnp.mean(g)

    slope_time(knet_step, vol, label="K-Net 3D CNN", flops=0.893e12)

    # R-Net (single refine)
    rnet = RNet(D=D, dtype=dtype)
    dpv_p = jax.nn.softmax(jnp.asarray(
        rng.randn(1, h, w, D).astype(np.float32)), -1)
    f0 = jnp.asarray(rng.randn(1, h, w, F).astype(np.float32))
    f1 = jnp.asarray(rng.randn(1, 2 * h, 2 * w, 32).astype(np.float32))
    img = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    rp = rnet.init(jax.random.PRNGKey(0), dpv_p, f0, f1, img)

    def rnet_step(d):
        o = rnet.apply(rp, d, f0, f1, img)
        return d + 1e-9 * jnp.mean(jnp.exp(o)).astype(d.dtype)

    slope_time(rnet_step, dpv_p, label="R-Net (1 pass)")

    # resample: XLA and Pallas
    dpv0 = jnp.log(jax.nn.softmax(
        jnp.asarray(rng.randn(D, h, w).astype(np.float32)), 0))
    rel = jnp.eye(4).at[0, 3].set(0.02)

    def rs_xla(v):
        return resample_dpv(v, rel, cam, d_candi, float(np.log(1 / D)))

    slope_time(rs_xla, dpv0, label="resample_dpv XLA")

    if jax.default_backend() == "tpu":
        def rs_pl(v):
            return resample_dpv_pallas(v, rel, cam, d_candi,
                                       float(np.log(1 / D)))

        slope_time(rs_pl, dpv0, label="resample_dpv Pallas")

        from neuralrgbd_tpu.ops.pallas.sweep_fused import (
            sweep_cost_volume_fused)

        def sweep_fused_step(r):
            c, kept = sweep_cost_volume_fused(
                r, src_f, Rs, ts, cam, d_candi, 10.0, keep_last_channels=3)
            return r + 1e-9 * (jnp.mean(c) + jnp.mean(kept))

        slope_time(sweep_fused_step, ref_f, label="sweep fused Pallas")

    # whole infer step (the bench per-frame compute, carry chained)
    from neuralrgbd_tpu.data import synthetic_batch
    from neuralrgbd_tpu.infer.step import make_infer_step
    from neuralrgbd_tpu.train import create_train_state
    from neuralrgbd_tpu.config import TrainConfig

    bd = str(dtype) if str(dtype) != "float32" else None
    icfg = ModelConfig(infer_dtype=bd) if bd else \
        ModelConfig(infer_dtype=None)
    batch, _ = synthetic_batch(icfg, n_lanes=1, img_hw=(H, W), seed=0)
    state = create_train_state(icfg, TrainConfig(), batch)
    istep = make_infer_step(icfg, jit=False)
    b = {k: jnp.asarray(batch[k])
         for k in ("ref", "srcs", "poses", "K", "pose_next")}

    def infer_chain(bvp):
        out = istep(state.params, b, bvp, jnp.ones((1,), bool))
        return out.bv_predict

    bvp0 = jnp.full((1, D, h, w), -np.log(D), jnp.float32)
    slope_time(infer_chain, bvp0, label=f"FULL infer step (infer_dtype={bd})")


if __name__ == "__main__":
    main()
