"""On-device timing of each KV-Net component (chained-loop methodology).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_components.py [bf16]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def chain_time(step_fn, init, n=6, label=""):
    @jax.jit
    def run(c):
        c = jax.lax.fori_loop(0, n, lambda i, c: step_fn(c), c)
        return jnp.sum(jax.tree.leaves(c)[0].ravel()[:4])

    float(run(init))
    t0 = time.perf_counter()
    float(run(init))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:<38s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    from neuralrgbd_tpu.config import ModelConfig, TrainConfig
    from neuralrgbd_tpu.data import synthetic_batch
    from neuralrgbd_tpu.models import FeatureExtractor, KNet, RNet
    from neuralrgbd_tpu.ops import (
        camera_from_K,
        resample_dpv,
        sweep_cost_volume,
        warp_to_ref_over_depths,
    )
    from neuralrgbd_tpu.train import create_train_state

    dtype = "bfloat16" if "bf16" in sys.argv[1:] else "float32"
    cfg = ModelConfig(dtype=dtype)
    print(f"dtype={dtype}")
    H, W = 256, 384
    h, w = 64, 96
    D, V, F = cfg.ndepth, cfg.n_views, cfg.feature_dim
    rng = np.random.RandomState(0)

    cam = camera_from_K(np.array([[83, 0, 48], [0, 72, 32], [0, 0, 1]], np.float32))
    d_candi = jnp.asarray(cfg.d_candi)

    # feature extractor, 5 frames
    fe = FeatureExtractor(feature_dim=F, multi_scale=True, dtype=jnp.dtype(dtype))
    x5 = jnp.asarray(rng.randn(V + 1, H, W, 3).astype(np.float32))
    fe_params = fe.init(jax.random.PRNGKey(0), x5)

    def fe_step(x):
        l1, f = fe.apply(fe_params, x)
        return x + 1e-9 * jnp.sum(f).astype(x.dtype)

    chain_time(fe_step, x5, label=f"feature_extractor ({V+1} frames)")

    # sweep
    ref_f = jnp.asarray(rng.randn(h, w, F + 3).astype(np.float32))
    src_f = jnp.asarray(rng.randn(V, h, w, F + 3).astype(np.float32))
    Rs = jnp.tile(jnp.eye(3), (V, 1, 1))
    ts = jnp.asarray(rng.randn(V, 3).astype(np.float32) * 0.1)

    def sweep_step(r):
        c = sweep_cost_volume(r, src_f, Rs, ts, cam, d_candi, 10.0)
        return r + 1e-9 * jnp.mean(c)

    chain_time(sweep_step, ref_f, label=f"sweep_cost_volume V={V} C={F+3}")

    # K-Net input warps (RGB over depths)
    srcs_rgb = jnp.asarray(rng.randn(V, h, w, 3).astype(np.float32))

    def warp_step(s):
        wv = warp_to_ref_over_depths(s, Rs, ts, cam, d_candi)
        return s + 1e-9 * jnp.mean(wv)

    chain_time(warp_step, srcs_rgb, label="warp_to_ref_over_depths (RGB)")

    # K-Net
    knet = KNet(feature_dim=cfg.kv_feature_dim, dtype=jnp.dtype(dtype))
    vol = jnp.asarray(rng.randn(1, D, h, w, cfg.kvnet_in_channels).astype(np.float32))
    kp = knet.init(jax.random.PRNGKey(0), vol)

    def knet_step(v):
        g = knet.apply(kp, v)
        return v + 1e-9 * jnp.mean(g)

    chain_time(knet_step, vol, label=f"K-Net 3D CNN ({cfg.kvnet_in_channels}ch)")

    # R-Net
    rnet = RNet(D=D, dtype=jnp.dtype(dtype))
    dpv_p = jax.nn.softmax(jnp.asarray(rng.randn(1, h, w, D).astype(np.float32)), -1)
    f0 = jnp.asarray(rng.randn(1, h, w, F).astype(np.float32))
    f1 = jnp.asarray(rng.randn(1, 2 * h, 2 * w, 32).astype(np.float32))
    img = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    rp = rnet.init(jax.random.PRNGKey(0), dpv_p, f0, f1, img)

    def rnet_step(d):
        o = rnet.apply(rp, d, f0, f1, img)
        return d + 1e-9 * jnp.mean(jnp.exp(o)).astype(d.dtype)

    chain_time(rnet_step, dpv_p, label="R-Net (x2 per frame)")

    # resample
    dpv0 = jnp.log(jax.nn.softmax(jnp.asarray(rng.randn(D, h, w).astype(np.float32)), 0))
    rel = jnp.eye(4).at[0, 3].set(0.02)

    def rs_step(v):
        return resample_dpv(v, rel, cam, d_candi, float(np.log(1 / D)))

    chain_time(rs_step, dpv0, label="resample_dpv")

    # full infer step
    from neuralrgbd_tpu.infer.rollout import make_rollout

    batch, _ = synthetic_batch(cfg, n_lanes=1, img_hw=(H, W), seed=0)
    state = create_train_state(cfg, TrainConfig(), batch)
    frames = {k: jnp.asarray(np.stack([batch[k]] * 4))
              for k in ("ref", "srcs", "poses", "K", "pose_next")}
    rollout = make_rollout(cfg, jit=False)

    @jax.jit
    def run(bvp):
        depths, confs, bv = rollout(state.params, frames, bvp, jnp.ones((1,), bool))
        return jnp.sum(depths[:, :, ::64, ::64]) + 0.0 * jnp.sum(bv[:, :, :1, :1])

    bvp = jnp.full((1, D, h, w), -np.log(D), jnp.float32)
    float(run(bvp))
    t0 = time.perf_counter()
    float(run(bvp))
    dt = (time.perf_counter() - t0) / 4
    print(f"{'FULL infer step (per frame)':<38s} {dt*1e3:8.2f} ms  "
          f"({1/dt:.1f} FPS)", flush=True)


if __name__ == "__main__":
    main()
