"""On-device parity + slope-timing of the fused Pallas sweep vs the XLA path.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_sweep_fused.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")
from true_profile import slope_time  # noqa: E402

from neuralrgbd_tpu.config import ModelConfig  # noqa: E402
from neuralrgbd_tpu.ops.camera import camera_from_K  # noqa: E402
from neuralrgbd_tpu.ops.pallas.sweep_fused import (  # noqa: E402
    band_spread, sweep_cost_volume_fused)
from neuralrgbd_tpu.ops.rotations import unitq_to_rotation  # noqa: E402
from neuralrgbd_tpu.ops.sweep import sweep_cost_volume  # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = ModelConfig()
    h, w = 64, 96
    D, V, C = cfg.ndepth, cfg.n_views, cfg.feature_dim + 3
    rng = np.random.RandomState(0)
    cam = camera_from_K(np.array([[83, 0, 48], [0, 72, 32], [0, 0, 1]],
                                 np.float32))
    d_candi = jnp.asarray(cfg.d_candi)

    ref = jnp.asarray(rng.randn(h, w, C).astype(np.float32))
    srcs = jnp.asarray(rng.randn(V, h, w, C).astype(np.float32))
    Rs = jnp.stack([
        unitq_to_rotation(jnp.asarray([1.0, 0.01 * (v - 1.5), 0.008]))
        for v in range(V)
    ])
    ts = jnp.asarray(rng.randn(V, 3).astype(np.float32) * 0.08)

    print("band spread:", float(band_spread(Rs, ts, cam, d_candi, h, w)),
          flush=True)

    # ---- parity on device ----
    want_c, want_k = jax.jit(lambda: sweep_cost_volume(
        ref, srcs, Rs, ts, cam, d_candi, cfg.sigma_soft_max,
        keep_last_channels=3))()
    for prec, name in [(None, "default"),
                       (jax.lax.Precision.HIGHEST, "highest")]:
        got_c, got_k = jax.jit(lambda p=prec: sweep_cost_volume_fused(
            ref, srcs, Rs, ts, cam, d_candi, cfg.sigma_soft_max,
            keep_last_channels=3, precision=p))()
        for nm, a, b in [("cost", got_c, want_c), ("kept", got_k, want_k)]:
            a, b = np.asarray(a), np.asarray(b)
            rel = np.abs(a - b) / (np.abs(b) + 1e-3)
            print(f"prec={name:8s} {nm}: max_abs={np.max(np.abs(a-b)):.3e} "
                  f"max_rel={np.max(rel):.3e}", flush=True)

    # ---- slope timing ----
    def xla_step(x):
        c, k = sweep_cost_volume(x, srcs, Rs, ts, cam, d_candi,
                                 cfg.sigma_soft_max, keep_last_channels=3)
        return x + 1e-12 * (jnp.sum(c) + jnp.sum(k)).astype(x.dtype)

    slope_time(xla_step, ref, "XLA sweep+kept (oracle)")

    # three dot formulations: BY small dots (loop), M-folded single dot
    # (mfold — band reshaped into the M dim, full MXU M occupancy), and the
    # K-folded contraction (bm — round-3 negative, kept for reference)
    for band in (8, 4, 16):
        for mode in ("loop", "mfold", "bm"):
            kw = {"band_matmul": mode == "bm", "m_fold": mode == "mfold"}

            def fused_step(x, b=band, kw=kw):
                c, k = sweep_cost_volume_fused(
                    x, srcs, Rs, ts, cam, d_candi, cfg.sigma_soft_max,
                    keep_last_channels=3, band=b, **kw)
                return x + 1e-12 * (jnp.sum(c) + jnp.sum(k)).astype(x.dtype)

            slope_time(fused_step, ref,
                       f"fused Pallas sweep (band={band} {mode})",
                       flops=V * D * h * band * 2 * 128 * 128 * 72)

    # band_matmul on-device parity (the tiled-reshape + lane-concat path
    # only exists on real Mosaic, interpret mode can't prove it)
    for label, kw in [("band_matmul", {"band_matmul": True}),
                      ("m_fold", {"m_fold": True, "band_matmul": False})]:
        got_c, got_k = jax.jit(lambda kw=kw: sweep_cost_volume_fused(
            ref, srcs, Rs, ts, cam, d_candi, cfg.sigma_soft_max,
            keep_last_channels=3, **kw))()
        for nm, a, b in [("cost", got_c, want_c), ("kept", got_k, want_k)]:
            a, b = np.asarray(a), np.asarray(b)
            print(f"{label} {nm}: max_abs={np.max(np.abs(a - b)):.3e}",
                  flush=True)


if __name__ == "__main__":
    main()
