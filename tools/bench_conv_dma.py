"""Slope-time the async-DMA implicit-GEMM conv3d vs XLA native (K-Net shape).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_conv_dma.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

D, H, W, C, N = 64, 64, 96, 64, 64
N1, N2 = 8, 40
FLOPS_LAYER = 2 * D * H * W * 27 * C * N          # 8.7e10 at the op point


def slope(fn, init, label, flops=FLOPS_LAYER, reps=3):
    def make(n):
        @jax.jit
        def run(c):
            c = jax.lax.fori_loop(0, n, lambda i, c: fn(c), c)
            return jnp.sum(c[0, 0, :4].astype(jnp.float32))

        return run

    r1, r2 = make(N1), make(N2)
    float(r1(init)); float(r2(init))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(r1(init)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(r2(init)); t2s.append(time.perf_counter() - t0)
    dt = (min(t2s) - min(t1s)) / (N2 - N1)
    print(f"{label:<42s} {dt*1e3:8.3f} ms/layer   "
          f"{flops/dt/1e12:6.1f} TFLOP/s", flush=True)
    return dt


def main():
    from neuralrgbd_tpu.ops.pallas.conv3d_dma import conv3d_dma

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(D, H, W, C).astype(np.float32) * 0.5)
    # near-orthogonal-ish scaling keeps the chained volume bounded
    w = jnp.asarray((rng.randn(3, 3, 3, C, N) * (1.0 / np.sqrt(27 * C)))
                    .astype(np.float32))

    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)

    def xla_layer(c):
        y = jax.lax.conv_general_dilated(
            c[None], wb, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)[0]
        return y.astype(jnp.bfloat16)

    slope(xla_layer, xb, "XLA native conv3d bf16")

    def dma_layer(c):
        return conv3d_dma(c, w)

    slope(dma_layer, xb, "Pallas DMA conv3d (drop-in incl pad)")

    def dma_layer_stats(c):
        y, s, sq = conv3d_dma(c, w, with_stats=True)
        return y + (0.0 * s[0]).astype(y.dtype)

    slope(dma_layer_stats, xb, "Pallas DMA conv3d + BN stats")

    # parity on-device
    from neuralrgbd_tpu.ops.pallas.conv3d_dma import oracle_conv3d
    y = np.asarray(conv3d_dma(xb, w), np.float32)
    ref = np.asarray(oracle_conv3d(xb, w))
    err = np.abs(y - ref)
    print(f"parity: max abs {err.max():.4e}  mean abs {err.mean():.4e}  "
          f"ref rms {float((ref**2).mean())**0.5:.3f}", flush=True)


if __name__ == "__main__":
    main()
