"""Slope-time the pair-packed K-Net chain vs the XLA K-Net on the chip.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_knet_fast.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.models.knet import KNet
from neuralrgbd_tpu.ops.pallas.conv3d_pair import knet_fast_apply

D, H, W, Cin = 64, 64, 96, 16
N1, N2 = 8, 40
FLOPS = 0.893e12


def slope(fn, init, label, reps=3):
    def make(n):
        @jax.jit
        def run(c):
            def it(i, c):
                g = fn(c)
                return c.at[0, 0, 0, 0].set(g[0, 0, 0] * 1e-9 + c[0, 0, 0, 0])

            c = jax.lax.fori_loop(0, n, it, c)
            return jnp.sum(c[0, 0, :4].astype(jnp.float32))

        return run

    r1, r2 = make(N1), make(N2)
    float(r1(init)); float(r2(init))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(r1(init)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(r2(init)); t2s.append(time.perf_counter() - t0)
    dt = (min(t2s) - min(t1s)) / (N2 - N1)
    print(f"{label:<40s} {dt*1e3:8.2f} ms/frame  {FLOPS/dt/1e12:5.1f} TFLOP/s",
          flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(D, H, W, Cin).astype(np.float32) * 0.5)
    knet16 = KNet(feature_dim=64, dtype=jnp.bfloat16)
    knet32 = KNet(feature_dim=64)
    params = knet32.init(jax.random.PRNGKey(0), vol[None])

    slope(lambda v: knet16.apply(params, v[None])[0].astype(jnp.float32),
          vol, "XLA K-Net bf16")
    slope(lambda v: knet_fast_apply(params["params"], v),
          vol, "pair-packed Pallas K-Net chain")

    got = np.asarray(knet_fast_apply(params["params"], vol), np.float32)
    w16 = np.asarray(knet16.apply(params, vol[None])[0], np.float32)
    w32 = np.asarray(knet32.apply(params, vol[None])[0], np.float32)
    print(f"parity: fast-vs-fp32 max {np.abs(got - w32).max():.4f}  "
          f"bf16-vs-fp32 max {np.abs(w16 - w32).max():.4f}  "
          f"rms {float((w32 ** 2).mean()) ** 0.5:.3f}", flush=True)


if __name__ == "__main__":
    main()
