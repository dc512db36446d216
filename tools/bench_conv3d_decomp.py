"""conv3d 3x3x3 vs z-decomposed 3x conv2d 3x3 on the real TPU.

The K-Net budget (18.8 ms bf16 of a 33 ms frame) is 12 full-res 3-D convs
that XLA runs at ~50 TF/s. Hypothesis: XLA's TPU conv2d path is better
tuned than conv3d — expressing the 3x3x3 conv as three z-shifted 3x3
conv2ds over a (D, H, W, C) volume (batch=D) with summed outputs is
mathematically identical and may feed the MXU better.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_conv3d_decomp.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

D, H, W, C = 64, 64, 96, 64
N1, N2 = 8, 40
DTYPE = jnp.bfloat16

print("devices:", jax.devices(), flush=True)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(D, H, W, C).astype(np.float32)).astype(DTYPE)
k = jnp.asarray((rng.randn(3, 3, 3, C, C) * 0.05).astype(np.float32)
                ).astype(DTYPE)
flops = 2 * D * H * W * 27 * C * C


def conv3d(v, kern):
    return jax.lax.conv_general_dilated(
        v[None], kern, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)[0].astype(DTYPE)


def conv3d_z2d(v, kern):
    """Same conv as three z-shifted conv2ds (batch = D)."""
    vp = jnp.pad(v, ((1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(3):
        y = jax.lax.conv_general_dilated(
            vp[dz:dz + D], kern[dz], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        out = y if out is None else out + y
    return out.astype(DTYPE)


def conv3d_z2d_fold(v, kern):
    """One conv2d with C_in*3 channels: concat the three z-shifts."""
    vp = jnp.pad(v, ((1, 1), (0, 0), (0, 0), (0, 0)))
    stacked = jnp.concatenate([vp[0:D], vp[1:D + 1], vp[2:D + 2]], axis=-1)
    kk = jnp.concatenate([kern[0], kern[1], kern[2]], axis=2)  # (3,3,3C,C)
    return jax.lax.conv_general_dilated(
        stacked, kk, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(DTYPE)


def slope(fn, label):
    def make(n):
        @jax.jit
        def run(v, kern):
            def body(i, c):
                return fn(c, kern)
            c = jax.lax.fori_loop(0, n, body, v)
            return jnp.sum(c[0, :2, :2].astype(jnp.float32))
        return run

    r1, r2 = make(N1), make(N2)
    float(r1(x, k)); float(r2(x, k))
    t1s, t2s = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(r1(x, k)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(r2(x, k)); t2s.append(time.perf_counter() - t0)
    dt = (min(t2s) - min(t1s)) / (N2 - N1)
    print(f"{label:<40s} {dt*1e3:8.3f} ms  {flops/dt/1e12:5.1f} TF/s",
          flush=True)


# parity first (cheap, on-device)
a = conv3d(x, k)
for name, fn in (("z2d", conv3d_z2d), ("z2d_fold", conv3d_z2d_fold)):
    b = fn(x, k)
    dev = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32))))
    print(f"parity {name}: max|d|={dev:.5f}", flush=True)

slope(conv3d, "XLA conv3d 3x3x3")
slope(conv3d_z2d, "3x z-shifted conv2d")
slope(conv3d_z2d_fold, "one conv2d, 3C_in folded")
