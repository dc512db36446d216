"""Microbenchmark the matmul shapes the round-2 Pallas kernels rest on.

1. sweep cross-correlation: per (view, row): (Wp, C) @ (C, H*Wp)
   = (128, 72) @ (72, 8192), 256 grid steps per launch (one frame's worth)
2. K-Net im2col: (M_tile, 1728) @ (1728, 64), one layer's M = 393216
3. K-Net packed-N variant: N=128

Chained inside one jit; inputs passed as args (big closures break the
remote-compile relay with HTTP 413).
Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_kernel_shapes.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def chain_time(fn, args, n=8, label="", flops_per_call=0.0):
    @jax.jit
    def run(c, *args):
        # data-dependence through the carry so the loop body can't be hoisted
        def body(i, c):
            a0 = args[0] * (1.0 + c[0] * 1e-30).astype(args[0].dtype)
            return c + fn(a0, *args[1:]).astype(c.dtype)

        c = jax.lax.fori_loop(0, n, body, c)
        return jnp.sum(c)

    args = tuple(args)
    float(run(jnp.zeros(4), *args))
    t0 = time.perf_counter()
    float(run(jnp.zeros(4), *args))
    dt = (time.perf_counter() - t0) / n
    tf = flops_per_call / dt / 1e12 if flops_per_call else 0.0
    print(f"{label:<52s} {dt*1e3:8.2f} ms  {tf:6.1f} TFLOP/s", flush=True)
    return dt


def sweep_shape_kernel(s_ref, r_ref, o_ref):
    o_ref[0] = jnp.dot(r_ref[0], s_ref[0],
                       preferred_element_type=jnp.float32)


def matmul_grid_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                       preferred_element_type=jnp.float32)


def main():
    rng = np.random.RandomState(0)

    # ---- 1. sweep cross-correlation shape ----
    C = 72
    S1 = rng.randn(1, C, 8192).astype(np.float32)
    R1 = rng.randn(1, 128, C).astype(np.float32)

    for dt_ in (jnp.float32, jnp.bfloat16):
        def call(S, R):
            out = pl.pallas_call(
                sweep_shape_kernel,
                grid=(256,),
                in_specs=[
                    pl.BlockSpec((1, C, 8192), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 128, C), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 128, 8192), lambda i: (0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, 128, 8192), jnp.float32),
            )(S, R)
            return out[0, 0, :4]

        flops = 2 * 256 * 128 * C * 8192
        chain_time(call, (jnp.asarray(S1, dt_), jnp.asarray(R1, dt_)), n=4,
                   label=f"sweep cross-corr 256x(128x{C}x8192) {dt_.__name__}",
                   flops_per_call=flops)

    # ---- 2/3. K-Net im2col shapes ----
    M, K = 393216, 1728
    TM = 1024
    A1 = rng.randn(M // 64, K).astype(np.float32)  # reuse rows: grid revisits
    for N in (64, 128):
        B1 = rng.randn(K, N).astype(np.float32)
        for dt_ in (jnp.bfloat16, jnp.float32):
            def call(A, B, N=N):
                out = pl.pallas_call(
                    matmul_grid_kernel,
                    grid=(M // TM,),
                    in_specs=[
                        pl.BlockSpec((TM, K), lambda i: (i % 6, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((K, N), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((TM, N), lambda i: (0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((TM, N), jnp.float32),
                )(A, B)
                return out[0, :4]

            flops = 2 * M * K * N
            chain_time(call, (jnp.asarray(A1, dt_), jnp.asarray(B1, dt_)),
                       n=4,
                       label=f"knet im2col ({M}x{K}x{N}) {dt_.__name__}",
                       flops_per_call=flops)

    # ---- 4. XLA reference point ----
    for dt_ in (jnp.bfloat16, jnp.float32):
        A = jnp.asarray(rng.randn(4096, 4096), dt_)

        def call(A):
            y = A @ A
            return jnp.mean(jnp.abs(y[:1, :4])).reshape(1) * 1e-6

        chain_time(call, (A,), n=8, label=f"XLA 4k^3 matmul {dt_.__name__}",
                   flops_per_call=2 * 4096**3)


if __name__ == "__main__":
    main()
