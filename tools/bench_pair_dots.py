"""Measure the pair-packed implicit-GEMM dot rate for the K-Net shape.

The alignment-clean conv design (after tools/probe_dma.py ruled out every
sub-tile DMA slice) pairs adjacent output pixels: per depth slice, 3 dots of
(3584, 768) @ (768, 128) bf16. This measures that exact dot stream from
VMEM, plus the 6-DMA slab build, to decide whether the kernel can beat
XLA's 1.88 ms/layer (46 TF/s) before building it.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_pair_dots.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 3584, 768, 128
NSLAB = 64
NDOT = 3
N1, N2 = 4, 16


def slope(make_run, init, label, flops):
    r1, r2 = make_run(N1), make_run(N2)
    float(r1(init)); float(r2(init))
    t1s, t2s = [], []
    for _ in range(3):
        t0 = time.perf_counter(); float(r1(init)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(r2(init)); t2s.append(time.perf_counter() - t0)
    dt = (min(t2s) - min(t1s)) / (N2 - N1)
    print(f"{label:<52s} {dt*1e3:8.3f} ms/iter  {flops/dt/1e12:6.1f} TFLOP/s",
          flush=True)
    return dt


def dots_kernel(x_ref, w_ref, out_ref, slab, acc):
    # slab filled once from x (aligned big copy), then the full per-layer
    # dot stream: NSLAB slices x NDOT dots each
    slab[...] = x_ref[...]

    def body(i, _):
        for j in range(NDOT):
            acc[...] = jax.lax.dot_general(
                slab[...], w_ref[j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, NSLAB, body, 0)
    out_ref[...] = acc[...]


def make_dots_run(n):
    @jax.jit
    def run(x):
        w = jnp.ones((NDOT, K, N), jnp.bfloat16) * 0.01

        def it(i, c):
            y = pl.pallas_call(
                dots_kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                scratch_shapes=[pltpu.VMEM((M, K), jnp.bfloat16),
                                pltpu.VMEM((M, N), jnp.float32)],
            )(c, w)
            return (c * 1.0).at[0, 0].set(y[0, 0].astype(jnp.bfloat16))

        c = jax.lax.fori_loop(0, n, it, x)
        return jnp.sum(c[0, :8].astype(jnp.float32))

    return run


def dma_kernel(xp_ref, out_ref, slab, sems):
    # per slab: 6 aligned full-width DMAs (the pair design's slab build),
    # 4-deep ring, no compute — measures achievable slab-build bandwidth
    WPH = 56          # WP=112 in paired rows

    def dmas(e, slot):
        cps = []
        for kh in range(3):
            for g in range(2):
                cps.append(pltpu.make_async_copy(
                    xp_ref.at[e, pl.ds(kh * WPH + g, M), :],
                    slab.at[slot, :, pl.ds((kh * 2 + g) * 128, 128)],
                    sems.at[slot, kh * 2 + g]))
        return cps

    for c in dmas(0, 0):
        c.start()
    for c in dmas(1, 1):
        c.start()

    def body(e, _):
        slot = jax.lax.rem(e, 4)

        @pl.when(e + 2 < NSLAB)
        def _():
            for c in dmas(e + 2, jax.lax.rem(e + 2, 4)):
                c.start()

        for c in dmas(e, slot):
            c.wait()
        return 0

    jax.lax.fori_loop(0, NSLAB, body, 0)
    out_ref[...] = slab[0, :8, :128].astype(jnp.float32)


def make_dma_run(n):
    RU2 = 3704

    @jax.jit
    def run(xp):
        def it(i, c):
            y = pl.pallas_call(
                dma_kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((4, M, K), jnp.bfloat16),
                                pltpu.SemaphoreType.DMA((4, 6))],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=80 * 1024 * 1024,
                    has_side_effects=True),
            )(c)
            return (c * 1.0).at[0, 0, 0].set(y[0, 0].astype(jnp.bfloat16))

        c = jax.lax.fori_loop(0, n, it, xp)
        return jnp.sum(c[0, 0, :8].astype(jnp.float32))

    return run


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, K).astype(np.float32)).astype(jnp.bfloat16)
    flops_layer = 2 * M * K * N * NDOT * NSLAB
    slope(make_dots_run, x, f"pair dots {NSLAB}x{NDOT} ({M},{K})@({K},{N})",
          flops_layer)

    xp = jnp.asarray(rng.randn(66, 3704, 128).astype(np.float32)
                     ).astype(jnp.bfloat16)
    bytes_layer = NSLAB * 6 * M * 128 * 2
    dt = slope(make_dma_run, xp, f"slab build {NSLAB}x6 DMAs (M={M},128)",
               0)
    print(f"  slab-build bandwidth: {bytes_layer/dt/1e9:.0f} GB/s "
          f"({bytes_layer/1e6:.0f} MB/layer)", flush=True)


if __name__ == "__main__":
    main()
