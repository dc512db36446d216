"""Probe Mosaic DMA slicing rules on this TPU: which (offset, width) slices
of an ANY-space (HBM) source and a VMEM dest compile and run correctly.

PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_dma.py
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 512, 128


def try_case(name, fn):
    try:
        out = fn()
        print(f"{name:<58s} OK   {out}")
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{name:<58s} FAIL {msg}")


def src_offset_case(off, width, dst_off=0):
    """DMA hbm[(off):(off+L), :width] -> vmem scratch[:, dst_off:dst_off+width]."""
    x = jnp.asarray(np.arange(R * width, dtype=np.float32)
                    .reshape(R, width)).astype(jnp.bfloat16)

    def kernel(x_ref, o_ref, scratch, sem):
        pltpu.make_async_copy(
            x_ref.at[pl.ds(off, L), :],
            scratch.at[pl.ds(0, L), pl.ds(dst_off, width)],
            sem).start()
        pltpu.make_async_copy(
            x_ref.at[pl.ds(off, L), :],
            scratch.at[pl.ds(0, L), pl.ds(dst_off, width)],
            sem).wait()
        o_ref[...] = scratch[...].astype(jnp.float32)

    W2 = max(width + dst_off, 128)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, W2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((L, W2), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)
    got = np.asarray(out[:, dst_off:dst_off + width])
    want = np.asarray(x[off:off + L, :].astype(jnp.float32))
    ok = np.array_equal(got, want)
    return f"values {'MATCH' if ok else 'WRONG'}"


def main():
    print("devices:", jax.devices(), flush=True)
    # full-width 128-lane source, varying sublane offset
    for off in (0, 8, 1, 4, 3):
        try_case(f"src (R,128) sublane offset {off}, full width",
                 functools.partial(src_offset_case, off, 128))
    # 64-wide source (lane-padded in HBM?), aligned offsets
    try_case("src (R,64) offset 0, width 64 -> dst cols 0:64",
             functools.partial(src_offset_case, 0, 64))
    try_case("src (R,64) offset 0, width 64 -> dst cols 64:128",
             functools.partial(src_offset_case, 0, 64, 64))
    try_case("src (R,64) offset 1, width 64",
             functools.partial(src_offset_case, 1, 64))


if __name__ == "__main__":
    main()
