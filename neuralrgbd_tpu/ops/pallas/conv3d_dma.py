"""Async-DMA implicit-GEMM 3x3x3 conv for the K-Net residual stack.

Round 2 established (PERF.md "Pallas K-Net conv: NEGATIVE") that building
im2col patch slabs with VPU copies loses: sublane-misaligned VMEM copies run
at ~0.11 Tel/s and misaligned-lhs dots pay ~1.3 ms/layer in relayouts, while
XLA's native conv3d holds ~47 TF/s in-context. What round 2 never tried is
the *DMA engine* as the patch builder: HBM->VMEM `make_async_copy` takes
arbitrary element offsets on both sides, so the nine (kh, kw)-shifted
row-slabs of one depth slice can be *copied into their K-column positions*
of a (rows, 9*C) slab while the MXU is busy dotting the previous slice —
alignment becomes the DMA engine's problem, not the VPU's.

Design (one `pallas_call`, no grid — the pipeline is explicit):

- input is a zero-PADDED, row-flattened volume in HBM (`memory_space=ANY`):
  (D+2, RU, C) bf16, slice p rows = yp*WP + xp (yp in [0,H+2), xp in [0,WP),
  borders zero). W pads to WP (mult of 8) so a tap (kh, kw) of output row
  r = y*WP + x is source row r + kh*WP + kw — three strided linear reads.
- a 4-slot slab ring (ROWS, 9C) bf16 in VMEM is filled by 9 async DMAs per
  slice, double-buffered 2 slices ahead.
- per slice e, two MXU dots consume the slab (the N=64 output width cannot
  fill the 128-lane MXU alone, so the three kd-taps' weights are packed):
      dotB = slab_e @ W_kd0            (ROWS, 64)  -> initializes acc[e]
      dotA = slab_e @ [W_kd1 | W_kd2]  (ROWS, 128) -> accumulates acc[e-1],
                                                      and COMPLETES acc[e-2]
  (out[d] = sum_kd slab[d+kd] @ W_kd over the depth-padded slab index.)
- completed slices are x-pad-masked, reduced into per-channel sum/sumsq
  (the BatchNorm batch statistics — saving the consumer a full re-read),
  cast bf16, and DMA'd back to HBM into the SAME padded layout (a shift by
  WP+1 rows keeps every pad row zero), so layers chain without re-padding.

Weights/operands feed the MXU in bf16 with f32 accumulation — the exact
precision class of XLA's default TPU conv (PERF.md round-2
re-characterization), in both fp32 and bf16 model modes.

Reference parity target: torch Conv3d(k=3, s=1, p=1, bias=False) as used by
``convbn_3d`` (``/root/reference/code/models/psm_submodule.py:18-22``,
``basic.py:53-139``); oracle: ``jax.lax.conv_general_dilated``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _geom(D: int, H: int, W: int):
    WP = _round_up(W + 2, 8)
    ROWS = H * WP                       # output rows per slice
    # max tap access: (ROWS-1) + 2*WP + 2; +1 rows, rounded to sublanes
    RU = _round_up(ROWS + 2 * WP + 3, 8)
    return WP, ROWS, RU


def pad_volume(x: jax.Array) -> jax.Array:
    """(D, H, W, C) -> the kernel's padded HBM layout (D+2, RU, C) bf16."""
    D, H, W, C = x.shape
    WP, ROWS, RU = _geom(D, H, W)
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, WP - W - 1), (0, 0)))
    xp = xp.reshape(D + 2, (H + 2) * WP, C)
    xp = jnp.pad(xp, ((0, 0), (0, RU - (H + 2) * WP), (0, 0)))
    return xp.astype(jnp.bfloat16)


def unpad_volume(yp: jax.Array, D: int, H: int, W: int) -> jax.Array:
    """Inverse of the padded layout: (D+2, RU, C) -> (D, H, W, C)."""
    WP, ROWS, RU = _geom(D, H, W)
    C = yp.shape[-1]
    core = yp[1:D + 1, WP + 1:WP + 1 + ROWS, :]
    return core.reshape(D, H, WP, C)[:, :, :W, :]


def _make_kernel(D, H, W, C, N, WP, ROWS, RU, with_stats):
    NTAP = 9
    K = NTAP * C

    def kernel(xp_ref, wA_ref, wB_ref, _outinit_ref, out_ref, stats_ref,
               slab, acc, obuf, in_sems, out_sems):
        def slab_dma(e, slot, tap):
            kh, kw = tap // 3, tap % 3
            return pltpu.make_async_copy(
                xp_ref.at[e, pl.ds(kh * WP + kw, ROWS), :],
                slab.at[slot, :, pl.ds(tap * C, C)],
                in_sems.at[slot, tap],
            )

        def start_slab(e):
            slot = jax.lax.rem(e, 4)
            for tap in range(NTAP):
                slab_dma(e, slot, tap).start()

        def wait_slab(e):
            slot = jax.lax.rem(e, 4)
            for tap in range(NTAP):
                slab_dma(e, slot, tap).wait()

        def out_dma(d, oslot):
            return pltpu.make_async_copy(
                obuf.at[oslot],
                out_ref.at[d + 1, pl.ds(WP + 1, ROWS), :],
                out_sems.at[oslot],
            )

        # x-pad mask: output row r covers x = r % WP; x >= W is pad
        xcol = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (ROWS, N), 0), WP)
        valid = (xcol < W).astype(jnp.float32)

        start_slab(0)
        start_slab(1)

        def body(e, _):
            slot = jax.lax.rem(e, 4)

            @pl.when(e + 2 < D + 2)
            def _():
                start_slab(e + 2)

            wait_slab(e)
            s = slab[slot]

            @pl.when(e < D)
            def _():
                acc[jax.lax.rem(e, 3)] = jax.lax.dot_general(
                    s, wB_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            @pl.when(e >= 1)
            def _():
                dA = jax.lax.dot_general(
                    s, wA_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                a1 = jax.lax.rem(e - 1 + 3, 3)
                acc[a1] += dA[:, :N]

                @pl.when(e >= 2)
                def _():
                    d = e - 2
                    a2 = jax.lax.rem(d, 3)
                    v = (acc[a2] + dA[:, N:]) * valid
                    acc[a2] = v
                    if with_stats:
                        ssum = jnp.sum(v, axis=0, keepdims=True)
                        ssq = jnp.sum(v * v, axis=0, keepdims=True)

                        @pl.when(d == 0)
                        def _():
                            stats_ref[0:1, 0:N] = ssum
                            stats_ref[1:2, 0:N] = ssq

                        @pl.when(d > 0)
                        def _():
                            stats_ref[0:1, 0:N] += ssum
                            stats_ref[1:2, 0:N] += ssq
                    oslot = jax.lax.rem(d, 2)

                    @pl.when(d >= 2)
                    def _():
                        out_dma(d - 2, oslot).wait()

                    obuf[oslot] = v.astype(jnp.bfloat16)
                    out_dma(d, oslot).start()

            return 0

        jax.lax.fori_loop(0, D + 2, body, 0, unroll=False)
        out_dma(D - 2, jax.lax.rem(D - 2, 2)).wait()
        out_dma(D - 1, jax.lax.rem(D - 1, 2)).wait()

    return kernel


def conv3d_dma(x: jax.Array, w: jax.Array, interpret: bool = False,
               with_stats: bool = False):
    """3-D conv, kernel 3, stride 1, padding 1, no bias (drop-in API).

    x: (D, H, W, C); w: (3, 3, 3, C, N). Returns (D, H, W, N) bf16 values
    (f32-accumulated MXU dots cast at writeout), plus (sum, sumsq) per
    channel when ``with_stats``. Requires C % 8 == 0, N % 8 == 0.
    """
    D, H, W, C = x.shape
    N = w.shape[-1]
    xp = pad_volume(x)
    out = jnp.zeros((D + 2, xp.shape[1], N), jnp.bfloat16)
    yp, stats = _conv3d_dma_padded(xp, w, out, H, W, interpret, with_stats)
    y = unpad_volume(yp, D, H, W)
    if with_stats:
        return y, stats[0, :N], stats[1, :N]
    return y


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "interpret", "with_stats"),
                   donate_argnums=(2,))
def _conv3d_dma_padded(xp, w, out_init, H, W, interpret, with_stats):
    Dp2, RU, C = xp.shape
    D = Dp2 - 2
    N = w.shape[-1]
    if C % 8 or N % 8:
        raise ValueError(f"need C, N multiples of 8; got C={C} N={N}")
    WP, ROWS, RU2 = _geom(D, H, W)
    assert RU2 == RU, (RU2, RU)
    NP = max(N, 128)

    # weight packing: slab K order is (kh, kw, c); W_kd = w[kd] as (9C, N)
    wk = w.astype(jnp.bfloat16).reshape(3, 9 * C, N)
    wA = jnp.concatenate([wk[1], wk[2]], axis=1)          # (9C, 2N)
    wB = wk[0]                                            # (9C, N)

    kernel = _make_kernel(D, H, W, C, N, WP, ROWS, RU, with_stats)
    out, stats = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D + 2, RU, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((8, NP), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, ROWS, 9 * C), jnp.bfloat16),   # slab ring
            pltpu.VMEM((3, ROWS, N), jnp.float32),        # accumulators
            pltpu.VMEM((2, ROWS, N), jnp.bfloat16),       # out staging
            pltpu.SemaphoreType.DMA((4, 9)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={3: 0},    # out_init buffer is donated
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            has_side_effects=True,
        ),
        interpret=interpret,
    )(xp, wA, wB, out_init)
    return out, stats


def oracle_conv3d(x, w):
    """XLA reference for parity tests."""
    return jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(1, 1, 1), padding=((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]
