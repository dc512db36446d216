"""Pallas 3x3x3 conv kernel for the K-Net residual stack.

STATUS: tested, differentiable, NOT WIRED IN — a documented negative result
(PERF.md "Pallas K-Net conv: investigated, NEGATIVE"). XLA's native conv3d
(2.28 ms/layer, 38 TF/s) beats every Pallas formulation on this Mosaic
version: the sublane-misaligned patch copies run at ~0.11 Tel/s and
misaligned-lhs dots pay ~1.3 ms/layer in relayouts, erasing the 91 TF/s
available from aligned K=576 matmuls. Kept because (a) it is the starting
point if a future Mosaic makes shifted copies cheap, and (b) its parity
tests pin down the im2col layout math.

XLA's native conv3d lowering caps at ~40 TFLOP/s on v5e for the K-Net shape
(C=64 3-D convs on 64x64x96), less than half the measured rate of the same
contraction expressed as im2col matmuls (62-86 TFLOP/s,
tools/bench_kernel_shapes.py). This kernel restructures one conv layer as:

- grid over output depth slices d; the three input slices d-1, d, d+1 arrive
  as three block-spec'd row slabs of the (zero-padded, row-flattened) volume;
- per slice, a kw-concatenated patch slab is built in VMEM: 3 shifted copies
  of the (Hp*Wpa, C) rows giving (rows, 3C) — so each element is copied once
  and read by all three kh taps;
- 9 MXU matmuls (rows, 3C) @ (3C, N) at static, 8-aligned row offsets
  (W is padded to a multiple of 8 so kh*Wpa offsets stay aligned) accumulate
  the output slice in fp32.

Numerics: operands are fed to the MXU in bf16 with fp32 accumulation —
exactly the precision class of XLA's default "fp32" conv on TPU (see
PERF.md round-2 re-characterization), so this is a drop-in for the K-Net's
convs in BOTH fp32 and bf16 model modes.

Reference parity target: torch Conv3d(k=3, s=1, p=1, bias=False) as used by
``convbn_3d`` (``/root/reference/code/models/psm_submodule.py:18-22``,
``basic.py:53-139``); the oracle is ``jax.lax.conv_general_dilated`` via
``models/layers.py:ConvB``.

Differentiable: a custom VJP routes gradients through the same XLA
convolution formulas autodiff would produce for the oracle (transposed conv
for dx, correlation for dw), so training can use the kernel too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(R, RU, Wpa, C, N, n_kd):
    C3 = 3 * C

    def kernel(*refs):
        x_refs = refs[:n_kd]
        w_ref, out_ref, slab_ref = refs[n_kd], refs[n_kd + 1], refs[n_kd + 2]
        Lc = RU - 2

        for kd in range(n_kd):
            # kw-concatenated patch slab: slab[r] = [x[r], x[r+1], x[r+2]]
            for j in range(3):
                slab_ref[0:Lc, j * C:(j + 1) * C] = x_refs[kd][0, j:j + Lc, :]
            for kh in range(3):
                part = jax.lax.dot_general(
                    slab_ref[kh * Wpa:kh * Wpa + R, :],
                    w_ref[kd * 3 + kh],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if kd == 0 and kh == 0:
                    out_ref[0] = part
                else:
                    out_ref[0] += part

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_3x3x3(x: jax.Array, w: jax.Array, interpret: bool = False):
    """3-D convolution, kernel 3, stride 1, padding 1, no bias.

    x: (D, H, W, C); w: (3, 3, 3, C, N). Returns (D, H, W, N) float32.
    Requires C % 8 == 0 and N % 8 == 0 (pad channels or use the XLA conv).
    """
    return _conv_fwd_impl(x, w, interpret)


def _conv_fwd_impl(x, w, interpret):
    D, H, W, C = x.shape
    N = w.shape[-1]
    assert w.shape == (3, 3, 3, C, N), w.shape
    if C % 8 or N % 8:
        raise ValueError(f"need C, N multiples of 8; got C={C} N={N}")

    Wpa = _round_up(W + 2, 8)
    Hp = H + 2
    R = H * Wpa
    RU = _round_up(Hp * Wpa + 8, 8)

    # zero-padded, row-flattened volume in the MXU input dtype
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, Wpa - W - 1), (0, 0)))
    xp = xp.reshape(D + 2, Hp * Wpa, C)
    xp = jnp.pad(xp, ((0, 0), (0, RU - Hp * Wpa), (0, 0)))
    xp = xp.astype(jnp.bfloat16)

    # (9, 3C, N): per (kd, kh), kw-major rows to match the slab layout
    wk = w.reshape(9, 3 * C, N).astype(jnp.bfloat16)

    kernel = _make_kernel(R, RU, Wpa, C, N, n_kd=3)
    in_specs = [
        pl.BlockSpec((1, RU, C), lambda d, kd=kd: (d + kd, 0, 0),
                     memory_space=pltpu.VMEM)
        for kd in range(3)
    ] + [pl.BlockSpec((9, 3 * C, N), lambda d: (0, 0, 0),
                      memory_space=pltpu.VMEM)]

    out = pl.pallas_call(
        kernel,
        grid=(D,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R, N), lambda d: (d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, R, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((RU, 3 * C), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp, xp, xp, wk)

    return out.reshape(D, H, Wpa, N)[:, :, :W, :]


def _oracle_conv(x, w):
    return jax.lax.conv_general_dilated(
        x[None].astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(1, 1, 1), padding=((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]


def _conv_fwd(x, w, interpret):
    return _conv_fwd_impl(x, w, interpret), (x, w)


def _conv_bwd(interpret, res, g):
    """Backward = the oracle conv's own VJP (XLA conv-transpose formulas),
    so training through the fast forward gets exactly the gradients the
    XLA path would produce."""
    x, w = res
    _, vjp = jax.vjp(_oracle_conv, x, w)
    dx, dw = vjp(g.astype(jnp.float32))
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3d_3x3x3.defvjp(_conv_fwd, _conv_bwd)
