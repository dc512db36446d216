"""Paired-lane K-Net: the 3-D CNN with two adjacent pixels per channel row.

The measured bottleneck of the K-Net (reference ``models/basic.py:53-139``)
on v5e is LANE OCCUPANCY, not arithmetic: XLA's native conv3d at C=64 runs
the MXU half-empty (46.9 TF/s measured), while the identical conv at C=128
runs at 125.3 TF/s (tools/bench_knet_paired.py). Packing the two horizontally
adjacent pixels (2q, 2q+1) into one 128-lane channel row — a pure reshape in
NDHWC — and convolving with a structured-sparse (3,3,3,2C,2C) kernel doubles
the nominal FLOPs but runs 2.67x faster, a 1.33x net win per layer, with

- EXACT conv semantics: the packed kernel's extra positions hold zeros
  (output voxel 2q+h_out takes tap x = 2(q+kp-1)+h_in at kw-offset
  o = 2(kp-1)+h_in-h_out, zeroed unless |o| <= 1), so only summation order
  changes;
- XLA epilogue fusion intact (this is still one conv op per layer — the
  property every Pallas/decomposition attempt broke, PERF.md round-2/3
  negatives);
- full differentiability (unlike the Pallas chain, this path trains).

BatchNorm uses batch statistics on the packed layout with the two lane
halves folded per true channel — bit-for-bit the same moments as the
unpacked ``models/layers.BatchNorm`` modulo summation order.

Requires W even (true at every operating point: the DPV width is W_img/4
with W_img a multiple of 8 everywhere in the reference's configs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_kernel_pairs(w: jax.Array) -> jax.Array:
    """(3, 3, 3, Ci, Co) -> (3, 3, 3, 2Ci, 2Co) structured-sparse kernel.

    kp[kd, kh, kp_, h_in*Ci + ci, h_out*Co + co] = w[kd, kh, kw, ci, co]
    with kw = 2*(kp_ - 1) + h_in - h_out + 1 when 0 <= kw <= 2, else 0.
    Traceable (jnp), so layer kernels pack inside the jitted forward.
    """
    zero = jnp.zeros_like(w[:, :, 0])                     # (3, 3, Ci, Co)
    taps = []
    for kp_ in range(3):
        h_ins = []
        for h_in in range(2):
            h_outs = []
            for h_out in range(2):
                kw = 2 * (kp_ - 1) + h_in - h_out + 1
                h_outs.append(w[:, :, kw] if 0 <= kw <= 2 else zero)
            h_ins.append(jnp.concatenate(h_outs, axis=-1))   # (3,3,Ci,2Co)
        taps.append(jnp.concatenate(h_ins, axis=-2))          # (3,3,2Ci,2Co)
    return jnp.stack(taps, axis=2)                             # (3,3,3,...)


def _conv_packed(x, w, dtype):
    """One packed conv: x (D, H, Wp, 2Ci), w (3, 3, 3, Ci, Co)."""
    kp = pack_kernel_pairs(w).astype(dtype)
    return jax.lax.conv_general_dilated(
        x[None].astype(dtype), kp, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]


def _bn_packed(y, scale, bias, eps=1e-5):
    """BatchNorm (batch statistics, models/layers.BatchNorm semantics) on
    the packed layout: moments per TRUE channel, lane halves folded.

    Moments accumulate in f32 via reductions over a fused upcast — no f32
    copy of the volume is materialized (the first version did, and the
    extra HBM pass cost ~0.45 ms/layer, most of the packed-conv win)."""
    C = scale.shape[0]
    yf = y.astype(jnp.float32)            # fused into the reductions
    # one-pass moments: sum and sumsq are independent reductions over the
    # same input, so XLA multi-output-fuses them into a single volume read
    # (mean-then-centered-var would serialize two passes)
    m = jnp.mean(yf, axis=(0, 1, 2)).reshape(2, C).mean(axis=0)   # (C,)
    e2 = jnp.mean(jnp.square(yf), axis=(0, 1, 2)).reshape(2, C).mean(0)
    v = e2 - m * m
    a = scale * jax.lax.rsqrt(v + eps)
    b = bias - m * a
    return y * jnp.tile(a, 2).astype(y.dtype) + jnp.tile(b, 2).astype(y.dtype)


def knet_paired_apply(kv_params, vol: jax.Array,
                      dtype=jnp.bfloat16) -> jax.Array:
    """The K-Net forward (models/knet.KNet semantics) on the paired-lane
    layout, end to end: pack is a reshape, every conv runs at 2C lanes,
    BN/ReLU/skip stay packed, unpack is a reshape.

    kv_params: the ``kv_net`` param subtree; vol: (D, H, W, C_in), W even.
    Returns the (D, H, W) gain volume.
    """
    D, H, W, Ci = vol.shape
    assert W % 2 == 0, W
    x = vol.reshape(D, H, W // 2, 2 * Ci)

    def convbn(x, name, relu):
        p = kv_params[name]
        y = _conv_packed(x, p["conv"]["kernel"], dtype)
        y = _bn_packed(y, p["bn"]["scale"], p["bn"]["bias"])
        y = jnp.maximum(y, 0) if relu else y
        return y.astype(dtype)

    cost0 = convbn(x, "dres0_0", relu=True)
    cost0 = convbn(cost0, "dres0_1", relu=True)

    def res_pair(x, name):
        y = convbn(x, f"{name}_0", relu=True)
        return convbn(y, f"{name}_1", relu=False) + x

    h = cost0
    for blk in ("dres1", "dres2", "dres3", "dres4"):
        h = res_pair(h, blk)

    out = convbn(h, "classify_0", relu=True)
    gain = _conv_packed(out, kv_params["classify_1"]["kernel"], dtype)
    return gain.reshape(D, H, W).astype(jnp.float32)
