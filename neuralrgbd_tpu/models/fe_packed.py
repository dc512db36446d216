"""Packed-lane feature extractor: P adjacent pixels per channel row.

Same lane-occupancy argument as the paired K-Net (models/knet_paired.py),
applied to the PSM backbone (reference ``psm_submodule.py:76-167``): on v5e
the conv2d rate scales with channel width at constant FLOPs
(tools/bench_knet_paired.py methodology; measured slope-timed bf16):

    C=32  @128x192: 0.230 ms/conv ( 9.8 TF/s)   <- firstconv + layer1
    C=64  @ 64x96 : 0.068 ms/conv (31.4 TF/s)   <- layer2 (x31 convs)
    C=128 @ 64x96 : 0.093 ms/conv (97   TF/s)   <- layer3/4
    C=128 @128x48 : 0.122 ms  [= the C=32 conv packed x4]
    C=128 @ 64x48 : 0.047 ms  [= the C=64 conv packed x2]

So the 32-channel stage is packed x4 (128 lanes) and the 64-channel stage
x2; the 128-channel stage and the SPP/lastconv head stay native. Packing is
a pure reshape along W; each conv uses a structured-sparse packed kernel
(zeros everywhere the pixel offset between input and output sub-positions
exceeds the true receptive field), so the math is EXACT conv semantics —
only summation order changes — and every layer remains one XLA conv op
(epilogue fusion intact, differentiable).

``pack_kernel_general`` derives the packed kernel + pair-space stride and
asymmetric padding for any (P_in, P_out, stride, dilation): with
t = stride*h_out + dilation*(ki - KW//2) the tapped input pixel offset,
the input packed column is t // P_in and the sub-position t % P_in; the
mapping is a valid convolution whenever stride*P_out % P_in == 0.

Parity: tests/test_fe_packed.py (fp32 roundoff-tight vs FeatureExtractor,
gradients match, full-model routing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.models.layers import avg_pool2d, upsample_bilinear_ac


def pack_kernel_general(w: jax.Array, p_in: int, p_out: int,
                        stride: int = 1, dilation: int = 1):
    """(KH, KW, Ci, Co) -> packed kernel + pair-space (stride, (lo, hi)) pad.

    Returns (kp_kernel (KH, KP, p_in*Ci, p_out*Co), stride_p, (pad_lo, pad_hi)).
    Requires stride * p_out % p_in == 0.
    """
    KH, KW, Ci, Co = w.shape
    assert (stride * p_out) % p_in == 0, (stride, p_out, p_in)
    stride_p = (stride * p_out) // p_in
    half = KW // 2
    taps = []  # (o, h_in, h_out, ki)
    for ho in range(p_out):
        for ki in range(KW):
            t = stride * ho + dilation * (ki - half)
            taps.append((t // p_in, t % p_in, ho, ki))
    o_min = min(t[0] for t in taps)
    o_max = max(t[0] for t in taps)
    KP = o_max - o_min + 1
    kp = jnp.zeros((KH, KP, p_in * Ci, p_out * Co), w.dtype)
    for o, h_in, ho, ki in taps:
        kp = kp.at[:, o - o_min,
                   h_in * Ci:(h_in + 1) * Ci,
                   ho * Co:(ho + 1) * Co].set(w[:, ki])
    pad_lo = -o_min
    pad_hi = KP - stride_p - pad_lo
    assert pad_hi >= 0, (KP, stride_p, pad_lo)
    return kp, stride_p, (pad_lo, pad_hi)


def _conv_packed(x, w, p_in, p_out, dtype, stride=1, dilation=1, k=3):
    """x: (B, H, Wp, p_in*Ci) -> (B, H', Wp', p_out*Co). H axis is native
    (torch pad = dilation for k=3, 0 for k=1)."""
    kp, stride_p, pad_w = pack_kernel_general(w, p_in, p_out, stride, dilation)
    pad_h = dilation * (k // 2)
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kp.astype(dtype),
        window_strides=(stride, stride_p),
        padding=((pad_h, pad_h), pad_w),
        rhs_dilation=(dilation, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# BN variance formulation. One-pass (v = E[x^2] - m^2) lets XLA multi-
# output-fuse both moments into a single volume read, but its VJP is
# numerically unstable when |m| >> std (the e2 - m*m cancellation amplifies
# in the gradient). Centered (v = E[(x-m)^2], the flax BatchNorm
# formulation) reads the volume twice but differentiates cleanly. The
# inference fast path picks whichever measured faster on the chip;
# training-capable callers should use centered.
ONE_PASS_BN = True

# Carry f32 activations between packed layers (convs still compute in
# ``dtype``): reproduces the native ConvB/BatchNorm rounding points, so the
# bf16 deviation class is identical to the native bf16 FE. Measured free on
# the chip (3.11 vs 3.07 ms with bf16 carry) — the convs are rate-bound,
# not carry-bandwidth-bound. See PERF.md "Packed-lane FE".
CARRY_F32 = True


def _bn_packed(y, scale, bias, P, eps=1e-5):
    """BatchNorm (batch statistics) on the packed layout: moments per TRUE
    channel with the P lane groups folded, f32 accumulation fused into the
    reductions (no materialized f32 copy)."""
    C = scale.shape[0]
    yf = y.astype(jnp.float32)
    m = jnp.mean(yf, axis=(0, 1, 2)).reshape(P, C).mean(axis=0)
    if ONE_PASS_BN:
        e2 = jnp.mean(jnp.square(yf), axis=(0, 1, 2)).reshape(P, C).mean(0)
        v = e2 - m * m
    else:
        v = jnp.mean(jnp.square(yf - jnp.tile(m, P)),
                     axis=(0, 1, 2)).reshape(P, C).mean(axis=0)
    a = scale * jax.lax.rsqrt(v + eps)
    b = bias - m * a
    return y * jnp.tile(a, P).astype(y.dtype) + jnp.tile(b, P).astype(y.dtype)


def _bn_native(y, scale, bias, eps=1e-5):
    yf = y.astype(jnp.float32)
    m = jnp.mean(yf, axis=(0, 1, 2))
    if ONE_PASS_BN:
        v = jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - m * m
    else:
        v = jnp.mean(jnp.square(yf - m), axis=(0, 1, 2))
    a = scale * jax.lax.rsqrt(v + eps)
    b = bias - m * a
    return y * a.astype(y.dtype) + b.astype(y.dtype)


def _conv_native(x, w, dtype, stride=1, dilation=1, k=3):
    pad = dilation * (k // 2)
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype),
        window_strides=(stride, stride),
        padding=((pad, pad),) * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def fe_packed_apply(fe_params, frames: jax.Array, feature_dim: int = 64,
                    dtype=jnp.bfloat16):
    """FeatureExtractor forward (multi_scale=True semantics) on packed lanes.

    fe_params: the ``feature_extractor`` param subtree; frames (B, H, W, 3)
    with W % 8 == 0. Returns (layer1 (B, H/2, W/2, 32), feat (B, H/4, W/4,
    feature_dim)) — bit-class-identical to models/feature_extractor.py
    (exact at fp32 up to summation order).
    """
    B, H, W, _ = frames.shape
    assert W % 8 == 0, W
    p = fe_params

    carry = jnp.float32 if CARRY_F32 else dtype

    def convbn_p(x, name, p_in, p_out, stride=1, dilation=1, k=3, relu=True):
        q = p[name]
        y = _conv_packed(x, q["conv"]["kernel"], p_in, p_out, dtype,
                         stride=stride, dilation=dilation, k=k)
        y = _bn_packed(y.astype(carry), q["bn"]["scale"], q["bn"]["bias"],
                       p_out)
        y = jnp.maximum(y, 0) if relu else y
        return y.astype(carry)

    def block_p(x, name, P, p_in=None, stride=1):
        """BasicBlock on packed lanes (conv1 may change pack factor)."""
        p_in = P if p_in is None else p_in
        q = p[name]
        y = convbn_p(x, f"{name}/conv1", p_in, P, stride=stride)
        y = convbn_p(y, f"{name}/conv2", P, P, relu=False)
        if "down_conv" in q:
            kp, sp, pw = pack_kernel_general(
                q["down_conv"]["kernel"], p_in, P, stride, 1)
            sc = jax.lax.conv_general_dilated(
                x.astype(dtype), kp.astype(dtype),
                window_strides=(stride, sp), padding=((0, 0), pw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            sc = _bn_packed(sc.astype(carry), q["down_bn"]["scale"],
                            q["down_bn"]["bias"], P).astype(carry)
        else:
            sc = x
        return y + sc  # no ReLU after the add (psm_submodule.py:41-49)

    # nested-name access: p["layer1_0/conv1"] -> p["layer1_0"]["conv1"]
    class _View(dict):
        def __getitem__(self, k):
            node = fe_params
            for part in k.split("/"):
                node = node[part]
            return node

        def __contains__(self, k):
            node = fe_params
            for part in k.split("/"):
                if part not in node:
                    return False
                node = node[part]
            return True

    p = _View()

    # ---- packed region: firstconv + layer1 at P=4, layer2 at P=2 ----
    x = frames.reshape(B, H, W // 4, 12)                     # pack RGB x4
    y = convbn_p(x, "first0", 4, 4, stride=2)
    y = convbn_p(y, "first1", 4, 4)
    y = convbn_p(y, "first2", 4, 4)

    l1 = y
    for i in range(3):
        l1 = block_p(l1, f"layer1_{i}", 4)

    r = block_p(l1, "layer2_0", 2, p_in=4, stride=2)         # 4 -> 2 lanes
    for i in range(1, 16):
        r = block_p(r, f"layer2_{i}", 2)

    # unpack (pure reshapes)
    h2, w2 = H // 2, W // 2
    layer1 = l1.reshape(B, h2, w2 // 4, 4, 32).reshape(B, h2, w2, 32)
    raw = r.reshape(B, H // 4, W // 8, 2, 64).reshape(B, H // 4, W // 4, 64)

    # ---- native region: layer3/4 (C=128 fills the lanes), SPP, lastconv ----
    def convbn_n(x, q, stride=1, dilation=1, k=3, relu=True):
        y = _conv_native(x, q["conv"]["kernel"], dtype, stride=stride,
                         dilation=dilation, k=k)
        y = _bn_native(y.astype(carry), q["bn"]["scale"], q["bn"]["bias"])
        y = jnp.maximum(y, 0) if relu else y
        return y.astype(carry)

    def block_n(x, name, stride=1, dilation=1):
        q = p[name]
        y = convbn_n(x, q["conv1"], stride=stride, dilation=dilation)
        y = convbn_n(y, q["conv2"], dilation=dilation, relu=False)
        if "down_conv" in q:
            sc = jax.lax.conv_general_dilated(
                x.astype(dtype), q["down_conv"]["kernel"].astype(dtype),
                window_strides=(stride, stride), padding=((0, 0),) * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            sc = _bn_native(sc.astype(carry), q["down_bn"]["scale"],
                            q["down_bn"]["bias"]).astype(carry)
        else:
            sc = x
        return y + sc

    l3 = raw
    for i in range(3):
        l3 = block_n(l3, f"layer3_{i}")
    skip = l3
    for i in range(3):
        skip = block_n(skip, f"layer4_{i}", dilation=2)

    h4, w4 = skip.shape[1], skip.shape[2]
    branches = []
    for i, pool in enumerate((64, 32, 16, 8)):
        pool = min(pool, h4, w4)
        b = avg_pool2d(skip, pool)
        b = convbn_n(b, p[f"branch{i}"], k=1)
        b = upsample_bilinear_ac(b, (h4, w4))
        branches.append(b.astype(carry))

    feat = jnp.concatenate(
        [raw, skip, branches[3], branches[2], branches[1], branches[0]],
        axis=-1)
    feat = convbn_n(feat, p["last0"])
    feat = jax.lax.conv_general_dilated(
        feat.astype(dtype), p["last1"]["kernel"].astype(dtype),
        window_strides=(1, 1), padding=((0, 0),) * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    return layer1.astype(jnp.float32), feat.astype(jnp.float32)
