"""Pair-packed async-DMA implicit-GEMM conv3d chain for the K-Net.

The measured path to beating XLA's native conv3d (46 TF/s standalone,
~50 in-context) on this Mosaic:

- every sub-tile DMA slice is rejected (tools/probe_dma.py: sublane offsets
  must be multiples of 8, lane slices must be full 128-wide), so the naive
  9-tap im2col slab is inexpressible;
- PAIRING two adjacent output pixels makes everything tile-aligned: two
  C=64 voxels = one full 128-lane row, and an even W-pad (WP=112) keeps all
  DMA sublane offsets multiples of 8. The tap union of a pair spans 4
  voxels = 2 paired rows per kh, giving a slab (P2, 768) per depth slice
  (K = 3 kh x 2 groups x 128) fed by 6 full-width DMAs;
- the resulting dot stream — 3 x (3584, 768) @ (768, 128) bf16 per slice,
  [even|odd]-packed weights — measured **190 TFLOP/s** (MXU peak) from
  VMEM (tools/bench_pair_dots.py), vs the 86 TF/s ceiling round 2 assumed;
- the one remaining misalignment (tap group g=1 starts one paired row
  later) is solved WITHOUT extra HBM traffic: g=1 is ``pltpu.roll(g0, -1)``
  at lhs-assembly time — the circular wrap corrupts only the slice's last
  output pair, which is two x-pad columns the valid mask zeroes anyway;
- layers CHAIN: the kernel emits a dense paired layout, and one fused XLA
  pass per layer applies BatchNorm (batch statistics — the kernel already
  reduced per-channel sum/sumsq on the fly) + ReLU + residual skip fused
  into the recomposition that emits the next layer's xp2.

K-Net structure reference: ``/root/reference/code/models/basic.py:53-139``
(KV_NET_BASIC: conv3d k=3 s=1 p=1 + BN with track_running_stats=False);
oracle: ``models/knet.KNet`` (Flax), itself oracle-parity-tested against
the reference forward.

Inference fast path only (not differentiable; training keeps the XLA
convs, like the fused sweep).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 64                     # channels per voxel (K-Net feature width)
LN = 2 * C                 # lanes per paired row

# test hook: run the pallas kernel in interpreter mode (CPU parity tests)
INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _geom(H: int, W: int):
    WP = _round_up(W + 2, 16)       # even pad width; /2 stays mult of 8
    P2 = H * WP // 2                # dense paired rows per slice
    RU2 = _round_up((H + 2) * WP // 2 + 8, 8)
    return WP, P2, RU2


# ---------------------------------------------------------------------------
# layout packing (XLA, host-level helpers)
# ---------------------------------------------------------------------------

def pack_dense(x: jax.Array) -> jax.Array:
    """(D, H, W, C) -> dense paired layout (D, P2, 2C) bf16.

    Dense row q holds voxels (2q, 2q+1) of the W-padded row-major slice
    (x in [0, WP), pad columns zero)."""
    D, H, W, c = x.shape
    assert c == C, c
    WP, P2, _ = _geom(H, W)
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, WP - W),
                                          (0, 0)))
    return xp.reshape(D, P2, LN)


def unpack_dense(z: jax.Array, H: int, W: int) -> jax.Array:
    """Inverse of ``pack_dense``: (D, P2, 2C) -> (D, H, W, C)."""
    D = z.shape[0]
    WP, P2, _ = _geom(H, W)
    return z.reshape(D, H, WP, C)[:, :, :W, :]


def dense_to_xp2(z: jax.Array, H: int, W: int) -> jax.Array:
    """Dense paired (D, P2, 2C) -> the kernel's padded source layout.

    xp2[p, m] = padded voxels (2m, 2m+1) of padded slice p (depth pad 1,
    y pad 1, x origin shift 1 => dense voxel r sits at padded voxel
    r + WP + 1). The odd voxel shift means the padded pair m recombines
    the ODD half of dense pair m - (WP/2 + 1) with the EVEN half of dense
    pair m - WP/2 — a lane recomposition XLA fuses into this pass.
    """
    WP, P2, RU2 = _geom(H, W)
    s = WP // 2
    # odd halves shifted by s+1 pairs, even halves by s pairs
    odd = jnp.pad(z[:, :, C:], ((0, 0), (s + 1, RU2 - P2 - s - 1), (0, 0)))
    even = jnp.pad(z[:, :, :C], ((0, 0), (s, RU2 - P2 - s), (0, 0)))
    core = jnp.concatenate([odd, even], axis=-1)          # (D, RU2, 2C)
    return jnp.pad(core, ((1, 1), (0, 0), (0, 0)))        # depth pad


def pack_weights(w: jax.Array) -> jax.Array:
    """(3, 3, 3, C, C) [kd kh kw in out] -> (3, 12C, 2C) pair-packed rhs (K = 6 groups x 2C lanes = 768).

    rhs[kd][(kh*2+g)*2C + h2*C + ci, h_out*C + n] = w[kd, kh, kw, ci, n]
    with kw = 2g + h2 - h_out when 0 <= kw <= 2 (else zero). Traceable
    (jnp) so layer weights can be packed inside the jitted chain."""
    w = w.astype(jnp.float32)
    zero = jnp.zeros((3, C, C), jnp.float32)
    blocks = []
    for kh in range(3):
        for g in range(2):
            for h2 in range(2):
                cols = []
                for h_out in range(2):
                    kw = 2 * g + h2 - h_out
                    cols.append(w[:, kh, kw] if 0 <= kw <= 2 else zero)
                blocks.append(jnp.concatenate(cols, axis=-1))   # (3, C, 2C)
    return jnp.concatenate(blocks, axis=1).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _make_kernel(D, H, W, WP, P2, with_stats):
    S = WP // 2
    NG = 3                          # DMAs per slab: one per kh

    def kernel(xp2_ref, w_ref, out_ref, stats_ref,
               slab, acc, obuf, in_sems, out_sems):
        # The g=1 tap group of each kh is the g=0 group shifted ONE paired
        # row — a sub-tile DMA offset this Mosaic rejects. Instead only the
        # g=0 blocks are DMA'd and g=1 is produced in-register as
        # roll(g0, -1) when the lhs is assembled: the circular wrap feeds
        # slab row P2-1 with row 0's data, but that output pair is the
        # slice's last two x-PAD columns, which the valid mask zeroes.
        def slab_dma(e, slot, kh):
            return pltpu.make_async_copy(
                xp2_ref.at[e, pl.ds(kh * S, P2), :],
                slab.at[slot, :, pl.ds(kh * LN, LN)],
                in_sems.at[slot, kh],
            )

        def start_slab(e):
            slot = jax.lax.rem(e, 4)
            for j in range(NG):
                slab_dma(e, slot, j).start()

        def wait_slab(e):
            slot = jax.lax.rem(e, 4)
            for j in range(NG):
                slab_dma(e, slot, j).wait()

        def assemble(slot):
            parts = []
            for kh in range(3):
                a = slab[slot, :, kh * LN:(kh + 1) * LN]
                parts.append(a)
                # b[q] = a[q+1]: a left-roll (positive-shift form). Mosaic
                # only rotates 32-bit data, so round-trip through f32 —
                # the MXU computes at bf16 precision either way.
                b = pltpu.roll(a.astype(jnp.float32), shift=P2 - 1, axis=0)
                parts.append(b.astype(jnp.bfloat16))
            return jnp.concatenate(parts, axis=-1)        # (P2, 6*LN)

        def out_dma(d, oslot):
            return pltpu.make_async_copy(
                obuf.at[oslot], out_ref.at[d], out_sems.at[oslot])

        # x-pad mask: dense voxel (2q + h) has x = (2q + h) % WP; x >= W
        # is padding and must emit zeros (the chained layouts rely on it)
        q2 = 2 * jax.lax.broadcasted_iota(jnp.int32, (P2, LN), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (P2, LN), 1)
        xpos = jax.lax.rem(q2 + (lane >= C).astype(jnp.int32), WP)
        valid = (xpos < W).astype(jnp.float32)

        start_slab(0)
        start_slab(1)

        def body(e, _):
            slot = jax.lax.rem(e, 4)

            @pl.when(e + 2 < D + 2)
            def _():
                start_slab(e + 2)

            wait_slab(e)
            s = assemble(slot)

            @pl.when(e < D)
            def _():
                acc[jax.lax.rem(e, 3)] = jax.lax.dot_general(
                    s, w_ref[0],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            @pl.when(e >= 1)
            def _():
                a1 = jax.lax.rem(e - 1 + 3, 3)
                acc[a1] += jax.lax.dot_general(
                    s, w_ref[1],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            @pl.when(e >= 2)
            def _():
                d = e - 2
                a2 = jax.lax.rem(d, 3)
                v = (acc[a2] + jax.lax.dot_general(
                    s, w_ref[2],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)) * valid
                if with_stats:
                    ssum = jnp.sum(v, axis=0, keepdims=True)
                    ssq = jnp.sum(v * v, axis=0, keepdims=True)

                    @pl.when(d == 0)
                    def _():
                        stats_ref[0:1] = ssum
                        stats_ref[1:2] = ssq

                    @pl.when(d > 0)
                    def _():
                        stats_ref[0:1] += ssum
                        stats_ref[1:2] += ssq
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


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "interpret", "with_stats"))
def conv_pair_layer(xp2, rhs, H: int, W: int,
                    interpret: bool = False, with_stats: bool = True):
    """One 3x3x3 conv layer on the pair-packed padded layout.

    xp2: (D+2, RU2, 2C) bf16 (``dense_to_xp2``); rhs: (3, 12C, 2C)
    (``pack_weights``). Returns (dense out (D, P2, 2C) bf16, stats (8, 2C)
    f32 — [0]=per-lane sum, [1]=per-lane sumsq over valid voxels; fold the
    two 64-lane halves for per-channel BN moments).
    """
    Dp2, RU2, ln = xp2.shape
    D = Dp2 - 2
    assert ln == LN
    WP, P2, RU2g = _geom(H, W)
    assert RU2g == RU2, (RU2g, RU2)

    kernel = _make_kernel(D, H, W, WP, P2, with_stats)
    out, stats = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, P2, LN), jnp.bfloat16),
            jax.ShapeDtypeStruct((8, LN), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, P2, 3 * LN), jnp.bfloat16),    # slab ring
            pltpu.VMEM((3, P2, LN), jnp.float32),         # accumulators
            pltpu.VMEM((2, P2, LN), jnp.bfloat16),        # out staging
            pltpu.SemaphoreType.DMA((4, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            has_side_effects=True,
        ),
        interpret=interpret,
    )(xp2, rhs)
    return out, stats


# ---------------------------------------------------------------------------
# inter-layer glue + the full K-Net chain
# ---------------------------------------------------------------------------

def bn_apply(z, stats, scale, bias, n_valid: int, relu: bool,
             skip: Optional[jax.Array], H: int, W: int):
    """Fused BN (batch statistics from the kernel's on-the-fly reduction,
    matching models/layers.BatchNorm exactly) + optional ReLU + optional
    residual skip, re-masking the x-pad columns to zero."""
    ssum = stats[0, :C] + stats[0, C:]
    ssq = stats[1, :C] + stats[1, C:]
    mean = ssum / n_valid
    var = ssq / n_valid - mean * mean
    a = (scale * jax.lax.rsqrt(var + 1e-5)).astype(jnp.float32)
    b = bias - mean * a
    aa = jnp.concatenate([a, a]).astype(z.dtype)
    bb = jnp.concatenate([b, b]).astype(z.dtype)
    y = z * aa + bb
    if relu:
        y = jnp.maximum(y, 0)
    if skip is not None:
        y = y + skip
    WP, P2, _ = _geom(H, W)
    q2 = 2 * jax.lax.broadcasted_iota(jnp.int32, (P2, LN), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (P2, LN), 1)
    xpos = jax.lax.rem(q2 + (lane >= C).astype(jnp.int32), WP)
    return jnp.where((xpos < W)[None], y, 0).astype(jnp.bfloat16)


def bn_recompose(z, stats, scale, bias, n_valid: int, relu: bool,
                 skip: Optional[jax.Array], H: int, W: int):
    """``bn_apply`` fused with ``dense_to_xp2`` in one XLA region: returns
    (xp2 for the next conv, post-BN dense for skip chains/unpacking). The
    elementwise work rides the recomposition copies, so the pass's HBM
    traffic is one read of z plus the two writes."""
    y = bn_apply(z, stats, scale, bias, n_valid, relu, skip, H, W)
    return dense_to_xp2(y, H, W), y


def knet_fast_apply(kv_params, vol: jax.Array,
                    interpret: Optional[bool] = None) -> jax.Array:
    """The K-Net forward (models/knet.KNet semantics, basic.py:53-139) with
    the ten homogeneous 64->64 convs on the pair-packed Pallas chain.

    kv_params: the ``kv_net`` param subtree ({layer: {conv: {kernel}, bn:
    {scale, bias}}}); vol: (D, H, W, C_in). Returns (D, H, W) gain.
    First conv (C_in->64) and classify_1 (64->1) stay on XLA (their channel
    shapes don't fit the 128-lane pairing; together <6%% of the FLOPs).
    """
    if interpret is None:
        interpret = INTERPRET
    D, H, W, _ = vol.shape
    n_valid = D * H * W

    def conv_xla(x, name):
        k = kv_params[name]["conv"]["kernel"].astype(jnp.bfloat16)
        return jax.lax.conv_general_dilated(
            x[None].astype(jnp.bfloat16), k, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)[0]

    def bn_xla(y, name, relu):
        p = kv_params[name]["bn"]
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(y - mean), axis=(0, 1, 2))
        out = (y - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]
        return jnp.maximum(out, 0) if relu else out

    # dres0_0: C_in -> 64 on XLA, then enter the paired chain
    y0 = bn_xla(conv_xla(vol, "dres0_0"), "dres0_0", relu=True)
    xp = dense_to_xp2(pack_dense(y0), H, W)

    def fast(name, xp_in, relu, skip=None):
        rhs = pack_weights(kv_params[name]["conv"]["kernel"])
        zc, stats = conv_pair_layer(xp_in, rhs, H, W, interpret=interpret)
        p = kv_params[name]["bn"]
        return bn_recompose(zc, stats, p["scale"], p["bias"], n_valid,
                            relu, skip, H, W)

    xp, z = fast("dres0_1", xp, relu=True)        # cost0
    for blk in ("dres1", "dres2", "dres3", "dres4"):
        xp_y, _ = fast(f"{blk}_0", xp, relu=True)
        xp, z = fast(f"{blk}_1", xp_y, relu=False, skip=z)
    _, z = fast("classify_0", xp, relu=True)

    out = unpack_dense(z, H, W).astype(jnp.bfloat16)
    k1 = kv_params["classify_1"]["kernel"].astype(jnp.bfloat16)
    gain = jax.lax.conv_general_dilated(
        out[None], k1, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)[0]
    return gain[..., 0]
