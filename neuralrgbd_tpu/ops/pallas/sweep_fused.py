"""Fused Pallas plane-sweep kernel (cost volume + kept K-Net channels).

The XLA formulation of ``ops.sweep.sweep_cost_volume`` is HBM-bound: per
(view, depth, pixel) it gathers 4 bilinear taps of C~67-float feature rows
(~1.7 GB of tap traffic per frame) before reducing over channels —
~23 ms/frame on v5e, the single largest step component. This kernel keeps
one source view's features VMEM-resident and reduces channels on-chip.

Key idea: bilinear warping of a whole output row is a *matmul with a sparse
selection matrix*. For output row (view v, depth d, y_out), the four taps of
every output pixel x_out factor separably:

    warp[x_out, c] = sum_b Ay[b, x_out] * (sum_xs AxT[xs, x_out] * src[yb+b, xs, c])

where AxT (W x W) holds the two x-tap weights ((1-wx), wx) one-hot'd at the
clamped tap columns, and Ay (BY x W) holds the two y-tap weights over a
narrow *band* of BY source rows. The inner sum is a (C, W) @ (W, W) MXU
matmul per band row; the outer sum is a VPU broadcast-accumulate. The warped
row then yields the cost reduction sum_c(warp - ref)^2 AND the warped
last-k channels (the K-Net input RGB) in the same pass — no HBM tap traffic
at all.

Wide operating points (W > 128, e.g. KITTI without --crop_w at feature
width 192) are handled by an x-tile grid axis: each grid cell warps one
128-lane output tile against the full padded source width.

Semantics match ``sweep_cost_volume`` (zero padding: out-of-frustum taps are
weight-masked so fully-out pixels contribute the bare ||ref||^2 term;
align_corners pixel mapping via the shared ``_sweep_pixel_coords``) with two
caveats:

- the y taps of one output row must fit a BY-row source band (row "tilt"
  from inter-frame rotation < BY-1 px across the image width; ~4 deg of roll
  at the 96-px operating point for BY=8 — same argument, and the same kind of
  documented bound, as ``ops/pallas/resample.py``). ``band_spread`` below
  measures the actual requirement for a given pose set.
- the per-row matmuls run at the TPU's default matmul precision (fp32
  operands computed at bf16-class precision, like every conv in the model);
  pass ``precision=jax.lax.Precision.HIGHEST`` for fp32-exact taps at ~3x
  the matmul cost.

NOT differentiable: the inference fast path only (training keeps the XLA
sweep, which autodiffs through the gathers).

Reference parity target: ``est_swp_volume_v4`` + ``warp_img_feats_v3``
(``/root/reference/code/warping/homography.py:293-331,234-280``) via the
XLA oracle ``ops.sweep.sweep_cost_volume(keep_last_channels=k)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuralrgbd_tpu.ops.camera import Camera
from neuralrgbd_tpu.ops.sweep import _sweep_pixel_coords

LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(D, H, W, WS, CP, BY, k, kept_base, l1, precision,
                 tap_dtype, band_matmul=False, m_fold=False):
    """Grid cell = (view, y_out, x_tile). Loops over the D hypotheses.

    One output row TILE is LANES wide; the source band spans the FULL
    padded source width WS (x-taps land anywhere), so wide operating
    points (KITTI no-crop, W=192) just add x-tile grid steps.

    px/py_ref: (1, 1, D, LANES)  source pixel coords for this output tile
    src_ref:   (1, H, CP, WS)    one view's features, channels on sublanes
    ref_ref:   (1, CP, LANES)    reference features for this output tile
    cost_ref:  (1, 1, D, LANES)  per-view cost rows (summed over views)
    kept_ref:  (1, 1, k, D, LANES) warped last-k channels (when k > 0)
    """
    def kernel(px_ref, py_ref, src_ref, ref_ref, cost_ref, *maybe_kept):
        kept_ref = maybe_kept[0] if k else None
        ref_row = ref_ref[0]

        def depth_body(d, _):
            px = px_ref[0, 0, d, :]
            py = py_ref[0, 0, d, :]

            x0f = jnp.floor(px)
            y0f = jnp.floor(py)
            wx = px - x0f
            wy = py - y0f
            x0 = x0f.astype(jnp.int32)
            y0 = y0f.astype(jnp.int32)

            inbx0 = ((x0 >= 0) & (x0 <= W - 1)).astype(jnp.float32)
            inbx1 = ((x0 + 1 >= 0) & (x0 + 1 <= W - 1)).astype(jnp.float32)
            inby0 = ((y0 >= 0) & (y0 <= H - 1)).astype(jnp.float32)
            inby1 = ((y0 + 1 >= 0) & (y0 + 1 <= H - 1)).astype(jnp.float32)

            x0c = jnp.clip(x0, 0, W - 1)
            x1c = jnp.clip(x0 + 1, 0, W - 1)
            y0c = jnp.clip(y0, 0, H - 1)
            y1c = jnp.clip(y0 + 1, 0, H - 1)

            valid_row = (y0 + 1 >= 0) & (y0 <= H - 1)
            ybase = jnp.min(jnp.where(valid_row, y0c, H - 1))
            ybase = jnp.clip(ybase, 0, max(H - BY, 0))

            biota = jax.lax.broadcasted_iota(jnp.int32, (BY, LANES), 0) \
                + ybase
            ay = (
                jnp.where(biota == y0c[None, :], (1.0 - wy) * inby0, 0.0)
                + jnp.where(biota == y1c[None, :], wy * inby1, 0.0)
            )

            siota = jax.lax.broadcasted_iota(jnp.int32, (WS, LANES), 0)
            axt = (
                jnp.where(siota == x0c[None, :],
                          ((1.0 - wx) * inbx0)[None, :], 0.0)
                + jnp.where(siota == x1c[None, :],
                            (wx * inbx1)[None, :], 0.0)
            ).astype(tap_dtype)

            band = src_ref[0, pl.ds(ybase, BY)]            # (BY, CP, WS)
            if band_matmul:
                # one K=BY*WS contraction instead of BY issue-bound small
                # dots: the y-weights fold into the selection matrix as an
                # outer product (ab[(b,xs), x] = ay[b,x]*axt[xs,x]); the
                # (BY, WS, LANES) -> (BY*WS, LANES) reshape merges leading
                # dims above the tiled (sublane, lane) pair, a layout
                # no-op. lhs = the band rows side by side on lanes.
                ab = (ay[:, None, :] * axt.astype(jnp.float32)[None]) \
                    .astype(tap_dtype).reshape(BY * WS, LANES)
                lhs = jnp.concatenate(
                    [band[b] for b in range(BY)], axis=-1)  # (CP, BY*WS)
                warp = jax.lax.dot_general(
                    lhs, ab,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
            elif m_fold:
                # ONE dot with the band folded into M: lhs (BY*CP, WS), so
                # the MXU M dimension runs full instead of 72/128-occupied
                # BY times. Same FLOPs, the y-weighted reduction moves after
                # the dot. Chip A/B NEGATIVE (PERF.md round 3): 9.83 vs
                # 6.88 ms at band=8 — Mosaic materializes the
                # (BY, CP, WS) -> (BY*CP, WS) reshape as a relayout copy,
                # and the BY small dots were already MXU-pipelined. Kept as
                # the measured experiment; default off.
                p = jax.lax.dot_general(
                    band.reshape(BY * CP, WS), axt,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                ).reshape(BY, CP, LANES)
                warp = jnp.sum(ay[:, None, :] * p, axis=0)
            else:
                warp = jnp.zeros((CP, LANES), jnp.float32)
                for b in range(BY):
                    p_b = jax.lax.dot_general(
                        band[b], axt,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                    warp = warp + ay[b][None, :] * p_b

            diff = warp - ref_row
            if l1:
                cost = jnp.sum(jnp.abs(diff), axis=0)
            else:
                cost = jnp.sum(diff * diff, axis=0)
            cost_ref[0, 0, d, :] = cost
            if k:
                kept_ref[0, 0, :, d, :] = warp[kept_base:kept_base + k]
            return 0

        jax.lax.fori_loop(0, D, depth_body, 0)

    return kernel


def sweep_cost_volume_fused(
    ref_feat: jax.Array,    # (H, W, C)
    src_feats: jax.Array,   # (V, H, W, C)
    Rs: jax.Array,          # (V, 3, 3)
    ts: jax.Array,          # (V, 3)
    cam: Camera,
    d_candi: jax.Array,     # (D,)
    sigma: float,
    feat_dist: str = "L2",
    keep_last_channels: int = 0,
    band: int = 8,
    precision=None,
    tap_dtype=None,
    band_matmul: bool = False,
    m_fold: bool = False,
    interpret: bool = False,
):
    """Drop-in fast path for ``ops.sweep.sweep_cost_volume`` (same returns).

    ``tap_dtype=jnp.bfloat16`` stores the source features and the tap
    selection matrix in bf16 (halved VMEM traffic, single-pass MXU dots,
    f32 accumulation — the same numeric class as the model's bf16 convs);
    default keeps fp32 operands.

    ``band_matmul``/``m_fold`` select alternative dot formulations (fold
    the y-tap band into K resp. M of one big contraction instead of the
    BY-loop of small dots); both measured SLOWER on-chip (PERF.md round 3)
    and are off by default. They are mutually exclusive."""
    if band_matmul and m_fold:
        raise ValueError(
            "band_matmul and m_fold are mutually exclusive dot "
            "formulations; pass at most one.")
    V, H, W, C = src_feats.shape
    D = int(d_candi.shape[0])
    k = keep_last_channels
    if feat_dist not in ("L2", "L1"):
        raise ValueError(f"undefined feature distance: {feat_dist}")
    BY = min(band, H)
    WS = _round_up(W, LANES)     # full source width (x-taps land anywhere)
    XT = WS // LANES             # output x tiles (wide-W support)
    WO = XT * LANES
    CP = _round_up(C, 8)

    # ---- coordinates (shared formula with the XLA path) ----
    def view_coords(R, t):
        c = _sweep_pixel_coords(cam, R, t, d_candi, H, W)   # (D, HW, 2)
        return c.reshape(D, H, W, 2)

    coords = jax.vmap(view_coords)(Rs, ts)                  # (V, D, H, W, 2)
    # keep int32 tap math sane for far-out-of-frustum points (weights are
    # masked to zero there anyway); edge-pad the lane axis so pad lanes
    # can't perturb the per-row band minimum. Row-major blocks want the
    # output row axis ahead of depth: (V, H, D, WO).
    px = jnp.clip(coords[..., 0], -4.0, W + 3.0).transpose(0, 2, 1, 3)
    py = jnp.clip(coords[..., 1], -4.0, H + 3.0).transpose(0, 2, 1, 3)
    px = jnp.pad(px, ((0, 0),) * 3 + ((0, WO - W),), mode="edge")
    py = jnp.pad(py, ((0, 0),) * 3 + ((0, WO - W),), mode="edge")

    # channels-on-sublanes layout: (V, H, CP, WS) / (H, CP, WO)
    tap = tap_dtype or jnp.float32
    srcT = jnp.pad(
        src_feats.astype(tap).transpose(0, 1, 3, 2),
        ((0, 0), (0, 0), (0, CP - C), (0, WS - W)),
    )
    refT = jnp.pad(
        ref_feat.astype(jnp.float32).transpose(0, 2, 1),
        ((0, 0), (0, CP - C), (0, WO - W)),
    )

    kernel = _make_kernel(D, H, W, WS, CP, BY, k, kept_base=C - k,
                          l1=(feat_dist == "L1"), precision=precision,
                          tap_dtype=tap, band_matmul=band_matmul,
                          m_fold=m_fold)

    out_shape = [jax.ShapeDtypeStruct((V, H, D, WO), jnp.float32)]
    out_specs = [pl.BlockSpec((1, 1, D, LANES),
                              lambda v, y, xt: (v, y, 0, xt),
                              memory_space=pltpu.VMEM)]
    if k:
        out_shape.append(jax.ShapeDtypeStruct((V, H, k, D, WO), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, k, D, LANES),
                                      lambda v, y, xt: (v, y, 0, 0, xt),
                                      memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        kernel,
        grid=(V, H, XT),
        in_specs=[
            pl.BlockSpec((1, 1, D, LANES), lambda v, y, xt: (v, y, 0, xt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, LANES), lambda v, y, xt: (v, y, 0, xt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, CP, WS), lambda v, y, xt: (v, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CP, LANES), lambda v, y, xt: (y, 0, xt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if k else out_specs[0],
        out_shape=out_shape if k else out_shape[0],
        interpret=interpret,
    )(px, py, srcT, refT)

    cost_v = outs[0] if k else outs                         # (V, H, D, WO)
    cost = (jnp.sum(cost_v[..., :W], axis=0) / sigma).transpose(1, 0, 2)
    if not k:
        return cost
    kept = outs[1][..., :W].transpose(0, 3, 1, 4, 2)        # (V, D, H, W, k)
    return cost, kept


def _per_view_spread(R, t, cam: Camera, d_candi, H: int, W: int):
    D = d_candi.shape[0]
    c = _sweep_pixel_coords(cam, R, t, d_candi, H, W).reshape(D, H, W, 2)
    py = jnp.clip(c[..., 1], -4.0, H + 3.0)
    y0 = jnp.floor(py).astype(jnp.int32)
    valid = (y0 + 1 >= 0) & (y0 <= H - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    lo = jnp.min(jnp.where(valid, y0c, H - 1), axis=-1)   # (D, H)
    hi = jnp.max(jnp.where(valid, jnp.clip(y0 + 1, 0, H - 1), 0), axis=-1)
    any_valid = jnp.any(valid, axis=-1)
    return jnp.max(jnp.where(any_valid, hi - lo, 0))


def band_spread(Rs, ts, cam: Camera, d_candi, height: int, width: int):
    """Max per-row y-tap spread (in source rows) the kernel must cover.

    The fused kernel is exact iff this is <= band - 1. Returns a scalar
    (max over views, depths, rows of in-bounds y0 spread). XLA, test/debug
    helper — not called on the hot path.
    """
    return jnp.max(jax.vmap(
        lambda R, t: _per_view_spread(R, t, cam, d_candi, height, width)
    )(Rs, ts))


def band_spread_seq(Rs, ts, cam: Camera, d_candi, height: int, width: int):
    """``band_spread`` over MANY (window, view) pose pairs sequentially.

    ``Rs (N, 3, 3)``, ``ts (N, 3)`` with N = all of a trajectory's
    window-view pairs. ``lax.map`` keeps the peak footprint at one view's
    coordinate volume (D*H*W) regardless of N, so a whole trajectory's
    precondition check is ONE dispatch + one scalar fetch (the up-front
    gate ADVICE.md round 2 asked for)."""
    return jnp.max(jax.lax.map(
        lambda Rt: _per_view_spread(Rt[0], Rt[1], cam, d_candi,
                                    height, width),
        (Rs, ts)))
