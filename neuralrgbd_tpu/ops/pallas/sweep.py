"""EXPERIMENTAL Pallas plane-sweep kernel: cost volume on the MXU, no gathers.

STATUS (measured on v5e at the production operating point, V=4 D=64 C=67):
the XLA gather formulation (ops/sweep.py) runs at 22 ms; this kernel ran at
36 ms row-at-a-time and 62 ms with 8-row chunked batched matmuls (the
chunked variant also shows on-device numerical divergence vs interpret mode,
unresolved). The small (536x128x128) matmuls don't reach enough MXU
utilization to beat the gathers, so THE XLA PATH REMAINS THE DEFAULT and
this kernel is kept as a documented experiment for future bf16/retiling
work. Interpret-mode parity tests pass.

The formulation removes gathers entirely by exploiting the sweep's
structure:

- within one output row (v, d, y'), the *x* resampling is a linear map of
  the W source columns: a (W x W) two-tap interpolation matrix X built from
  iota comparisons. Applying it to the (BY x C, W) source band is ONE MXU
  matmul per row — the bilinear gather becomes dense linear algebra;
- the *y* taps vary along the row only through rotation tilt, so a BY-row
  band around min(y0) covers them; tap selection is a masked VPU reduction;
- the per-view squared-distance accumulation happens in VMEM, so the cost
  volume block is written once per depth slice.

Semantics: est_swp_volume_v4 (homography.py:293-331) with align_corners
pixel mapping and zeros padding, including ``keep_last_channels`` (the
warped intensity channels that feed the K-Net input volume). Exact when the
per-row y-band fits BY=8 source rows (rotation tilt < ~7 px per 96-px row —
far beyond adjacent-video-frame motion); the XLA path is the oracle.

Inference-only: gradients are stopped (training uses the XLA path — a
custom VJP for the banded-matmul formulation is future work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuralrgbd_tpu.ops.camera import Camera, unit_rays

BY = 16         # source-row band height (covers a ROWS-chunk + tilt)
ROWS = 8        # output rows per kernel loop iteration
KEEP_PAD = 8    # sublane padding of the kept-channel output


def _sweep_kernel(d_ref, t1_ref, t2_ref, src_ref, ref_ref,
                  cost_ref, kept_ref, *, H, W, WP, C, sigma, keep, rows):
    """Processes ``rows`` output rows per loop iteration: one batched
    dot_general over the row chunk keeps the MXU busy and amortizes the
    per-iteration scalar/slice overhead that dominated a row-at-a-time
    formulation (36 ms -> see module docstring)."""
    v = pl.program_id(1)
    d = d_ref[0, 0, 0]
    t1x = t1_ref[0, 0, 0, 0]
    t1y = t1_ref[0, 1, 0, 0]
    t1z = t1_ref[0, 2, 0, 0]
    n_chunks = H // rows

    def chunk_body(ci, _):
        r0 = ci * rows
        # coords for this chunk of output rows
        t2c = t2_ref[0, :, pl.ds(r0, rows), :]         # (3, rows, WP)
        pz = t1z + t2c[2] * d + 1e-10                  # (rows, WP)
        px = (t1x + t2c[0] * d) / pz
        py = (t1y + t2c[1] * d) / pz
        x0r = jnp.floor(px).astype(jnp.int32)
        y0r = jnp.floor(py).astype(jnp.int32)
        wxr = px - x0r.astype(jnp.float32)
        wyr = py - y0r.astype(jnp.float32)
        in0 = ((x0r >= 0) & (x0r <= W - 1)).astype(jnp.float32)
        in1 = ((x0r + 1 >= 0) & (x0r + 1 <= W - 1)).astype(jnp.float32)
        iny0 = ((y0r >= 0) & (y0r <= H - 1)).astype(jnp.float32)
        iny1 = ((y0r + 1 >= 0) & (y0r + 1 <= H - 1)).astype(jnp.float32)

        ybase = jnp.clip(jnp.min(jnp.clip(y0r, 0, H - 1)), 0, H - BY)
        band = src_ref[0, pl.ds(ybase, BY), :, :]      # (BY, C, WP)
        band2 = band.reshape(1, BY * C, WP)

        iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, WP, WP), 1)
        Xc = ((iota_w == x0r[:, None, :]).astype(jnp.float32)
              * ((1 - wxr) * in0)[:, None, :]
              + (iota_w == (x0r + 1)[:, None, :]).astype(jnp.float32)
              * (wxr * in1)[:, None, :])               # (rows, WP, WP)

        # batched matmul over the row chunk: (rows, BY*C, WP) @ (rows, WP, WP)
        T = jax.lax.dot_general(
            jnp.broadcast_to(band2, (rows, BY * C, WP)), Xc,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(rows, BY, C, WP)

        iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, BY, WP), 1)
        Ym = ((iota_b == (y0r - ybase)[:, None, :]).astype(jnp.float32)
              * ((1 - wyr) * iny0)[:, None, :]
              + (iota_b == (y0r + 1 - ybase)[:, None, :]).astype(jnp.float32)
              * (wyr * iny1)[:, None, :])              # (rows, BY, WP)

        warped = jnp.sum(T * Ym[:, :, None, :], axis=1)  # (rows, C, WP)

        ref_c = ref_ref[pl.ds(r0, rows), :, :]           # (rows, C, WP)
        diff = warped - ref_c
        cost_c = jnp.sum(diff * diff, axis=1) * (1.0 / sigma)  # (rows, WP)

        @pl.when(v == 0)
        def _():
            cost_ref[0, pl.ds(r0, rows), :] = cost_c

        @pl.when(v != 0)
        def _():
            cost_ref[0, pl.ds(r0, rows), :] = (
                cost_ref[0, pl.ds(r0, rows), :] + cost_c)

        if keep:
            kept_ref[0, 0, pl.ds(r0, rows), :, :] = warped[:, C - KEEP_PAD:, :]
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def sweep_cost_volume_pallas(
    ref_feat: jax.Array,     # (H, W, C)
    src_feats: jax.Array,    # (V, H, W, C)
    Rs: jax.Array,           # (V, 3, 3)
    ts: jax.Array,           # (V, 3)
    cam: Camera,
    d_candi: jax.Array,      # (D,)
    sigma: float,
    keep_last_channels: int = 0,
    interpret: bool = False,
):
    """Drop-in fast path for ops.sweep.sweep_cost_volume (L2 distance)."""
    V, H, W, C = src_feats.shape
    D = d_candi.shape[0]
    WP = max(128, int(np.ceil(W / 128) * 128))
    keep = keep_last_channels
    assert keep in (0, 3), "kernel keeps the last 3 (intensity) channels"

    # homography terms with the align-corners pixel scaling folded in:
    # px = ax * u / z, ax = (W-1) / (2 cx)  (ops/sweep._sweep_pixel_coords)
    rays = unit_rays(cam, H, W)                        # (3, HW)
    scale = jnp.stack([(W - 1) / (2.0 * cam.cx),
                       (H - 1) / (2.0 * cam.cy),
                       jnp.ones_like(cam.cx)])
    term1 = (cam.K @ ts[..., None])[..., 0] * scale    # (V, 3)
    term2 = (cam.K @ Rs) @ rays                        # (V, 3, HW)
    term2 = term2 * scale.reshape(1, 3, 1)
    term2 = term2.reshape(V, 3, H, W)
    term2 = jnp.pad(term2, ((0, 0), (0, 0), (0, 0), (0, WP - W)), mode="edge")
    term1 = jnp.broadcast_to(term1[:, :, None, None],
                             (V, 3, 8, 128)).astype(jnp.float32)

    src_t = jnp.pad(src_feats.transpose(0, 1, 3, 2),   # (V, H, C, W)
                    ((0, 0), (0, 0), (0, 0), (0, WP - W)))
    ref_t = jnp.pad(ref_feat.transpose(2, 0, 1), ((0, 0), (0, 0), (0, WP - W))
                    ).transpose(1, 0, 2)               # (H, C, WP)
    d_col = jnp.broadcast_to(d_candi[:, None, None], (D, 8, 128)).astype(jnp.float32)

    rows = ROWS if H % ROWS == 0 else 1
    kernel = functools.partial(_sweep_kernel, H=H, W=W, WP=WP, C=C,
                               sigma=float(sigma), keep=bool(keep),
                               rows=rows)
    out_shapes = (
        jax.ShapeDtypeStruct((D, H, WP), jnp.float32),
        jax.ShapeDtypeStruct((V, D, H, KEEP_PAD, WP), jnp.float32),
    )
    cost, kept = pl.pallas_call(
        kernel,
        grid=(D, V),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda d, v: (d, 0, 0),
                         memory_space=pltpu.VMEM),               # d_candi
            pl.BlockSpec((1, 3, 8, 128), lambda d, v: (v, 0, 0, 0),
                         memory_space=pltpu.VMEM),               # term1
            pl.BlockSpec((1, 3, H, WP), lambda d, v: (v, 0, 0, 0),
                         memory_space=pltpu.VMEM),               # term2
            pl.BlockSpec((1, H, C, WP), lambda d, v: (v, 0, 0, 0),
                         memory_space=pltpu.VMEM),               # src
            pl.BlockSpec((H, C, WP), lambda d, v: (0, 0, 0),
                         memory_space=pltpu.VMEM),               # ref
        ],
        out_specs=(
            pl.BlockSpec((1, H, WP), lambda d, v: (d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, KEEP_PAD, WP), lambda d, v: (v, d, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(d_col, term1, term2, src_t, ref_t)

    cost = jax.lax.stop_gradient(cost[:, :, :W])
    if keep:
        # kept rows [KEEP_PAD-3:] are the intensity channels, layout
        # (V, D, H, 3, W) -> (V, D, H, W, 3)
        kept_rgb = kept[:, :, :, KEEP_PAD - 3:, :W].transpose(0, 1, 2, 4, 3)
        return cost, jax.lax.stop_gradient(kept_rgb)
    return cost
