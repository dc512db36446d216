"""Fused Pallas kernel for the DPV prediction resample.

The XLA formulation of ``ops.dpv.resample_dpv`` is 3.1M scalar gathers
(8 trilinear taps x 393k voxels) and costs ~32 ms/frame on v5e — a third of
the whole inference step. This kernel exploits the warp's structure:

- within one output row (fixed d, h), the source z and y coordinates vary by
  at most a few voxels (they change only through the rotation part of the
  relative pose), so a small (BZ x BY) *band* of the source volume covers
  every tap of the row;
- the x taps are a per-lane gather along W — the one gather direction the
  VPU vectorizes (``take_along_axis`` on the lane axis, ~15 Gel/s measured);
- the band's (z, y) tap selection is a masked sublane reduction (VPU).

Semantics match ``resample_dpv`` (border padding after ``_set_vol_border``,
align_corners pixel mapping, clamp) for relative poses whose per-row source
band fits in (BZ, BY) = (8, 8) — i.e. inter-frame rotation tilting a 96-px
row by < 7 voxels, far beyond the video windows this filter sees. The XLA
path remains the oracle; parity is tested in interpret mode and on-device.

NOT differentiable (jax.custom_jvp-free): the prediction step is explicitly
detached in training (train_utils/train_KVNet.py:155-171), so no VJP is ever
taken through it.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuralrgbd_tpu.ops.camera import Camera, unit_rays
from neuralrgbd_tpu.ops.dpv import _set_vol_border
from neuralrgbd_tpu.ops.sampling import normalized_to_pixel

BZ = 8   # source-z band height
BY = 8   # source-y band height


def _resample_kernel(vol_ref, cx_ref, cy_ref, cz_ref, out_ref, *, D, H, W,
                     WP, BYL=BY):
    """Grid cell = one output depth slice d. Loops over the H output rows.

    vol_ref:  (D, H, WP) source volume (border pre-set, x-padded)
    c*_ref:   (1, H, WP) pixel-space sample coordinates for this d-slice
    out_ref:  (1, H, WP)

    ``BYL`` is the number of source rows LOADED per band. With BYL == BY
    the band starts at the per-row min y tap (a fully dynamic sublane
    offset, which Mosaic only accepts at single-lane-tile widths); with
    BYL == 2*BY the start is aligned down to a multiple of 8 — statically
    provable, required for WP > 128 — and the doubled band still covers
    the BY-row tap spread past the alignment shift.
    """

    def row_body(h, _):
        px = cx_ref[0, h, :]                     # (WP,)
        py = cy_ref[0, h, :]
        pz = cz_ref[0, h, :]

        # border padding == clamp tap coords into the volume
        x0 = jnp.floor(px).astype(jnp.int32)
        y0 = jnp.floor(py).astype(jnp.int32)
        z0 = jnp.floor(pz).astype(jnp.int32)
        wx = px - x0.astype(jnp.float32)
        wy = py - y0.astype(jnp.float32)
        wz = pz - z0.astype(jnp.float32)

        x0c = jnp.clip(x0, 0, W - 1)
        x1c = jnp.clip(x0 + 1, 0, W - 1)
        y0c = jnp.clip(y0, 0, H - 1)
        y1c = jnp.clip(y0 + 1, 0, H - 1)
        z0c = jnp.clip(z0, 0, D - 1)
        z1c = jnp.clip(z0 + 1, 0, D - 1)

        zbase = jnp.clip(jnp.min(z0c), 0, D - BZ)
        ybase = jnp.clip(jnp.min(y0c), 0, H - BYL)
        if BYL != BY:
            ybase = (ybase // 8) * 8     # provable sublane alignment

        band = vol_ref[pl.ds(zbase, BZ), pl.ds(ybase, BYL), :]
        band2 = band.reshape(BZ * BYL, WP)

        # lane gathers: x taps, shared indices across the band rows
        t0 = jnp.take_along_axis(band2, jnp.broadcast_to(x0c, (BZ * BYL, WP)),
                                 axis=1)
        t1 = jnp.take_along_axis(band2, jnp.broadcast_to(x1c, (BZ * BYL, WP)),
                                 axis=1)
        tx = t0 * (1.0 - wx) + t1 * wx           # (BZ*BYL, WP)

        # (z, y) tap selection: masked sublane reduction over the band
        bz = jax.lax.broadcasted_iota(jnp.int32, (BZ * BYL, WP), 0) // BYL
        by = jax.lax.broadcasted_iota(jnp.int32, (BZ * BYL, WP), 0) % BYL

        def tap(zc, yc, w):
            m = (bz == (zc - zbase)) & (by == (yc - ybase))
            return jnp.sum(jnp.where(m, tx, 0.0), axis=0) * w

        out = (
            tap(z0c, y0c, (1 - wz) * (1 - wy))
            + tap(z0c, y1c, (1 - wz) * wy)
            + tap(z1c, y0c, wz * (1 - wy))
            + tap(z1c, y1c, wz * wy)
        )
        out_ref[0, h, :] = out
        return 0

    jax.lax.fori_loop(0, H, row_body, 0)


def resample_pixel_coords(cam: Camera, rel_Rt: jax.Array,
                          d_candi: jax.Array, H: int, W: int):
    """Pixel-space (cx, cy, cz), each (D, HW), of the DPV resample — the
    shared coordinate formula of ``ops.dpv.resample_dpv`` (reference:
    resample_vol_cuda, homography.py:673-705). Coords are clipped to
    [-2, dim+1] to keep int32 tap math sane for far-out-of-frustum points
    (border padding clamps them to the volume edge anyway)."""
    D = d_candi.shape[0]
    rays = unit_rays(cam, H, W)                       # (3, HW)
    pts = rays[None, :, :] * d_candi.reshape(-1, 1, 1)
    R = rel_Rt[:3, :3]
    t = rel_Rt[:3, 3]
    p = jnp.einsum("ij,djn->din", R, pts) + t.reshape(1, 3, 1)
    z = p[:, 2, :] + 1e-10
    z_max = jnp.max(d_candi)
    z_min = jnp.min(d_candi)
    z_mid = (z_max + z_min) * 0.5
    z_rad = (z_max - z_min) * 0.5
    gx = p[:, 0, :] / z / cam.tan_half_hfov
    gy = p[:, 1, :] / z / cam.tan_half_vfov
    gz = (p[:, 2, :] - z_mid) / z_rad
    cx = jnp.clip(normalized_to_pixel(gx, W), -2.0, W + 1.0)
    cy = jnp.clip(normalized_to_pixel(gy, H), -2.0, H + 1.0)
    cz = jnp.clip(normalized_to_pixel(gz, D), -2.0, D + 1.0)
    return cx, cy, cz


def resample_dpv_pallas(
    dpv: jax.Array,        # (D, H, W) log-DPV
    rel_Rt: jax.Array,     # (4, 4) extrinsic next-view -> current-view
    cam: Camera,
    d_candi: jax.Array,
    padding_value: float,
    clamp_to=(-1000.0, 0.0),
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fast path for ``ops.dpv.resample_dpv`` (same signature)."""
    D, H, W = dpv.shape
    WP = max(128, int(np.ceil(W / 128) * 128))
    # multi-lane-tile widths need the statically-aligned double band
    # (see _resample_kernel); single-tile widths keep the minimal band
    BYL = 2 * BY if (WP > 128 and H >= 2 * BY) else BY
    if WP > 128 and not interpret:
        # Mosaic's tpu.dynamic_gather reads from ONE source vreg: the
        # per-lane x-tap gather cannot span >128 lanes on hardware yet.
        # Wide shapes ride ops.pallas.resample_tiled (MXU selection
        # matmuls) or the oct XLA gather (ops.sampling) instead.
        raise ValueError("resample_dpv_pallas requires W <= 128 on "
                         "hardware (multi-vreg lane gather unsupported); "
                         "use resample_dpv_tiled or ops.dpv.resample_dpv")

    cx, cy, cz = resample_pixel_coords(cam, rel_Rt, d_candi, H, W)

    def pad_w(a):
        # edge-replicate: padded lanes must not perturb the per-row band min
        return jnp.pad(a.reshape(D, H, W), ((0, 0), (0, 0), (0, WP - W)),
                       mode="edge")

    vol = _set_vol_border(dpv, padding_value)
    volp = jnp.pad(vol, ((0, 0), (0, 0), (0, WP - W)),
                   constant_values=padding_value)

    kernel = functools.partial(_resample_kernel, D=D, H=H, W=W, WP=WP,
                               BYL=BYL)
    out = pl.pallas_call(
        kernel,
        grid=(D,),
        in_specs=[
            pl.BlockSpec((D, H, WP), lambda d: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, WP), lambda d: (d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, WP), lambda d: (d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, WP), lambda d: (d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, WP), lambda d: (d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, H, WP), jnp.float32),
        interpret=interpret,
    )(volp, pad_w(cx), pad_w(cy), pad_w(cz))

    out = out[:, :, :W]
    if clamp_to is not None:
        out = jnp.clip(out, clamp_to[0], clamp_to[1])
    return jax.lax.stop_gradient(out)
