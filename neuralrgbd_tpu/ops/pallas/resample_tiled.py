"""Wide-W Pallas DPV resample: x-selection as MXU matmuls over tile halos.

The banded kernel in ``ops/pallas/resample.py`` is limited to W <= 128:
its per-lane x-tap gather lowers to Mosaic's ``tpu.dynamic_gather``, which
reads from a single source vreg. This kernel removes the width limit by
borrowing the fused sweep's mechanism — bilinear x-interpolation of one
output row is a matmul with a sparse one-hot selection matrix — so the
image-resolution LBA resample (64x256x384: 146 ms on the oct XLA gather,
432 ms on plain XLA) and wide-W KITTI shapes get a real fast path.

Structure, per grid cell (x_tile, d), looping over the H output rows:

- a (BZ x BY) source band covers every (z, y) tap of the row's 128-lane
  output tile (z varies <~1 depth bin across a row under video motion —
  with normalize_z rays, z_src = d*R22' + t_z is x-independent for pure
  translation; y tilt is the same roll bound as the sweep kernel, and the
  128-lane tile sees 1/XT of the full-row spread). The y band offset is a
  fully dynamic sublane offset — legal here because each vol block is a
  single lane-tile wide (the >128-wide block is exactly what the banded
  kernel can't do).
- x taps can cross tile boundaries, so the vol block is passed ``HALO``
  times with shifted index maps (tiles xt-1, xt, xt+1); each sub-block
  contributes a (BZ*BY, 128) @ (128, 128) MXU dot whose one-hot rhs is
  keyed on *intended* global column indices — edge-clamped duplicate
  blocks therefore match nothing and contribute zero.
- the 4 (z, y) trilinear corners are then a masked sublane reduction over
  the x-interpolated band (same as the banded kernel).

Semantics match ``ops.dpv.resample_dpv`` exactly WHEN the per-(row, tile)
tap spreads fit the static band/halo; ``resample_spread_ok`` computes that
predicate in XLA from the same coords, and ``resample_dpv_wide`` wraps the
kernel in a ``lax.cond`` that falls back to the exact oct-gather path for
the rare frames (extreme rotation, near-field translation > 127 px of
parallax) that exceed it — so the composite is ALWAYS exact.

NOT differentiable: like the banded kernel, the prediction/LBA resample is
explicitly detached (train_utils/train_KVNet.py:155-171).

Reference parity target: ``resample_vol_cuda``
(``/root/reference/code/warping/homography.py:654-723``) via the XLA
oracle ``ops.dpv.resample_dpv``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuralrgbd_tpu.ops.camera import Camera
from neuralrgbd_tpu.ops.dpv import _set_vol_border
from neuralrgbd_tpu.ops.pallas.resample import resample_pixel_coords

LANES = 128
HALO = 3                 # vol tiles visible to one output tile (xt-1..xt+1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tap_ints(px, py, pz, D, H, W):
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    z0 = jnp.floor(pz).astype(jnp.int32)
    return (
        jnp.clip(x0, 0, W - 1), jnp.clip(x0 + 1, 0, W - 1),
        jnp.clip(y0, 0, H - 1), jnp.clip(y0 + 1, 0, H - 1),
        jnp.clip(z0, 0, D - 1), jnp.clip(z0 + 1, 0, D - 1),
        px - x0.astype(jnp.float32),
        py - y0.astype(jnp.float32),
        pz - z0.astype(jnp.float32),
    )


def _tiled_kernel(*refs, D, H, W, BZ, BY):
    cx_ref, cy_ref, cz_ref = refs[:3]
    vol_refs = refs[3:3 + HALO]
    out_ref = refs[3 + HALO]
    xt = pl.program_id(0)

    def row_body(h, _):
        px = cx_ref[0, h, :]                          # (LANES,)
        py = cy_ref[0, h, :]
        pz = cz_ref[0, h, :]
        x0c, x1c, y0c, y1c, z0c, z1c, wx, wy, wz = _tap_ints(
            px, py, pz, D, H, W)

        zbase = jnp.clip(jnp.min(z0c), 0, D - BZ)
        ybase = jnp.clip(jnp.min(y0c), 0, H - BY)

        siota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        acc = jnp.zeros((BZ * BY, LANES), jnp.float32)
        for s in range(HALO):
            # intended global columns of this sub-block; an edge-clamped
            # duplicate block has base != its intended base, so its
            # one-hot matches nothing (border taps clamp to [0, W-1],
            # which always lives in a non-clamped block)
            base = (xt + s - HALO // 2) * LANES
            cols = siota + base
            axt = (
                jnp.where(cols == x0c[None, :], (1.0 - wx)[None, :], 0.0)
                + jnp.where(cols == x1c[None, :], wx[None, :], 0.0)
            )
            band = vol_refs[s][pl.ds(zbase, BZ), pl.ds(ybase, BY), :]
            acc = acc + jax.lax.dot_general(
                band.reshape(BZ * BY, LANES), axt,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        # (z, y) trilinear corners: masked sublane reduction over the band
        bz_i = jax.lax.broadcasted_iota(jnp.int32, (BZ * BY, LANES), 0) // BY
        by_i = jax.lax.broadcasted_iota(jnp.int32, (BZ * BY, LANES), 0) % BY

        def corner(zc, yc, w):
            m = (bz_i == (zc - zbase)[None, :]) & (by_i == (yc - ybase)[None, :])
            return jnp.sum(jnp.where(m, acc, 0.0), axis=0) * w

        out_ref[0, h, :] = (
            corner(z0c, y0c, (1 - wz) * (1 - wy))
            + corner(z0c, y1c, (1 - wz) * wy)
            + corner(z1c, y0c, wz * (1 - wy))
            + corner(z1c, y1c, wz * wy)
        )
        return 0

    jax.lax.fori_loop(0, H, row_body, 0)


def resample_spread_ok(cx, cy, cz, D, H, W, BZ, BY) -> jax.Array:
    """Scalar bool: every (output row, x-tile) fits the kernel's static
    band/halo. cx/cy/cz are ``resample_pixel_coords`` outputs (D, HW)."""
    WP = _round_up(W, LANES)
    XT = WP // LANES

    def tiles(c):
        a = c.reshape(D, H, W)
        a = jnp.pad(a, ((0, 0), (0, 0), (0, WP - W)), mode="edge")
        return a.reshape(D, H, XT, LANES)

    x = tiles(cx)
    y = tiles(cy)
    z = tiles(cz)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x0 + 1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y0 + 1, 0, H - 1)
    z0c = jnp.clip(z0, 0, D - 1)
    z1c = jnp.clip(z0 + 1, 0, D - 1)

    tbase = jnp.arange(XT).reshape(1, 1, XT, 1) * LANES
    lo = tbase - (HALO // 2) * LANES
    hi = tbase + (HALO // 2 + 1) * LANES - 1
    ok_x = jnp.all((x0c >= lo) & (x1c <= hi))
    # band coverage: [base, base+B) with base = clip(min(t0), 0, dim-B)
    # covers max(t1) iff max(t1) - min(t0) <= B-1 (clip only shifts the
    # window when taps already hug an edge, which keeps coverage)
    ok_y = jnp.all(jnp.max(y1c, axis=-1) - jnp.min(y0c, axis=-1) <= BY - 1)
    ok_z = jnp.all(jnp.max(z1c, axis=-1) - jnp.min(z0c, axis=-1) <= BZ - 1)
    return ok_x & ok_y & ok_z


def _resample_tiled_raw(dpv, rel_Rt, cam, d_candi, padding_value,
                        clamp_to, bz, by, interpret, coords=None):
    D, H, W = dpv.shape
    WP = _round_up(W, LANES)
    XT = WP // LANES

    cx, cy, cz = (coords if coords is not None
                  else resample_pixel_coords(cam, rel_Rt, d_candi, H, W))

    def pad_w(a):
        # edge-replicate: padded lanes must not perturb the band minima
        return jnp.pad(a.reshape(D, H, W), ((0, 0), (0, 0), (0, WP - W)),
                       mode="edge")

    vol = _set_vol_border(dpv, padding_value)
    volp = jnp.pad(vol, ((0, 0), (0, 0), (0, WP - W)),
                   constant_values=padding_value)

    kernel = functools.partial(_tiled_kernel, D=D, H=H, W=W, BZ=bz, BY=by)

    def vol_spec(s):
        return pl.BlockSpec(
            (D, H, LANES),
            lambda xt, d, s=s: (0, 0, jnp.clip(xt + s - HALO // 2,
                                               0, XT - 1)),
            memory_space=pltpu.VMEM)

    coord_spec = pl.BlockSpec((1, H, LANES), lambda xt, d: (d, 0, xt),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        # d innermost so the big vol blocks stay resident across the scan
        grid=(XT, D),
        in_specs=[coord_spec] * 3 + [vol_spec(s) for s in range(HALO)],
        out_specs=pl.BlockSpec((1, H, LANES), lambda xt, d: (d, 0, xt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, H, WP), jnp.float32),
        # HALO vol blocks (D, H, 128) are double-buffered by the pipeline:
        # ~50 MB at the image-res operating point (> the 16 MB default)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pad_w(cx), pad_w(cy), pad_w(cz), volp, volp, volp)

    out = out[:, :, :W]
    if clamp_to is not None:
        out = jnp.clip(out, clamp_to[0], clamp_to[1])
    return jax.lax.stop_gradient(out)


def resample_dpv_tiled(dpv, rel_Rt, cam, d_candi, padding_value,
                       clamp_to=(-1000.0, 0.0), bz: int = 4, by: int = 8,
                       interpret: bool = False):
    """Wide-W fast path for ``ops.dpv.resample_dpv`` (no spread guard —
    callers wanting unconditional exactness use ``resample_dpv_wide``)."""
    return _resample_tiled_raw(dpv, rel_Rt, cam, d_candi,
                               float(padding_value), clamp_to, bz, by,
                               interpret)


def resample_dpv_wide(dpv, rel_Rt, cam, d_candi, padding_value,
                      clamp_to=(-1000.0, 0.0), bz: int = 4, by: int = 8):
    """Always-exact wide resample: the tiled MXU kernel when the tap
    spreads fit its static band/halo (the video-motion common case), the
    oct XLA gather otherwise — selected on-device by ``lax.cond`` so the
    jitted program needs no host round trip."""
    D, H, W = dpv.shape
    cx, cy, cz = resample_pixel_coords(cam, rel_Rt, d_candi, H, W)
    ok = resample_spread_ok(cx, cy, cz, D, H, W, bz, by)

    def fast(_):
        return _resample_tiled_raw(dpv, rel_Rt, cam, d_candi,
                                   float(padding_value), clamp_to, bz, by,
                                   False, coords=(cx, cy, cz))

    def exact(_):
        from neuralrgbd_tpu.ops.sampling import grid_sample_3d
        vol = _set_vol_border(dpv, padding_value)
        out = grid_sample_3d(vol, jnp.stack([cx, cy, cz], -1),
                             padding="border",
                             method="oct").reshape(D, H, W)
        if clamp_to is not None:
            out = jnp.clip(out, clamp_to[0], clamp_to[1])
        return jax.lax.stop_gradient(out)

    return jax.lax.cond(ok, fast, exact, operand=None)
