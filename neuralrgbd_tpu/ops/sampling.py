"""Differentiable image / volume resampling.

These are the TPU equivalents of the ``F.grid_sample`` calls the reference
leans on for every warp (``warping/homography.py:418,447,475,527,571,647,716``).
The reference was written against the pre-1.3 PyTorch default, i.e.
``align_corners=True``:

- a normalized grid coordinate g in [-1, 1] maps to the pixel coordinate
  p = (g + 1) / 2 * (S - 1)  (S = extent of that axis);
- ``padding_mode='zeros'``: a bilinear tap outside the image contributes 0;
- ``padding_mode='border'``: tap indices are clamped to the image.

Off-by-half-pixel errors here silently destroy depth accuracy (SURVEY.md
section 7.3), so this module is tested bit-for-tolerance against
``torch.nn.functional.grid_sample(align_corners=True)`` on CPU.

Layout: channels-last. Coordinates are in *pixel* units (after the
align-corners transform); ``normalized_to_pixel`` converts from the
reference's [-1, 1] convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalized_to_pixel(g: jax.Array, size: int) -> jax.Array:
    """align_corners=True mapping from [-1, 1] grid coords to pixel coords."""
    return (g + 1.0) * 0.5 * (size - 1)


def _gather_hw(img_flat: jax.Array, iy: jax.Array, ix: jax.Array, W: int):
    """Gather rows of a (H*W, C) matrix at iy*W+ix. Indices must be in-range."""
    return jnp.take(img_flat, iy * W + ix, axis=0)


def grid_sample_2d(
    img: jax.Array,
    coords_xy: jax.Array,
    padding: str = "zeros",
    fast: bool = False,
    method: str | None = None,
) -> jax.Array:
    """Bilinear sample of ``img`` (H, W, C) at pixel coords (..., 2) = (x, y).

    Returns (..., C). Gradients flow to both ``img`` and ``coords_xy``
    (the LBA optimizer differentiates through this, reference
    ``ICP/opt_pose_numerical.py``).

    ``fast=True`` uses one lax.gather with (2, 2, C) slices per output point.
    MEASURED ON v5e: the slice gather is ~100x SLOWER for wide C (2.6 s vs
    24 ms for the C=67 sweep) and ~25x slower for the scalar 3-D resample —
    XLA lowers multi-dim-slice gathers poorly — and only marginally faster
    for C=3 warps (45 vs 78 ms). Default stays on the 4-tap row-gather
    path; kept for narrow-C experiments and as an independent oracle.
    """
    if method == "quad":
        return _grid_sample_2d_quad(img, coords_xy, padding)
    if method == "slice" or (method is None and fast):
        return _grid_sample_2d_slice(img, coords_xy, padding)
    return _grid_sample_2d_taps(img, coords_xy, padding)


def _grid_sample_2d_taps(img, coords_xy, padding="zeros"):
    H, W, C = img.shape
    out_shape = coords_xy.shape[:-1]
    x = coords_xy[..., 0].reshape(-1)
    y = coords_xy[..., 1].reshape(-1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    img_flat = img.reshape(H * W, C)

    if padding == "zeros":
        def tap(yi, xi, w):
            inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            yc = jnp.clip(yi, 0, H - 1)
            xc = jnp.clip(xi, 0, W - 1)
            vals = _gather_hw(img_flat, yc, xc, W)
            return vals * (w * inb.astype(img.dtype))[:, None]
    elif padding == "border":
        def tap(yi, xi, w):
            yc = jnp.clip(yi, 0, H - 1)
            xc = jnp.clip(xi, 0, W - 1)
            vals = _gather_hw(img_flat, yc, xc, W)
            return vals * w[:, None]
    else:
        raise ValueError(f"unknown padding mode: {padding}")

    out = (
        tap(y0i, x0i, (1 - wx) * (1 - wy))
        + tap(y0i, x1i, wx * (1 - wy))
        + tap(y1i, x0i, (1 - wx) * wy)
        + tap(y1i, x1i, wx * wy)
    )
    return out.reshape(*out_shape, C)


def _slice_gather_2d(img: jax.Array, y0c: jax.Array, x0c: jax.Array):
    """One gather of (2, 2, C) slices at clamped starts. img (H, W, C),
    starts (N,). Returns (N, 2, 2, C)."""
    starts = jnp.stack([y0c, x0c], axis=-1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    return jax.lax.gather(
        img, starts, dnums,
        slice_sizes=(2, 2, img.shape[-1]),
        mode=jax.lax.GatherScatterMode.CLIP,
    )


def _grid_sample_2d_slice(img, coords_xy, padding="zeros"):
    H, W, C = img.shape
    out_shape = coords_xy.shape[:-1]
    x = coords_xy[..., 0].reshape(-1)
    y = coords_xy[..., 1].reshape(-1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # clamp starts so the (2,2) slice is in-bounds; remember the offset of
    # the true tap position inside the slice
    x0c = jnp.clip(x0i, 0, W - 2)
    y0c = jnp.clip(y0i, 0, H - 2)
    offx = x0i - x0c   # in {-1, 0, 1} for taps within 1px of the image
    offy = y0i - y0c

    s = _slice_gather_2d(img, y0c, x0c)  # (N, 2, 2, C)

    def tap(ay, ax, w):
        # position of tap (y0+ay, x0+ax) inside the gathered slice
        py = jnp.clip(offy + ay, 0, 1)
        px = jnp.clip(offx + ax, 0, 1)
        v00, v01, v10, v11 = s[:, 0, 0], s[:, 0, 1], s[:, 1, 0], s[:, 1, 1]
        vx0 = jnp.where(px[:, None] == 0, v00, v01)
        vx1 = jnp.where(px[:, None] == 0, v10, v11)
        v = jnp.where(py[:, None] == 0, vx0, vx1)
        if padding == "zeros":
            xi = x0i + ax
            yi = y0i + ay
            inb = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
            w = w * inb[:, None].astype(img.dtype)
        elif padding != "border":
            raise ValueError(f"unknown padding mode: {padding}")
        return v * w

    out = (
        tap(0, 0, (1 - wx) * (1 - wy))
        + tap(0, 1, wx * (1 - wy))
        + tap(1, 0, (1 - wx) * wy)
        + tap(1, 1, wx * wy)
    )
    return out.reshape(*out_shape, C)


def grid_sample_3d(
    vol: jax.Array,
    coords_xyz: jax.Array,
    padding: str = "border",
    fast: bool = False,
    method: str | None = None,
) -> jax.Array:
    """Trilinear sample of ``vol`` (D, H, W) at pixel coords (..., 3) = (x, y, z).

    x indexes W, y indexes H, z indexes D — the same axis order as the
    reference's 5-D ``F.grid_sample`` in ``resample_vol_cuda``
    (``homography.py:712-718``). Returns (...,).

    ``fast=True`` gathers one (2,2,2) slice per output voxel — measured
    ~25x SLOWER on v5e than the 8-tap path (see grid_sample_2d note).
    ``method='oct'`` packs all 8 trilinear taps into one gathered row
    (border padding only) — 8x fewer gather indices, the win that makes
    image-res / wide-W DPV resamples viable on v5e (PERF.md round 3).
    """
    if method == "oct":
        return _grid_sample_3d_oct(vol, coords_xyz, padding)
    if fast:
        return _grid_sample_3d_slice(vol, coords_xyz, padding)
    return _grid_sample_3d_taps(vol, coords_xyz, padding)


def _grid_sample_3d_oct(vol, coords_xyz, padding="border"):
    """One gather per output voxel: the 8 trilinear taps ride one row of a
    (D*H*W, 8) 'oct' volume built from edge-padded shifted copies.

    TPU gathers are index-throughput-bound (row bytes are nearly free up to
    ~128 floats — PERF.md), so packing taps 8-per-row cuts the gather cost
    ~8x; the oct build is 8 cheap slices of one edge-padded copy.

    Border padding only (the DPV-resample case), where clamping has a
    closed form: the oct row at the CLAMPED base (z0c, y0c, x0c) holds
    vol[min(base+offset, dim-1)] per axis, which already equals every
    clamped upper tap; lower out-of-range taps (z0+1 <= 0) collapse onto
    the base voxel, i.e. that axis's '+1' weight moves to the base —
    implemented by zeroing the fractional weight there. Exact vs the
    8-tap path (tests/test_sampling.py::test_oct_matches_taps_3d).
    """
    if padding != "border":
        raise ValueError("oct path supports border padding only")
    D, H, W = vol.shape
    out_shape = coords_xyz.shape[:-1]
    x = coords_xyz[..., 0].reshape(-1)
    y = coords_xyz[..., 1].reshape(-1)
    z = coords_xyz[..., 2].reshape(-1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    wx = x - x0
    wy = y - y0
    wz = z - z0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    # lower-clamped '+1' taps read the same (border) voxel as the base:
    # fold their weight into the base column
    wx = jnp.where(x0i + 1 <= 0, 0.0, wx)
    wy = jnp.where(y0i + 1 <= 0, 0.0, wy)
    wz = jnp.where(z0i + 1 <= 0, 0.0, wz)

    vp = jnp.pad(vol, ((0, 1), (0, 1), (0, 1)), mode="edge")
    oct_cols = [vp[dz:dz + D, dy:dy + H, dx:dx + W]
                for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
    oct = jnp.stack(oct_cols, axis=-1).reshape(D * H * W, 8)

    x0c = jnp.clip(x0i, 0, W - 1)
    y0c = jnp.clip(y0i, 0, H - 1)
    z0c = jnp.clip(z0i, 0, D - 1)
    rows = jnp.take(oct, (z0c * H + y0c) * W + x0c, axis=0)   # (N, 8)

    out = (
        rows[:, 0] * (1 - wz) * (1 - wy) * (1 - wx)
        + rows[:, 1] * (1 - wz) * (1 - wy) * wx
        + rows[:, 2] * (1 - wz) * wy * (1 - wx)
        + rows[:, 3] * (1 - wz) * wy * wx
        + rows[:, 4] * wz * (1 - wy) * (1 - wx)
        + rows[:, 5] * wz * (1 - wy) * wx
        + rows[:, 6] * wz * wy * (1 - wx)
        + rows[:, 7] * wz * wy * wx
    )
    return out.reshape(out_shape)


def _grid_sample_3d_slice(vol, coords_xyz, padding="border"):
    D, H, W = vol.shape
    out_shape = coords_xyz.shape[:-1]
    x = coords_xyz[..., 0].reshape(-1)
    y = coords_xyz[..., 1].reshape(-1)
    z = coords_xyz[..., 2].reshape(-1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    wx = x - x0
    wy = y - y0
    wz = z - z0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    x0c = jnp.clip(x0i, 0, W - 2)
    y0c = jnp.clip(y0i, 0, H - 2)
    z0c = jnp.clip(z0i, 0, D - 2)
    offx, offy, offz = x0i - x0c, y0i - y0c, z0i - z0c

    starts = jnp.stack([z0c, y0c, x0c], axis=-1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1, 2),
    )
    s = jax.lax.gather(vol, starts, dnums, slice_sizes=(2, 2, 2),
                       mode=jax.lax.GatherScatterMode.CLIP)  # (N,2,2,2)

    def tap(az, ay, ax, w):
        pz = jnp.clip(offz + az, 0, 1)
        py = jnp.clip(offy + ay, 0, 1)
        px = jnp.clip(offx + ax, 0, 1)
        vz0 = jnp.where(
            py == 0,
            jnp.where(px == 0, s[:, 0, 0, 0], s[:, 0, 0, 1]),
            jnp.where(px == 0, s[:, 0, 1, 0], s[:, 0, 1, 1]),
        )
        vz1 = jnp.where(
            py == 0,
            jnp.where(px == 0, s[:, 1, 0, 0], s[:, 1, 0, 1]),
            jnp.where(px == 0, s[:, 1, 1, 0], s[:, 1, 1, 1]),
        )
        v = jnp.where(pz == 0, vz0, vz1)
        if padding == "zeros":
            xi, yi, zi = x0i + ax, y0i + ay, z0i + az
            inb = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
                   & (zi >= 0) & (zi <= D - 1))
            w = w * inb.astype(vol.dtype)
        elif padding != "border":
            raise ValueError(f"unknown padding mode: {padding}")
        return v * w

    out = (
        tap(0, 0, 0, (1 - wx) * (1 - wy) * (1 - wz))
        + tap(0, 0, 1, wx * (1 - wy) * (1 - wz))
        + tap(0, 1, 0, (1 - wx) * wy * (1 - wz))
        + tap(0, 1, 1, wx * wy * (1 - wz))
        + tap(1, 0, 0, (1 - wx) * (1 - wy) * wz)
        + tap(1, 0, 1, wx * (1 - wy) * wz)
        + tap(1, 1, 0, (1 - wx) * wy * wz)
        + tap(1, 1, 1, wx * wy * wz)
    )
    return out.reshape(out_shape)


def _grid_sample_3d_taps(vol, coords_xyz, padding="border"):
    D, H, W = vol.shape
    out_shape = coords_xyz.shape[:-1]
    x = coords_xyz[..., 0].reshape(-1)
    y = coords_xyz[..., 1].reshape(-1)
    z = coords_xyz[..., 2].reshape(-1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    wx = x - x0
    wy = y - y0
    wz = z - z0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    vol_flat = vol.reshape(-1)

    def tap(zi, yi, xi, w):
        if padding == "zeros":
            inb = (
                (xi >= 0) & (xi <= W - 1)
                & (yi >= 0) & (yi <= H - 1)
                & (zi >= 0) & (zi <= D - 1)
            )
            w = w * inb.astype(vol.dtype)
        elif padding != "border":
            raise ValueError(f"unknown padding mode: {padding}")
        zc = jnp.clip(zi, 0, D - 1)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        vals = jnp.take(vol_flat, (zc * H + yc) * W + xc)
        return vals * w

    out = (
        tap(z0i, y0i, x0i, (1 - wx) * (1 - wy) * (1 - wz))
        + tap(z0i, y0i, x0i + 1, wx * (1 - wy) * (1 - wz))
        + tap(z0i, y0i + 1, x0i, (1 - wx) * wy * (1 - wz))
        + tap(z0i, y0i + 1, x0i + 1, wx * wy * (1 - wz))
        + tap(z0i + 1, y0i, x0i, (1 - wx) * (1 - wy) * wz)
        + tap(z0i + 1, y0i, x0i + 1, wx * (1 - wy) * wz)
        + tap(z0i + 1, y0i + 1, x0i, (1 - wx) * wy * wz)
        + tap(z0i + 1, y0i + 1, x0i + 1, wx * wy * wz)
    )
    return out.reshape(out_shape)


def _grid_sample_2d_quad(img, coords_xy, padding="zeros"):
    """One gather per output point: the four bilinear taps are pre-packed
    into one row of a (H*W, 4C) 'quad' image built from shifted copies.

    TPU gathers are index-throughput-bound (row width is nearly free — see
    PERF.md), so packing taps 4-per-row cuts the gather cost ~4x. The quad
    build is three shifted copies (O(4x) HBM traffic of one feature map,
    trivial next to the gather).

    Zeros-padding only (the plane-sweep case). Tap positions shift inside
    the quad when the base index clamps at the border; |off| > 1 cases are
    fully weight-masked so any selected value is harmless.
    """
    H, W, C = img.shape
    out_shape = coords_xy.shape[:-1]
    x = coords_xy[..., 0].reshape(-1)
    y = coords_xy[..., 1].reshape(-1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if padding != "zeros":
        raise ValueError("quad path supports zeros padding only")

    # shifted copies: sx = img[:, x+1], sy = img[y+1, :], sxy = both
    zx = jnp.zeros((H, 1, C), img.dtype)
    zy = jnp.zeros((1, W, C), img.dtype)
    sx = jnp.concatenate([img[:, 1:], zx], axis=1)
    sy = jnp.concatenate([img[1:], zy], axis=0)
    sxy = jnp.concatenate([sx[1:], zy], axis=0)
    quad = jnp.concatenate([img, sx, sy, sxy], axis=-1).reshape(H * W, 4 * C)

    x0c = jnp.clip(x0i, 0, W - 1)
    y0c = jnp.clip(y0i, 0, H - 1)
    offx = x0i - x0c
    offy = y0i - y0c

    rows = jnp.take(quad, y0c * W + x0c, axis=0)       # (N, 4C)
    q00 = rows[:, 0 * C:1 * C]
    q01 = rows[:, 1 * C:2 * C]
    q10 = rows[:, 2 * C:3 * C]
    q11 = rows[:, 3 * C:4 * C]

    def tap(ay, ax, w):
        py = offy + ay   # position within the quad's y pair
        px = offx + ax
        vy0 = jnp.where(px[:, None] == 0, q00, q01)
        vy1 = jnp.where(px[:, None] == 0, q10, q11)
        v = jnp.where(py[:, None] == 0, vy0, vy1)
        xi = x0i + ax
        yi = y0i + ay
        inb = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
        return v * (w * inb.astype(img.dtype))[:, None]

    out = (
        tap(0, 0, (1 - wx) * (1 - wy))
        + tap(0, 1, wx * (1 - wy))
        + tap(1, 0, (1 - wx) * wy)
        + tap(1, 1, wx * wy)
    )
    return out.reshape(*out_shape, C)
