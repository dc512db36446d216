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
) -> jax.Array:
    """Bilinear sample of ``img`` (H, W, C) at pixel coords (..., 2) = (x, y).

    Returns (..., C). Gradients flow to both ``img`` and ``coords_xy``
    (the LBA optimizer differentiates through this, reference
    ``ICP/opt_pose_numerical.py``).
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


def grid_sample_3d(
    vol: jax.Array,
    coords_xyz: jax.Array,
    padding: str = "border",
) -> jax.Array:
    """Trilinear sample of ``vol`` (D, H, W) at pixel coords (..., 3) = (x, y, z).

    x indexes W, y indexes H, z indexes D — the same axis order as the
    reference's 5-D ``F.grid_sample`` in ``resample_vol_cuda``
    (``homography.py:712-718``). Returns (...,).
    """
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
