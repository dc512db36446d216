"""Differentiable guided filter + the DGF refinement head.

Reference: ``models/GF/{box_filter,guided_filter}.py`` and
``RefineNet_DGF`` (Refine.py:587-641) — the alternative refinement head
selectable with ``refineNet_name='DGF'`` (KVNET.py:80-81). The box filter is
a 2-D cumulative-sum trick (box_filter.py:25-34) which maps directly onto
jnp.cumsum; the guided filter is the closed-form (A, b) solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from neuralrgbd_tpu.models.layers import upsample_bilinear_ac


def box_filter(x: jax.Array, r: int) -> jax.Array:
    """Sum over a (2r+1)^2 window via cumsum + slicing. x: (..., H, W)."""
    H, W = x.shape[-2], x.shape[-1]
    assert H > 2 * r + 1 and W > 2 * r + 1, "radius too large for image"

    def along(x, axis, size):
        c = jnp.cumsum(x, axis=axis)

        def sl(a, lo, hi):
            idx = [slice(None)] * a.ndim
            idx[axis] = slice(lo, hi)
            return a[tuple(idx)]

        left = sl(c, r, 2 * r + 1)
        mid = sl(c, 2 * r + 1, size) - sl(c, 0, size - 2 * r - 1)
        right = (sl(c, size - 1, size)
                 - sl(c, size - 2 * r - 1, size - r - 1))
        return jnp.concatenate([left, mid, right], axis=axis)

    return along(along(x, -2, H), -1, W)


class GuidedFilter:
    """Closed-form guided filter (guided_filter.py:54-97). Pure function."""

    def __init__(self, r: int, eps: float = 1e-8):
        self.r = r
        self.eps = eps

    def __call__(self, guide: jax.Array, src: jax.Array) -> jax.Array:
        """guide (H, W) or (H, W, C->averaged?); here single-channel like
        the reference's depth usage: guide (H, W), src (H, W)."""
        N = box_filter(jnp.ones_like(guide), self.r)
        mean_x = box_filter(guide, self.r) / N
        mean_y = box_filter(src, self.r) / N
        cov_xy = box_filter(guide * src, self.r) / N - mean_x * mean_y
        var_x = box_filter(guide * guide, self.r) / N - mean_x * mean_x
        A = cov_xy / (var_x + self.eps)
        b = mean_y - A * mean_x
        mean_A = box_filter(A, self.r) / N
        mean_b = box_filter(b, self.r) / N
        return mean_A * guide + mean_b


class FastGuidedFilter:
    """Low-res (A, b) solve, upsampled to the full-res guide
    (guided_filter.py:13-51)."""

    def __init__(self, r: int, eps: float = 1e-8):
        self.gf = GuidedFilter(r, eps)
        self.r = r
        self.eps = eps

    def __call__(self, guide_lr, src_lr, guide_hr):
        N = box_filter(jnp.ones_like(guide_lr), self.r)
        mean_x = box_filter(guide_lr, self.r) / N
        mean_y = box_filter(src_lr, self.r) / N
        cov_xy = box_filter(guide_lr * src_lr, self.r) / N - mean_x * mean_y
        var_x = box_filter(guide_lr * guide_lr, self.r) / N - mean_x ** 2
        A = cov_xy / (var_x + self.eps)
        b = mean_y - A * mean_x
        H, W = guide_hr.shape[-2], guide_hr.shape[-1]
        A_hr = upsample_bilinear_ac(A[..., None], (H, W))[..., 0]
        b_hr = upsample_bilinear_ac(b[..., None], (H, W))[..., 0]
        return A_hr * guide_hr + b_hr


class RefineNetDGF(nn.Module):
    """Deep-guided-filter refinement head, exact ``RefineNet_DGF`` parity
    (Refine.py:587-641): bilinearly upsample the low-res depth map
    (align_corners, scale = H/h), turn the RGB frame into a 1-channel guide
    with Conv2d(3,64,1) + ReLU + Conv2d(64,1,1) (``feature_ext``,
    Refine.py:598-601), then apply the full-res GuidedFilter(r=1, eps=1e-8).
    Module names follow the torch state_dict for the weight importer."""

    r: int = 1
    eps: float = 1e-8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dmap_lowres: jax.Array, img: jax.Array) -> jax.Array:
        """dmap_lowres (h, w); img (H, W, 3) full-res guide. Returns (H, W)."""
        from neuralrgbd_tpu.models.layers import ConvB

        H, W = img.shape[0], img.shape[1]
        g = nn.relu(ConvB(64, 1, 1, 0, use_bias=True, dtype=self.dtype,
                          name="feature_ext_0")(img[None]))
        g = ConvB(1, 1, 1, 0, use_bias=True, dtype=self.dtype,
                  name="feature_ext_2")(g)[0, :, :, 0]
        dmap_up = upsample_bilinear_ac(dmap_lowres[..., None],
                                       (H, W))[..., 0]
        return GuidedFilter(self.r, self.eps)(g, dmap_up)
