"""Plane-sweep warps and cost volumes (XLA reference implementation).

Reimplements the geometry heart of the reference
(``/root/reference/code/warping/homography.py``):

- ``sweep_cost_volume``        == ``est_swp_volume_v4``   (homography.py:293-331)
- ``warp_to_ref_over_depths``  == ``warp_img_feats_v3/_mgpu`` (homography.py:183-280)
- ``backward_warp_by_depth``   == ``back_warp_th_Rt[_msrc]``  (homography.py:479-574)

All three share the same projective-sampling core: for a pixel with unit ray
ur and depth hypothesis d the source-image location is

    p_src ~ K t + (K R ur) d        (homography.py:421-448)

and the sample grid is normalized around the principal point,
gx = (u - cx)/cx, before an align_corners=True bilinear lookup with zero
padding. A fused Pallas kernel with identical semantics lives in
``ops/pallas``; it must match this module bit-for-tolerance.

Layouts are channels-last (NHWC); batching over lanes is done with ``vmap``
at the call site so these functions stay rank-minimal and testable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.ops.camera import Camera, unit_rays
from neuralrgbd_tpu.ops.sampling import grid_sample_2d


def _sweep_pixel_coords(cam: Camera, R: jax.Array, t: jax.Array,
                        d_candi: jax.Array, height: int, width: int):
    """Source-view sample coords for every (depth, pixel).

    Returns (D, H*W, 2) pixel-unit xy coordinates ready for grid_sample_2d.
    """
    rays = unit_rays(cam, height, width)            # (3, HW)
    term1 = cam.K @ t.reshape(3, 1)                 # (3, 1)
    term2 = cam.K @ R @ rays                        # (3, HW)
    # (D, 3, HW): p = term1 + term2 * d
    p = term1[None] + term2[None] * d_candi.reshape(-1, 1, 1)
    z = p[:, 2, :] + 1e-10
    u = p[:, 0, :] / z
    v = p[:, 1, :] / z
    # grid normalize around the principal point, then the align_corners=True
    # pixel mapping: px = ((u-cx)/cx + 1)/2 * (W-1) = u * (W-1) / (2*cx).
    px = u * ((width - 1) / 2.0) / cam.cx
    py = v * ((height - 1) / 2.0) / cam.cy
    return jnp.stack([px, py], axis=-1)             # (D, HW, 2)


def warp_to_ref_over_depths(
    src_imgs: jax.Array,    # (V, H, W, C)
    Rs: jax.Array,          # (V, 3, 3) rotation ref->src
    ts: jax.Array,          # (V, 3)    translation ref->src
    cam: Camera,
    d_candi: jax.Array,     # (D,)
) -> jax.Array:
    """Warp every source image into the reference view for every depth.

    Returns (V, D, H, W, C) — the reference's ``warp_img_feats_v3`` output
    (one grid_sample over all D slices per view, homography.py:259-261).
    """
    V, H, W, C = src_imgs.shape

    def per_view(img, R, t):
        coords = _sweep_pixel_coords(cam, R, t, d_candi, H, W)  # (D, HW, 2)
        warped = grid_sample_2d(img, coords, padding="zeros")   # (D, HW, C)
        return warped.reshape(-1, H, W, C)

    return jax.vmap(per_view)(src_imgs, Rs, ts)


def sweep_cost_volume(
    ref_feat: jax.Array,    # (H, W, C)
    src_feats: jax.Array,   # (V, H, W, C)
    Rs: jax.Array,          # (V, 3, 3)
    ts: jax.Array,          # (V, 3)
    cam: Camera,
    d_candi: jax.Array,     # (D,)
    sigma: float,
    feat_dist: str = "L2",
    keep_last_channels: int = 0,
) -> jax.Array:
    """Plane-sweep cost volume, summed over source views.

    cost[d, h, w] = sum_views ||warp_d(src)[h,w] - ref[h,w]||_p / sigma
    (``est_swp_volume_v4``, homography.py:313-327). Returns (D, H, W), or
    (cost, kept) when ``keep_last_channels`` = k > 0, where kept is the
    warped last-k channels per view, (V, D, H, W, k).

    Rationale for ``keep_last_channels``: with use_img_intensity the last 3
    swept channels ARE the 1/4-res RGB frames (basic.py:254-263), which is
    exactly what the reference re-warps separately for the K-Net input
    volume (KVNET.py:149-161, identical poses/depths). Keeping them here
    makes that second 80 ms warp pass free.

    Out-of-frustum taps contribute the bare ||ref||^2 / sigma term (the warp
    pads with zeros), exactly like the reference.
    """
    V, H, W, C = src_feats.shape
    D = d_candi.shape[0]
    k = keep_last_channels
    ref_flat = ref_feat.reshape(1, H * W, C)

    def per_view(carry, view):
        img, R, t = view
        coords = _sweep_pixel_coords(cam, R, t, d_candi, H, W)  # (D, HW, 2)
        warped = grid_sample_2d(img, coords, padding="zeros")   # (D, HW, C)
        diff = warped - ref_flat
        if feat_dist == "L2":
            cost = jnp.sum(diff * diff, axis=-1)
        elif feat_dist == "L1":
            cost = jnp.sum(jnp.abs(diff), axis=-1)
        else:
            raise ValueError(f"undefined feature distance: {feat_dist}")
        kept = warped[..., C - k:] if k else jnp.zeros((D, H * W, 0),
                                                       warped.dtype)
        return carry + cost / sigma, kept

    init = jnp.zeros((D, H * W), dtype=ref_feat.dtype)
    cost, kept = jax.lax.scan(per_view, init, (src_feats, Rs, ts))
    cost = cost.reshape(D, H, W)
    if k:
        return cost, kept.reshape(V, D, H, W, k)
    return cost


def backward_warp_by_depth(
    src_imgs: jax.Array,    # (V, H, W, C)
    dmap: jax.Array,        # (H, W) depth of the *reference* view
    Rs: jax.Array,          # (V, 3, 3) ref->src
    ts: jax.Array,          # (V, 3)
    cam: Camera,
    sample_method: str | None = None,
) -> jax.Array:
    """Depth-map-based backward warp (``back_warp_th_Rt_msrc``).

    Back-projects the reference depth map, reprojects into each source view,
    and samples. Used by the LBA photometric objective
    (``ICP/opt_pose_numerical.py:127-133``). Returns (V, H, W, C).

    ``sample_method`` selects the (numerically identical) gather
    formulation in :func:`grid_sample_2d`; for the C=3 LBA warps the
    quad-packed gather is 3.6x faster end to end on v5e (PERF.md
    "LBA pipeline", 292 -> 80 ms for the 3-scale program).
    """
    V, H, W, C = src_imgs.shape
    rays = unit_rays(cam, H, W)                     # (3, HW)
    pts = dmap.reshape(1, -1) * rays                # (3, HW)

    def per_view(img, R, t):
        p = cam.K @ (R @ pts + t.reshape(3, 1))     # (3, HW)
        # NOTE: no epsilon here — parity with back_warp_th_Rt
        # (homography.py:515,561 divides by z directly).
        u = p[0] / p[2]
        v = p[1] / p[2]
        px = u * ((W - 1) / 2.0) / cam.cx
        py = v * ((H - 1) / 2.0) / cam.cy
        coords = jnp.stack([px, py], axis=-1)       # (HW, 2)
        return grid_sample_2d(img, coords, padding="zeros",
                              method=sample_method).reshape(H, W, C)

    return jax.vmap(per_view)(src_imgs, Rs, ts)
