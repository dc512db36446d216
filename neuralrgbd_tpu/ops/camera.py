"""Camera model.

The reference carries a per-trajectory ``cam_intrinsics`` dict of numpy /
torch arrays (hfov, vfov, unit-ray array, K on CPU and GPU — see
``/root/reference/code/mdataloader/scanNet.py:204-272``) and stores it as
*constructor state* of the network (``basic.py:172``).  Here the camera is a
single small pytree of arrays that flows through jit like any other datum;
everything else (rays, fov tangents) is derived inside the trace so there is
exactly one source of truth: K.

Conventions (identical to the reference, ``warping/View.py:16-62``):

- pixel (x, y) has its center at (x + 0.5, y + 0.5);
- the rescaled K places the principal point at the image center
  (``scanNet.py:243-253``), i.e. cx = W/2, cy = H/2, and
  fx = cx / tan(hfov/2), fy = cy / tan(vfov/2);
- unit rays are normalized to z = 1 ("perpendicular-z", normalize_z=True),
  so ray(x, y) = ((x+0.5-cx)/fx, (y+0.5-cy)/fy, 1).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera at the resolution the DPV lives at.

    K: (..., 3, 3) float32 intrinsic matrix. Leading dims broadcast as batch.
    """

    K: jax.Array

    @property
    def fx(self) -> jax.Array:
        return self.K[..., 0, 0]

    @property
    def fy(self) -> jax.Array:
        return self.K[..., 1, 1]

    @property
    def cx(self) -> jax.Array:
        return self.K[..., 0, 2]

    @property
    def cy(self) -> jax.Array:
        return self.K[..., 1, 2]

    @property
    def tan_half_hfov(self) -> jax.Array:
        # hfov is defined through the principal point: tan(hfov/2) = cx/fx
        # (reference: scanNet.py:240-241).
        return self.cx / self.fx

    @property
    def tan_half_vfov(self) -> jax.Array:
        return self.cy / self.fy


def camera_from_K(K) -> Camera:
    return Camera(K=jnp.asarray(K, dtype=jnp.float32))


def unit_rays(cam: Camera, height: int, width: int) -> jax.Array:
    """z=1 rays through every pixel center, as a (..., 3, H*W) matrix.

    Matches ``View.normalised_pixel_to_ray_array(normalize_z=True)`` composed
    with the reshape to matrix form in ``scanNet.py:256-258``.
    """
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W) each
    rx = (gx.reshape(-1) - cam.cx[..., None]) / cam.fx[..., None]
    ry = (gy.reshape(-1) - cam.cy[..., None]) / cam.fy[..., None]
    rz = jnp.ones_like(rx)
    return jnp.stack([rx, ry, rz], axis=-2)  # (..., 3, H*W)


def rescale_K(K_orig: np.ndarray, orig_wh, new_wh) -> np.ndarray:
    """Re-derive K for a resized image, the way the reference does it.

    The reference goes K -> (hfov, vfov) -> new K with the principal point
    at the image center (``scanNet.py:239-253``). This is NOT a plain
    per-axis scaling of K when the original principal point is off-center —
    we reproduce the exact fov-roundtrip.
    """
    K_orig = np.asarray(K_orig, dtype=np.float64)
    h_fov = math.atan(K_orig[0, 2] / K_orig[0, 0]) * 2.0
    v_fov = math.atan(K_orig[1, 2] / K_orig[1, 1]) * 2.0
    new_w, new_h = new_wh
    K = np.zeros((3, 3), dtype=np.float64)
    K[0, 0] = (new_w / 2.0) / math.tan(h_fov / 2.0)
    K[0, 2] = new_w / 2.0
    K[1, 1] = (new_h / 2.0) / math.tan(v_fov / 2.0)
    K[1, 2] = new_h / 2.0
    K[2, 2] = 1.0
    return K.astype(np.float32)


def intrinsics_for_size(K_orig: np.ndarray, orig_wh, img_wh, dpv_scale: float):
    """Return (Camera at DPV res, Camera at image res) for a trajectory.

    The test pipeline needs intrinsics both at DPV (1/4) resolution for the
    sweep/resample and at image resolution for the refined DPV export
    (reference builds two dataset instances for this, ``test_KVNet.py:138-154``).
    """
    img_w, img_h = img_wh
    dpv_w, dpv_h = int(img_w * dpv_scale), int(img_h * dpv_scale)
    K_dpv = rescale_K(K_orig, orig_wh, (dpv_w, dpv_h))
    K_img = rescale_K(K_orig, orig_wh, (img_w, img_h))
    return camera_from_K(K_dpv), camera_from_K(K_img)
