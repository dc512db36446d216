"""Depth Probability Volume (DPV) algebra.

The DPV is a per-pixel categorical distribution over ``D`` depth hypotheses,
kept in log-scale (log-softmax) throughout. This module implements:

- ``resample_dpv``      the Bayesian-filter *prediction* step: forward-warp
                        the posterior DPV into the next camera's frustum by
                        trilinear resampling (``resample_vol_cuda``,
                        homography.py:654-723).
- ``depth_regression``  E[d] over the DPV (``mutils/misc.py:532-548``).
- ``depth_variance``    per-pixel depth variance (``mutils/misc.py:550-572``).
- ``confidence_map``    exp(max_d DPV) (``export_res.py:58-62``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.ops.camera import Camera, unit_rays
from neuralrgbd_tpu.ops.sampling import grid_sample_3d, normalized_to_pixel


def depth_regression(dpv: jax.Array, d_candi: jax.Array,
                     log_scale: bool = True) -> jax.Array:
    """E[d]: sum_d p(d) * d. dpv: (..., D, H, W) -> (..., H, W)."""
    p = jnp.exp(dpv) if log_scale else dpv
    return jnp.einsum("...dhw,d->...hw", p, d_candi)


def depth_variance(dpv: jax.Array, depth_mean: jax.Array, d_candi: jax.Array,
                   log_scale: bool = True, d_sigma: float = 1.0) -> jax.Array:
    """Reference's (idiosyncratic) depth variance (mutils/misc.py:550-572):

    var = mean_d (p(d)*d - E[d])^2 / (2*d_sigma^2)

    Note p(d)*d (not d) inside the square — kept for parity since the L1
    training loss regularizes exactly this quantity.
    """
    p = jnp.exp(dpv) if log_scale else dpv
    D = d_candi.shape[0]
    sq = (p * d_candi[..., :, None, None] - depth_mean[..., None, :, :]) ** 2
    return jnp.sum(sq, axis=-3) / (2.0 * d_sigma**2) / D


def confidence_map(dpv: jax.Array, log_scale: bool = True) -> jax.Array:
    """Per-pixel confidence = probability of the argmax depth bin."""
    m = jnp.max(dpv, axis=-3)
    return jnp.exp(m) if log_scale else m


def _set_vol_border(vol: jax.Array, border_val) -> jax.Array:
    """Set all six faces of a (D, H, W) volume to ``border_val``.

    Mirrors ``_set_vol_border`` (homography.py:873-887): combined with
    'border' padding this makes every out-of-frustum sample decay toward the
    padding value (uniform prior log(1/D)) instead of extending edge beliefs.
    """
    D, H, W = vol.shape
    di = jnp.arange(D).reshape(D, 1, 1)
    hi = jnp.arange(H).reshape(1, H, 1)
    wi = jnp.arange(W).reshape(1, 1, W)
    border = (
        (di == 0) | (di == D - 1)
        | (hi == 0) | (hi == H - 1)
        | (wi == 0) | (wi == W - 1)
    )
    return jnp.where(border, jnp.asarray(border_val, vol.dtype), vol)


def resample_dpv(
    dpv: jax.Array,        # (D, H, W) log-DPV in the *current* ref view
    rel_Rt: jax.Array,     # (4, 4) extrinsic: current ref view -> next view
    cam: Camera,
    d_candi: jax.Array,    # (D,)
    padding_value: float,
    clamp_to: tuple = (-1000.0, 0.0),
    gather_method: str | None = None,
) -> jax.Array:
    """Prediction step: resample the DPV into the next camera frustum.

    For every voxel (d, h, w) of the *output* (next-view) volume, back-project
    the point d * ray(h, w), transform by ``rel_Rt``, and trilinearly sample
    the source volume at

        gx = X/Z / tan(hfov/2),  gy = Y/Z / tan(vfov/2),
        gz = (Z - z_mid) / z_half_range

    with border padding after writing ``padding_value`` on the volume faces —
    the exact ``resample_vol_cuda`` recipe (homography.py:673-718), followed
    by the caller-side clamp(max=0, min=-1000) of the train/test steps
    (train_utils/train_KVNet.py:161-171).
    """
    D, H, W = dpv.shape
    rays = unit_rays(cam, H, W)                      # (3, HW)
    pts = rays[None, :, :] * d_candi.reshape(-1, 1, 1)  # (D, 3, HW)
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

    coords = jnp.stack(
        [
            normalized_to_pixel(gx, W),
            normalized_to_pixel(gy, H),
            normalized_to_pixel(gz, D),
        ],
        axis=-1,
    )  # (D, HW, 3)

    vol = _set_vol_border(dpv, padding_value)
    out = grid_sample_3d(vol, coords, padding="border",
                         method=gather_method).reshape(D, H, W)
    if clamp_to is not None:
        out = jnp.clip(out, clamp_to[0], clamp_to[1])
    return out


def uniform_dpv(D: int, H: int, W: int, dtype=jnp.float32) -> jax.Array:
    """log(1/D) everywhere — the 'no information' DPV used to (re)start the
    recurrence and to fill invalid lanes (batch_loader.py:30-43 did this with
    NaNs; we use the uniform prior so the jitted graph stays NaN-free)."""
    return jnp.full((D, H, W), -jnp.log(jnp.asarray(D, dtype)), dtype=dtype)


def dpv_statistics(dpv: jax.Array, d_candi: jax.Array,
                   statistics=("E_mean", "variance", "max", "min"),
                   log_scale: bool = True) -> jax.Array:
    """Per-pixel DPV feature maps (mutils/misc.py:574-608).

    dpv: (..., D, H, W) -> (..., len(statistics), H, W) stacked features.
    """
    p = jnp.exp(dpv) if log_scale else dpv
    feats = []
    mean = None
    for name in statistics:
        if name == "E_mean":
            mean = jnp.einsum("...dhw,d->...hw", p, d_candi)
            feats.append(mean)
        elif name == "variance":
            if mean is None:
                mean = jnp.einsum("...dhw,d->...hw", p, d_candi)
            feats.append(depth_variance(dpv, mean, d_candi,
                                        log_scale=log_scale))
        elif name == "max":
            feats.append(jnp.max(p, axis=-3))
        elif name == "min":
            feats.append(jnp.min(p, axis=-3))
        else:
            raise ValueError(f"unknown dpv statistic: {name}")
    return jnp.stack(feats, axis=-3)
