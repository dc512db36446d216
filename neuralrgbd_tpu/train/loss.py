"""Training losses.

The reference trains with 4 NLL terms over digitized depth bins with
ignore_index=0 (train_utils/train_KVNet.py:103-118) plus a legacy L1+variance
branch (:122-146). Bin 0 means "depth below d_candi[0]" — i.e. masked/invalid
pixels, which the loaders zero out (scanNet.py:373-405).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nll_dpv_loss(log_dpv: jax.Array, labels: jax.Array,
                 ignore_index: int = 0) -> jax.Array:
    """Mean NLL of the label bin, ignoring ``ignore_index`` pixels.

    log_dpv: (D, H, W) log-probabilities; labels: (H, W) int bins in [0, D-1].
    Matches ``F.nll_loss(..., ignore_index=0)`` mean reduction: sum over
    non-ignored pixels / count of non-ignored pixels (0 if none).
    """
    D = log_dpv.shape[0]
    labels = jnp.clip(labels, 0, D - 1)
    picked = jnp.take_along_axis(log_dpv, labels[None], axis=0)[0]  # (H, W)
    mask = (labels != ignore_index).astype(log_dpv.dtype)
    n = jnp.sum(mask)
    return -jnp.sum(picked * mask) / jnp.maximum(n, 1.0)


def l1_variance_loss(dpv_refined_depth, dmap_imgsize, dpv_low, d_candi,
                     weight_var: float = 1e-3):
    """Legacy L1 + variance loss branch (train_utils/train_KVNet.py:122-146).

    dpv_refined_depth: (H, W) regressed depth at image size;
    dmap_imgsize: (H, W) metric GT (0 = invalid);
    dpv_low: (D, h, w) log-DPV for the variance regularizer.
    """
    from neuralrgbd_tpu.ops.dpv import depth_regression, depth_variance

    mask = (dmap_imgsize > 0).astype(dpv_refined_depth.dtype)
    l1 = jnp.sum(jnp.abs(dpv_refined_depth - dmap_imgsize) * mask) / jnp.maximum(
        jnp.sum(mask), 1.0
    )
    dm = depth_regression(dpv_low, d_candi)
    var = jnp.mean(depth_variance(dpv_low, dm, d_candi))
    return l1 + weight_var * var
