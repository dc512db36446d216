"""Multi-frame video rollout: lax.scan over the temporal recurrence.

The reference processes video frame-by-frame from Python with a host
round-trip per frame (test_KVNet.py:171-250) — on TPU that leaves the chip
idle between dispatches. Here the whole sliding-window sequence is scanned
on-device with the DPV carry donated in place; only the (small) per-frame
depth/confidence maps come back to the host. This is both the throughput
benchmark shape and the production serving path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig
from neuralrgbd_tpu.infer.step import make_infer_step


def make_rollout(cfg: ModelConfig, jit: bool = True,
                 fast_sweep: bool | None = None, sweep_band: int = 8):
    """Returns ``rollout(params, frames_batch, bv_predict0, bv_valid0)``.

    frames_batch: pytree with a leading time axis T over the per-step batch
    arrays (ref (T,N,H,W,3), srcs (T,N,V,H,W,3), poses, K, pose_next).
    Returns (depth (T,N,H,W), conf (T,N,H,W), final bv_predict).
    ``fast_sweep``/``sweep_band``: see ``make_infer_step``.
    """
    step = make_infer_step(cfg, jit=False, fast_sweep=fast_sweep,
                           sweep_band=sweep_band)

    def rollout(params, frames_batch, bv_predict0, bv_valid0):
        def body(carry, frame):
            bv_pred, bv_valid = carry
            out = step(params, frame, bv_pred, bv_valid)
            next_valid = jnp.ones_like(bv_valid)
            return (out.bv_predict, next_valid), (out.depth, out.confidence)

        (bv_final, _), (depths, confs) = jax.lax.scan(
            body, (bv_predict0, bv_valid0), frames_batch
        )
        return depths, confs, bv_final

    if jit:
        return jax.jit(rollout, donate_argnums=(2,))
    return rollout
