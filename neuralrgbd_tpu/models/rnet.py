"""R-Net: DPV refinement / 4x upsampling head.

Treats the D axis of exp(DPV) as feature channels and upsamples twice by 2x,
concatenating image features at each scale and the RGB guide at full
resolution, ending in a log-softmax over D
(``RefineNet_DPV_upsample``, models/Refine.py:24-132).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from neuralrgbd_tpu.models.layers import ConvB, ConvTranspose, leaky_relu


class RNet(nn.Module):
    """C0/C1/C2 = feature channels at 1/4, 1/2, 1/1 resolution."""

    D: int = 64
    upsample_D: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dpv_prob, feat_quarter, feat_half, img_full):
        """All inputs channels-last, batched: (N, h, w, D), (N, h, w, C0),
        (N, 2h, 2w, C1), (N, 4h, 4w, C2). Returns log-DPV (N, 4h, 4w, D')."""
        D0 = 2 * self.D if self.upsample_D else self.D
        D1 = 2 * D0 if self.upsample_D else self.D

        def conv_lrelu(x, ch, name):
            return leaky_relu(
                ConvB(ch, 3, 1, 1, use_bias=True, dtype=self.dtype, name=name)(x)
            )

        x = jnp.concatenate([dpv_prob, feat_quarter], axis=-1)
        c_in = x.shape[-1]
        x = conv_lrelu(x, c_in, "conv0")
        x = conv_lrelu(x, c_in, "conv0_1")
        x = leaky_relu(ConvTranspose(D0, 4, 2, 1, dtype=self.dtype,
                                     name="trans_conv0")(x))

        x = jnp.concatenate([x, feat_half], axis=-1)
        c1 = x.shape[-1]
        x = conv_lrelu(x, c1, "conv1")
        x = conv_lrelu(x, c1, "conv1_1")
        x = leaky_relu(ConvTranspose(D1, 4, 2, 1, dtype=self.dtype,
                                     name="trans_conv1")(x))

        x = jnp.concatenate([x, img_full], axis=-1)
        c2 = x.shape[-1]
        x = conv_lrelu(x, c2, "conv2")
        x = conv_lrelu(x, D1, "conv2_1")
        x = ConvB(D1, 3, 1, 1, use_bias=True, dtype=self.dtype, name="conv2_2")(x)
        return jax.nn.log_softmax(x, axis=-1)
