"""K-Net: the 3-D CNN that approximates the Kalman gain.

Gain = KV_NET(h_t - W h_{t-1}) — a residual stack of five 3x3x3
convbn3d pairs with additive skips plus a single-channel classify head
(``models/basic.py:53-139``). Layout is NDHWC (D folded as the leading
spatial axis); channels=64 keeps the MXU fed.

``up_sample_ratio`` ports the reference's optional trilinear D-upsample of
the gain volume (``basic.py:128-139``: classify at coarse D, then
``F.upsample(res_volume, (ratio*D, H, W), mode='trilinear',
align_corners=True)``). H and W are unchanged, so with align_corners=True
the trilinear interpolation is exactly a 1-D linear interpolation along D —
here one small (ratio*D, D) matmul. Dead at every reference call site
(``d_upsample_ratio_KV_net=None``), ported for completeness and as the
upsample half of the coarse-D K-Net fast path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from neuralrgbd_tpu.models.layers import (ConvB, ConvBN,
                                          linear_interp_matrix_ac)


class KNet(nn.Module):
    feature_dim: int = 64
    dtype: jnp.dtype = jnp.float32
    up_sample_ratio: Optional[int] = None

    @nn.compact
    def __call__(self, vol):
        """vol: (N, D, H, W, C_in) -> (N, D', H, W) gain volume
        (D' = up_sample_ratio*D when set, else D)."""
        f = self.feature_dim

        def convbn3d(x, name):
            return ConvBN(f, 3, 1, 1, dims=3, dtype=self.dtype, name=name)(x)

        cost0 = nn.relu(convbn3d(vol, "dres0_0"))
        cost0 = nn.relu(convbn3d(cost0, "dres0_1"))

        def res_pair(x, name):
            y = nn.relu(convbn3d(x, f"{name}_0"))
            y = convbn3d(y, f"{name}_1")
            return y + x

        cost1 = res_pair(cost0, "dres1")
        cost2 = res_pair(cost1, "dres2")
        cost3 = res_pair(cost2, "dres3")
        cost4 = res_pair(cost3, "dres4")

        out = nn.relu(convbn3d(cost4, "classify_0"))
        out = ConvB(1, 3, 1, 1, dims=3, use_bias=False, dtype=self.dtype,
                    name="classify_1")(out)
        out = out[..., 0]                         # (N, D, H, W)
        if self.up_sample_ratio is not None:
            # basic.py:135-138 (trilinear over (ratio*D, H, W),
            # align_corners=True == linear along D; see module docstring)
            D = out.shape[1]
            M = linear_interp_matrix_ac(D, self.up_sample_ratio * D)
            out = jnp.einsum("od,ndhw->nohw", M,
                             out.astype(jnp.float32))
        return out
