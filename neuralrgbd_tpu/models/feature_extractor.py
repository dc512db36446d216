"""PSMNet-style spatial-pyramid feature extractor (the D-Net backbone).

Structural parity with ``/root/reference/code/models/psm_submodule.py:76-167``
including the deliberate deviations from the PSM paper noted there
(layer3 dilation 1, layer4 dilation 2 — comments at :97-101) and the
*missing* final ReLU of the residual blocks (:41-49).

Input: (B, H, W, 3). Outputs: (layer1 (B, H/2, W/2, 32),
final (B, H/4, W/4, feature_dim)) when ``multi_scale``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from neuralrgbd_tpu.models.layers import (
    ConvB,
    ConvBN,
    avg_pool2d,
    upsample_bilinear_ac,
)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ConvBN(self.planes, 3, self.stride, 1, self.dilation,
                     dtype=self.dtype, name="conv1")(x)
        out = nn.relu(out)
        out = ConvBN(self.planes, 3, 1, 1, self.dilation,
                     dtype=self.dtype, name="conv2")(out)
        if self.downsample:
            x = ConvB(self.planes, 1, self.stride, 0, use_bias=False,
                      dtype=self.dtype, name="down_conv")(x)
            from neuralrgbd_tpu.models.layers import BatchNorm

            x = BatchNorm(name="down_bn")(x)
        return out + x  # NOTE: no ReLU after the add (psm_submodule.py:41-49)


class FeatureExtractor(nn.Module):
    feature_dim: int = 64
    multi_scale: bool = True
    dtype: jnp.dtype = jnp.float32

    def _layer(self, x, planes, blocks, stride, dilation, name):
        down = stride != 1 or x.shape[-1] != planes
        x = BasicBlock(planes, stride, dilation, downsample=down,
                       dtype=self.dtype, name=f"{name}_0")(x)
        for i in range(1, blocks):
            x = BasicBlock(planes, 1, dilation, downsample=False,
                           dtype=self.dtype, name=f"{name}_{i}")(x)
        return x

    @nn.compact
    def __call__(self, x):
        # firstconv: stride-2 then two stride-1 convbn+relu
        y = nn.relu(ConvBN(32, 3, 2, 1, dtype=self.dtype, name="first0")(x))
        y = nn.relu(ConvBN(32, 3, 1, 1, dtype=self.dtype, name="first1")(y))
        y = nn.relu(ConvBN(32, 3, 1, 1, dtype=self.dtype, name="first2")(y))

        layer1 = self._layer(y, 32, 3, 1, 1, "layer1")        # H/2, 32ch
        raw = self._layer(layer1, 64, 16, 2, 1, "layer2")     # H/4, 64ch
        l3 = self._layer(raw, 128, 3, 1, 1, "layer3")
        skip = self._layer(l3, 128, 3, 1, 2, "layer4")        # dilation 2

        H, W = skip.shape[-3], skip.shape[-2]
        branches = []
        for i, pool in enumerate((64, 32, 16, 8)):
            # The reference's fixed pool sizes assume >=64px feature maps
            # (psm_submodule.py:103-117). Clamp so smaller inputs degrade to
            # global pooling instead of zero-size windows; exact parity at
            # the reference operating point (96x64 features).
            pool = min(pool, H, W)
            b = avg_pool2d(skip, pool)
            b = nn.relu(ConvBN(32, 1, 1, 0, dtype=self.dtype,
                               name=f"branch{i}")(b))
            b = upsample_bilinear_ac(b, (H, W))
            branches.append(b)

        # concat order: raw, skip, branch4(8), branch3(16), branch2(32), branch1(64)
        feat = jnp.concatenate(
            [raw, skip, branches[3], branches[2], branches[1], branches[0]],
            axis=-1,
        )  # 320 ch
        feat = nn.relu(ConvBN(128, 3, 1, 1, dtype=self.dtype, name="last0")(feat))
        feat = ConvB(self.feature_dim, 1, 1, 0, use_bias=False,
                     dtype=self.dtype, name="last1")(feat)

        if self.multi_scale:
            return layer1, feat
        return feat
