"""Legacy refinement heads (reference: models/Refine.py:135-585).

Four standalone refinement networks the reference ships but never wires
into KVNET (its ``refineNet_name`` only dispatches 'DPV'/'DGF',
KVNET.py:80-85) — kept here for full component parity, each
oracle-parity-tested against a directly constructed torch head on
identical weights+inputs (tests/test_refine_legacy.py):

- ``RefineNetUnet2D``  (Refine.py:135-214): 2-D U-Net refining DPV
  *statistics* + RGB -> full-res depth map.
- ``RefineNetDeMoN``   (Refine.py:216-286): DeMoN's refinement block on a
  low-res depth map + RGB.
- ``RefineNet3D``      (Refine.py:288-395): 3-D encoder/decoder with
  residual skips on a (D, H, W) volume; deconv or nearest upsampling.
- ``RefineNetUNet3D``  (Refine.py:397-490 'UNet_Res' at res=True,
  :491-585 'UNet' at res=False): 3-D U-Net with concat skips; the Res
  variant adds the input volume to the output, the plain variant applies
  a final ReLU inside the head.

Layouts channels-last: images (N, H, W, C), volumes (N, D, H, W, C);
the reference's NCHW/NCDHW ``cat(dim=1)`` becomes ``axis=-1``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from neuralrgbd_tpu.models.layers import (ConvB, ConvBN, ConvTranspose,
                                          ConvTranspose3d, leaky_relu,
                                          upsample_bilinear_ac,
                                          upsample_nearest_3d)


class _UNet2DCore(nn.Module):
    """Shared trunk of Unet2D / DeMoN (identical after conv0):
    32 -> 64(s2) -> 128(s2) -> deconvs with concat skips -> 1 channel."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, conv0_out, deep_in):
        # deep_in: conv0_1_out for Unet2D, conv0_out for DeMoN
        c = lambda f, s, n: ConvB(f, 3, s, 1, use_bias=True,
                                  dtype=self.dtype, name=n)
        conv1_out = leaky_relu(c(64, 2, "conv1")(deep_in))
        conv1_1 = leaky_relu(c(64, 1, "conv1_1")(conv1_out))
        conv2_out = leaky_relu(c(128, 2, "conv2")(conv1_1))
        conv2_1 = leaky_relu(c(128, 1, "conv2_1")(conv2_out))
        up0 = leaky_relu(ConvTranspose(64, 4, 2, 1, dtype=self.dtype,
                                       name="trans_conv0")(conv2_1))
        up1 = leaky_relu(ConvTranspose(
            32, 4, 2, 1, dtype=self.dtype, name="trans_conv1",
        )(jnp.concatenate([up0, conv1_1], axis=-1)))
        conv3_out = leaky_relu(c(16, 1, "conv3")(
            jnp.concatenate([up1, conv0_out], axis=-1)))
        return ConvB(1, 3, 1, 1, use_bias=True, dtype=self.dtype,
                     name="conv3_1")(conv3_out)


class RefineNetUnet2D(nn.Module):
    """Refine.py:135-214. forward(dpv_stats (N,h,w,S), img (N,H,W,3)) ->
    (N, H, W, 1) refined depth map. in_channels = 3 + S."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dpv_stats_lowres, img):
        H, W = img.shape[1:3]
        up = upsample_bilinear_ac(dpv_stats_lowres, (H, W))
        x = jnp.concatenate([img, up], axis=-1)
        conv0_out = leaky_relu(ConvB(32, 3, 1, 1, use_bias=True,
                                     dtype=self.dtype, name="conv0")(x))
        conv0_1 = leaky_relu(ConvB(32, 3, 1, 1, use_bias=True,
                                   dtype=self.dtype, name="conv0_1")(
                                       conv0_out))
        return _UNet2DCore(dtype=self.dtype, name="core")(conv0_out, conv0_1)


class RefineNetDeMoN(nn.Module):
    """Refine.py:216-286. forward(dmap (N,h,w,1), img (N,H,W,3)) ->
    (N, H, W, 1). Same trunk as Unet2D but a single input conv."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dmap_lowres, img):
        H, W = img.shape[1:3]
        up = upsample_bilinear_ac(dmap_lowres, (H, W))
        x = jnp.concatenate([img, up], axis=-1)
        conv0_out = leaky_relu(ConvB(32, 3, 1, 1, use_bias=True,
                                     dtype=self.dtype, name="conv0")(x))
        return _UNet2DCore(dtype=self.dtype, name="core")(conv0_out,
                                                          conv0_out)


class RefineNet3D(nn.Module):
    """Refine.py:288-395. 3-D enc-dec with RESIDUAL skips on NDHWC volumes.
    forward(vol (N,D,H,W,C1), img_vol (N,D,H,W,C2)), C1+C2 = in_channels;
    returns (N, D, H, W, 1). D/H/W must be divisible by 4."""

    in_channels: int
    deconv_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vol, img_vol):
        cin = self.in_channels
        x = jnp.concatenate([vol, img_vol], axis=-1)
        assert x.shape[-1] == cin

        cbnr = lambda f, s, n: ConvBN(f, 3, s, 1, dims=3, dtype=self.dtype,
                                      name=n)
        dw1 = nn.relu(cbnr(cin * 2, 2, "conv1")(x))
        dw1_r = nn.relu(cbnr(cin * 2, 1, "conv2")(dw1))
        dw2 = nn.relu(cbnr(cin * 2, 2, "conv3")(dw1_r))
        dw2_r = nn.relu(cbnr(cin * 2, 1, "conv4")(dw2))

        if self.deconv_upsample:
            from neuralrgbd_tpu.models.layers import BatchNorm

            u5 = BatchNorm(name="conv5_bn")(ConvTranspose3d(
                cin * 2, dtype=self.dtype, name="conv5")(dw2_r))
            up1 = nn.relu(u5 + dw1_r)
            u6 = BatchNorm(name="conv6_bn")(ConvTranspose3d(
                cin, dtype=self.dtype, name="conv6")(up1))
        else:
            u5 = cbnr(cin * 2, 1, "conv5")(upsample_nearest_3d(dw2_r))
            up1 = nn.relu(u5 + dw1_r)
            u6 = cbnr(cin, 1, "conv6")(upsample_nearest_3d(up1))
        up1_r = nn.relu(u6 + vol)

        h = nn.relu(cbnr(cin, 1, "classif1_0")(up1_r))
        return ConvB(1, 3, 1, 1, use_bias=False, dims=3, dtype=self.dtype,
                     name="classif1_1")(h)


class RefineNetUNet3D(nn.Module):
    """Refine.py:397-490 (res=True, 'UNet_Res', convbn without bias) /
    :491-585 (res=False, 'UNet', convbn WITH bias + final in-head ReLU).
    3-D U-Net with CONCAT skips and nearest upsampling on NDHWC volumes;
    returns (N, D, H, W, 1)."""

    in_channels: int
    res: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vol, img_vol):
        cin = self.in_channels
        bias = not self.res                     # UNet uses convbn_3d_bias
        x = jnp.concatenate([vol, img_vol], axis=-1)
        assert x.shape[-1] == cin

        cbnr = lambda f, s, n: ConvBN(f, 3, s, 1, dims=3, use_bias=bias,
                                      dtype=self.dtype, name=n)
        dw1 = nn.relu(cbnr(cin * 2, 2, "conv1")(x))
        dw1_r = nn.relu(cbnr(cin * 2, 1, "conv2")(dw1))
        dw2 = nn.relu(cbnr(cin * 4, 2, "conv3")(dw1_r))
        dw2_r = nn.relu(cbnr(cin * 4, 1, "conv4")(dw2))

        up1 = nn.relu(cbnr(cin * 2, 1, "conv5")(jnp.concatenate(
            [upsample_nearest_3d(dw2_r), dw1_r], axis=-1)))
        up1_r = nn.relu(cbnr(cin * 2, 1, "conv5_r")(up1))
        up2 = nn.relu(cbnr(cin, 1, "conv6")(jnp.concatenate(
            [upsample_nearest_3d(up1_r), x], axis=-1)))
        up2_r = nn.relu(cbnr(cin, 1, "conv6_r")(up2))
        out = ConvBN(1, 3, 1, 1, dims=3, use_bias=bias, dtype=self.dtype,
                     name="conv7")(up2_r)
        if self.res:
            return nn.relu(out + vol)           # Refine.py:487
        return nn.relu(out)                     # Refine.py:545 (in conv7)
