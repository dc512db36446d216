"""Building blocks shared by the D/K/R networks.

Torch-parity notes (for the weight-import path, see utils/torch_import.py):

- Convolutions use explicit torch-style padding tuples, NOT XLA 'SAME'.
  For stride-2 k=3 pad=1 the two conventions sample different pixel grids;
  explicit (1, 1) + VALID reproduces torch exactly.
- BatchNorm defaults to *batch statistics always* — the reference builds
  every BN with ``track_running_stats=False`` (psm_submodule.py:10-16), so
  the released weights expect batch stats even at eval.
- He init matches the reference's fan-out variant: std = sqrt(2 / (k*k*C_out))
  (basic.py:29-43).
- Transposed convs (k=4, s=2, p=1) are expressed as lhs-dilated convolutions
  and are initialized with the reference's broadcast bilinear kernel
  (Refine.py:121-132).

Layouts: NHWC for 2-D, NDHWC for 3-D.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def he_normal_fanout(kernel_hw: int, dims: int = 2):
    """std = sqrt(2 / (prod(kernel) * out_channels)) — reference init."""

    def init(key, shape, dtype=jnp.float32):
        # shape: (*kernel, in, out)
        k_prod = int(np.prod(shape[:dims]))
        n = k_prod * shape[-1]
        return jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / n)

    return init


def bilinear_deconv_init(key, shape, dtype=jnp.float32):
    """Bilinear kernel broadcast over (in, out) pairs (Refine.py:121-132)."""
    kh, kw = shape[0], shape[1]
    factor_h = (kh + 1) // 2
    center_h = factor_h - 1 if kh % 2 == 1 else factor_h - 0.5
    factor_w = (kw + 1) // 2
    center_w = factor_w - 1 if kw % 2 == 1 else factor_w - 0.5
    og = np.ogrid[:kh, :kw]
    k = (1 - abs(og[0] - center_h) / factor_h) * (1 - abs(og[1] - center_w) / factor_w)
    k = jnp.asarray(k, dtype)
    return jnp.broadcast_to(k[:, :, None, None], shape)


class BatchNorm(nn.Module):
    """Affine BatchNorm over all axes but the last (channel).

    With ``batch_stats=True`` (default) normalization always uses the current
    batch statistics — the exact semantics of the reference's
    ``track_running_stats=False`` BN at both train and eval time.
    """

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        red = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=red)
        var = jnp.mean(jnp.square(x - mean), axis=red)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


class Conv(nn.Module):
    """torch-style Conv2d/3d: explicit symmetric padding, optional dilation."""

    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    use_bias: bool = False
    dims: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dims
        kshape = (self.kernel,) * d + (x.shape[-1], self.features)
        w = self.param("kernel", he_normal_fanout(self.kernel, d), kshape)
        dn = ("NHWC", "HWIO", "NHWC") if d == 2 else ("NDHWC", "DHWIO", "NDHWC")
        y = jax.lax.conv_general_dilated(
            x[None].astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(self.stride,) * d,
            padding=((self.pad, self.pad),) * d,
            rhs_dilation=(self.dilation,) * d,
            dimension_numbers=dn,
        )[0]
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y.astype(x.dtype)


class ConvB(nn.Module):
    """Batched variant of Conv (leading N axis kept)."""

    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    use_bias: bool = False
    dims: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dims
        kshape = (self.kernel,) * d + (x.shape[-1], self.features)
        w = self.param("kernel", he_normal_fanout(self.kernel, d), kshape)
        dn = ("NHWC", "HWIO", "NHWC") if d == 2 else ("NDHWC", "DHWIO", "NDHWC")
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(self.stride,) * d,
            padding=((self.pad, self.pad),) * d,
            rhs_dilation=(self.dilation,) * d,
            dimension_numbers=dn,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y.astype(x.dtype)


class ConvBN(nn.Module):
    """convbn / convbn_3d[_bias] (psm_submodule.py:10-29): conv + BatchNorm
    (``use_bias=True`` = the convbn_3d_bias variant)."""

    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    dims: int = 2
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch: padding = dilation if dilation > 1 else pad
        pad = self.dilation if self.dilation > 1 else self.pad
        y = ConvB(
            self.features, self.kernel, self.stride, pad, self.dilation,
            use_bias=self.use_bias, dims=self.dims, dtype=self.dtype,
            name="conv",
        )(x)
        return BatchNorm(name="bn")(y)


class ConvTranspose(nn.Module):
    """torch ConvTranspose2d(k, s, p) as an lhs-dilated conv.

    out = (in - 1) * s - 2p + k. Kernel stored in (kh, kw, in, out) layout,
    already spatially flipped relative to torch (bilinear init is symmetric,
    so init parity holds; the torch importer flips explicitly).
    """

    features: int
    kernel: int = 4
    stride: int = 2
    pad: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kshape = (self.kernel, self.kernel, x.shape[-1], self.features)
        w = self.param("kernel", bilinear_deconv_init, kshape)
        p = self.kernel - 1 - self.pad
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(1, 1),
            padding=((p, p), (p, p)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y.astype(x.dtype)


class ConvTranspose3d(nn.Module):
    """torch ConvTranspose3d(k=3, s=2, p=1, output_padding=1, bias=False)
    as an lhs-dilated conv (doubles D, H, W). Kernel stored flipped
    relative to torch; the importer's deconv3d transform flips."""

    features: int
    kernel: int = 3
    stride: int = 2
    pad: int = 1
    out_pad: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kshape = (self.kernel,) * 3 + (x.shape[-1], self.features)
        w = self.param("kernel", he_normal_fanout(self.kernel, 3), kshape)
        lo = self.kernel - 1 - self.pad
        hi = lo + self.out_pad
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(1, 1, 1),
            padding=((lo, hi),) * 3,
            lhs_dilation=(self.stride,) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y.astype(x.dtype)


def upsample_nearest_3d(x: jax.Array, factor: int = 2) -> jax.Array:
    """torch nn.Upsample(scale_factor=2, mode='nearest') on (N,D,H,W,C)."""
    for ax in (1, 2, 3):
        x = jnp.repeat(x, factor, axis=ax)
    return x


def leaky_relu(x, slope: float = 0.01):
    """torch nn.LeakyReLU default slope."""
    return jnp.where(x >= 0, x, x * slope)


def avg_pool2d(x: jax.Array, window: int, stride: int | None = None) -> jax.Array:
    """torch AvgPool2d(window, stride=window): VALID padding, floor division.

    Restricted to the non-overlapping case (stride == window), which is all
    the reference uses. Implemented as crop + reshape + mean instead of
    reduce_window: identical numerics (VALID windows start at stride
    multiples, trailing partial window dropped) but avoids XLA's
    constant-folding of giant pooling-count tensors, which takes minutes on
    the CPU backend.

    x: (..., H, W, C).
    """
    assert stride is None or stride == window, "only stride==window supported"
    H, W, C = x.shape[-3], x.shape[-2], x.shape[-1]
    oh, ow = H // window, W // window
    lead = x.shape[:-3]
    y = x[..., : oh * window, : ow * window, :]
    y = y.reshape(lead + (oh, window, ow, window, C))
    return y.mean(axis=(-4, -2))


def linear_interp_matrix_ac(n_in: int, n_out: int) -> jax.Array:
    """(n_out, n_in) 1-D linear interpolation matrix, align_corners=True.

    Row o places bilinear weights at input position o*(n_in-1)/(n_out-1) —
    the torch ``F.upsample(..., align_corners=True)`` grid (exact identity
    when n_out == n_in). Separable N-D align-corners interpolation is a
    matmul with this per axis (rides the MXU instead of a gather)."""
    if n_out == 1 or n_in == 1:
        src = jnp.zeros((n_out,), jnp.float32)
    else:
        src = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 1)
    i1 = jnp.clip(i0 + 1, 0, n_in - 1)
    w1 = src - i0
    m = jnp.zeros((n_out, n_in), jnp.float32)
    m = m.at[jnp.arange(n_out), i0].add(1.0 - w1)
    m = m.at[jnp.arange(n_out), i1].add(w1)
    return m


def upsample_bilinear_ac(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear upsample with align_corners=True as two small matmuls.

    Matches ``F.upsample(..., mode='bilinear', align_corners=True)``
    (psm_submodule.py:149-159). x: (..., H, W, C) -> (..., H', W', C).
    Separable interpolation rides the MXU instead of a gather.
    """
    H, W = x.shape[-3], x.shape[-2]
    OH, OW = out_hw

    My = linear_interp_matrix_ac(H, OH)    # (OH, H)
    Mx = linear_interp_matrix_ac(W, OW)    # (OW, W)
    y = jnp.einsum("oh,...hwc->...owc", My, x)
    y = jnp.einsum("pw,...owc->...opc", Mx, y)
    return y
