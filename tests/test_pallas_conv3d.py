"""Parity of the experimental Pallas conv3d kernel vs the XLA oracle.

The kernel is a documented negative result on current Mosaic (PERF.md) and
is not wired into the model; these tests pin its im2col layout math so it
stays a correct starting point for future re-evaluation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.ops.pallas.conv3d import _oracle_conv, conv3d_3x3x3


@pytest.mark.parametrize("shape", [(4, 6, 10, 8, 16), (5, 8, 12, 16, 8),
                                   (3, 4, 4, 8, 8)])
def test_conv3d_matches_oracle(shape, rng):
    D, H, W, C, N = shape
    x = jnp.asarray(rng.randn(D, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, C, N).astype(np.float32) * 0.1)
    want = _oracle_conv(x, w)
    got = conv3d_3x3x3(x, w, True)
    # operands are rounded to bf16 at the (interpreted) MXU — matching the
    # default precision class of XLA's fp32 conv on real TPUs
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale, atol=6e-3)


def test_conv3d_custom_vjp_matches_oracle_grads(rng):
    D, H, W, C, N = 3, 4, 6, 8, 8
    x = jnp.asarray(rng.randn(D, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, C, N).astype(np.float32) * 0.1)

    # cotangent applied to the raw output => grads must be the oracle's own
    g = jnp.asarray(rng.randn(D, H, W, N).astype(np.float32))
    gx1, gw1 = jax.grad(
        lambda x, w: jnp.sum(conv3d_3x3x3(x, w, True) * g), (0, 1))(x, w)
    gx2, gw2 = jax.grad(
        lambda x, w: jnp.sum(_oracle_conv(x, w) * g), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-5,
                               atol=1e-5)
