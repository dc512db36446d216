"""Measure the paired-lane K-Net (models/knet_paired.py) on the chip.

Two parts:

1. The channel-width characterization that motivated it: XLA's native
   conv3d rate as a function of C at constant FLOPs. Measured on v5e
   (slope-timed): C=64 46.9 TF/s, C=128 125.3 TF/s, C=256 ~129 TF/s —
   C=64 runs the 128-lane MXU half-empty, so packing two adjacent pixels
   into one channel row is a 2.67x rate win for 2x FLOPs.
2. The end-to-end K-Net: native XLA bf16 vs the paired-lane chain at the
   operating point (64x64x96, C_in=16), plus on-device parity.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_knet_paired.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")
from true_profile import slope_time  # noqa: E402

from neuralrgbd_tpu.models.knet import KNet  # noqa: E402
from neuralrgbd_tpu.models.knet_paired import knet_paired_apply  # noqa: E402


def channel_width_sweep():
    print("— conv3d rate vs channel width (constant FLOPs) —")
    D, H = 64, 64
    for C, W in [(64, 96), (128, 56), (128, 96), (256, 28)]:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, D, H, W, C).astype(np.float32)
                        ).astype(jnp.bfloat16)
        k = jnp.asarray((rng.randn(3, 3, 3, C, C) * 0.01).astype(np.float32)
                        ).astype(jnp.bfloat16)

        def conv(c, k=k):
            y = jax.lax.conv_general_dilated(
                c, k, (1, 1, 1), ((1, 1),) * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16)

        fl = D * H * W * 27 * C * C * 2
        slope_time(conv, x, label=f"conv3d C={C} W={W}", flops=fl)


def knet_end_to_end():
    print("— K-Net end to end (64x64x96, C_in=16) —")
    rng = np.random.RandomState(0)
    D, H, W, Ci = 64, 64, 96, 16
    FLOPS = 0.89e12
    vol = jnp.asarray(rng.randn(D, H, W, Ci).astype(np.float32))
    knet = KNet(feature_dim=64, dtype=jnp.bfloat16)
    params = knet.init(jax.random.PRNGKey(0), vol[None])

    def native_step(v):
        g = knet.apply(params, v[None])[0]
        return v + 1e-9 * g[..., None].astype(v.dtype)

    def paired_step(v):
        g = knet_paired_apply(params["params"], v)
        return v + 1e-9 * g[..., None].astype(v.dtype)

    slope_time(native_step, vol, label="KNet native XLA bf16", flops=FLOPS)
    slope_time(paired_step, vol, label="KNet paired-lane bf16", flops=FLOPS)

    ref = jax.jit(lambda v: knet.apply(params, v[None])[0])(vol)
    got = jax.jit(lambda v: knet_paired_apply(params["params"], v))(vol)
    d = np.abs(np.asarray(ref) - np.asarray(got))
    print(f"on-device parity (both bf16): max abs {d.max():.4f} "
          f"mean {d.mean():.5f} ref scale {float(jnp.abs(ref).mean()):.3f}")


if __name__ == "__main__":
    channel_width_sweep()
    knet_end_to_end()
