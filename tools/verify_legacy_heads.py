"""TPU drive of the legacy refine heads: finiteness + TPU-vs-CPU parity."""
import numpy as np, jax, jax.numpy as jnp
import os
if os.environ.get("HIGHEST"):
    jax.config.update("jax_default_matmul_precision", "highest")
from neuralrgbd_tpu.models import (RefineNet3D, RefineNetDeMoN,
                                   RefineNetUnet2D, RefineNetUNet3D)

rng = np.random.RandomState(0)
cpu = jax.devices("cpu")[0]

def check(model, *args):
    args_j = [jnp.asarray(a) for a in args]
    params = model.init(jax.random.PRNGKey(0), *args_j)
    out_tpu = np.asarray(jax.jit(model.apply)(params, *args_j))
    with jax.default_device(cpu):
        out_cpu = np.asarray(jax.jit(model.apply)(params, *args_j))
    assert np.isfinite(out_tpu).all()
    # TPU convs run at bf16-class default precision; compare against the
    # activation SCALE, not elementwise (near-zero outputs blow up rel err)
    scale = np.abs(out_cpu).max()
    rel = np.abs(out_tpu - out_cpu).max() / scale
    print(f"{type(model).__name__:<18s} out {out_tpu.shape}  scale-rel diff "
          f"{rel:.2e}", flush=True)
    assert rel < (1e-4 if os.environ.get("HIGHEST") else 3e-2)

check(RefineNetUnet2D(), rng.randn(1, 16, 24, 4).astype(np.float32),
      rng.randn(1, 64, 96, 3).astype(np.float32))
check(RefineNetDeMoN(), rng.rand(1, 16, 24, 1).astype(np.float32) * 3,
      rng.randn(1, 64, 96, 3).astype(np.float32))
check(RefineNet3D(in_channels=4),
      rng.randn(1, 8, 16, 24, 1).astype(np.float32),
      rng.randn(1, 8, 16, 24, 3).astype(np.float32))
check(RefineNetUNet3D(in_channels=4, res=True),
      rng.randn(1, 8, 16, 24, 1).astype(np.float32),
      rng.randn(1, 8, 16, 24, 3).astype(np.float32))
print("LEGACY HEADS TPU VERIFY PASS", flush=True)
