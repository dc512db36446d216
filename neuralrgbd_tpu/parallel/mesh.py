"""Device mesh + sharded train/infer steps.

The reference's entire distribution story is single-process multi-GPU
``torch.nn.DataParallel`` with one trajectory per GPU
(train_KVNet.py:261-262, docs/TR.md:14). The TPU-native equivalent is a 1-D
``data`` mesh over ICI: each lane (= trajectory) lives on one chip, model
params are replicated, and the gradient all-reduce that DataParallel did
implicitly becomes the psum XLA inserts for the replicated-output grads.
No hand-written communication — the mesh IS the comm backend.

Scaling axes beyond DP (TP over the K-Net's D axis, spatial DPV sharding)
are deliberate design space, not parity requirements (SURVEY.md section 2.3);
the mesh helper accepts extra axes so they can be added without API churn.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.infer.step import InferStepOutput
from neuralrgbd_tpu.train.step import TrainStepOutput


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        # fall back to the (virtual) CPU backend for mesh emulation
        devs = jax.devices("cpu")
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a lanes-leading batch pytree with lanes split over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def _data_sharded_like(mesh, axis):
    return NamedSharding(mesh, P(axis))


def make_sharded_train_step(cfg: ModelConfig, tcfg: TrainConfig, mesh: Mesh,
                            axis: str = "data"):
    """Train step jitted with explicit DP shardings over ``mesh``.

    params/opt_state replicated; batch, DPV carry, and validity sharded over
    lanes. XLA inserts the gradient all-reduce (psum over ICI) because the
    output state is replicated while the loss terms are lane-sharded.
    """
    from neuralrgbd_tpu.train.step import make_train_step

    inner = make_train_step(cfg, tcfg, jit=False)

    data = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    # every batch leaf is lane-leading, so one data sharding applies as a
    # pytree prefix to the whole dict (keeps the key set open — e.g. the
    # optional refine_dup labels)
    return jax.jit(
        inner,
        in_shardings=(repl, data, data, data, repl),
        out_shardings=TrainStepOutput(repl, repl, data, data),
        donate_argnums=(2,),
    )


def make_sharded_infer_step(cfg: ModelConfig, mesh: Mesh, axis: str = "data"):
    from neuralrgbd_tpu.infer.step import make_infer_step

    inner = make_infer_step(cfg, jit=False)
    data = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        inner,
        in_shardings=(repl, data, data, data),
        out_shardings=InferStepOutput(data, data, data, data, data),
        donate_argnums=(2,),
    )
