"""Checkpoint save/restore (orbax).

Reference contract (train_KVNet.py:339-348, utils/models.py:39-59):
periodic checkpoints carrying {iter, state_dict, optimizer, loss} with
filtered partial restore. Here: orbax checkpoints of the full TrainState
plus the data-loader cursor, and a partial-restore helper for warm starts.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ckpt_dir(base: str, step: int) -> str:
    return os.path.join(os.path.abspath(base), f"ckpt_{step:08d}")


def save_checkpoint(base_dir: str, step: int, state, extra: Optional[dict] = None):
    """Save params/opt_state (+ loop cursor in ``extra``) at ``step``."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(base_dir, step)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
    }
    if extra:
        payload["extra"] = extra
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(base_dir: str) -> Optional[str]:
    if not os.path.isdir(base_dir):
        return None
    cands = sorted(d for d in os.listdir(base_dir) if d.startswith("ckpt_"))
    return os.path.join(os.path.abspath(base_dir), cands[-1]) if cands else None


def restore_checkpoint(path: str, state):
    """Restore into an existing TrainState template (same structure)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": 0,
    }
    try:
        payload = ckptr.restore(path, template)
    except Exception:
        template["extra"] = {}
        payload = ckptr.restore(path, template)
    new_state = state.replace(
        params=payload["params"],
        opt_state=payload["opt_state"],
        step=jax.numpy.asarray(payload["step"]),
    )
    return new_state, payload.get("extra", {})


def restore_params_only(path: str, state):
    """Restore ONLY the params (+ step, parsed from the ckpt dir name) into
    ``state``, leaving opt_state untouched. For inference/eval consumers:
    tolerant of optimizer-structure changes between save and restore (e.g.
    a checkpoint trained with an LR schedule restored into a constant-LR
    template — ``restore_checkpoint`` requires identical opt_state pytrees).
    Asserts every params leaf was found with matching shape."""
    import jax.numpy as jnp

    params, n_hit = restore_params_partial(path, state.params)
    n_total = len(jax.tree_util.tree_leaves(state.params))
    if n_hit != n_total:
        raise ValueError(
            f"params-only restore from {path}: matched {n_hit}/{n_total} "
            "leaves — checkpoint params do not cover the model")
    tail = os.path.basename(os.path.normpath(path))
    step = int(tail.split("_")[-1]) if tail.startswith("ckpt_") else 0
    return state.replace(params=params, step=jnp.asarray(step))


def restore_params_partial(path: str, params):
    """Filtered partial restore: keep the checkpoint's leaf wherever the
    path exists with matching shape, else the template's (the semantics of
    ``load_pretrained_model``'s filtered state-dict load,
    utils/models.py:39-59)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    loaded = ckptr.restore(os.path.join(path, "params")
                           if os.path.isdir(os.path.join(path, "params"))
                           else path)
    if isinstance(loaded, dict) and "params" in loaded:
        loaded = loaded["params"]

    flat_t = dict(jax.tree_util.tree_flatten_with_path(params)[0] and
                  {jax.tree_util.keystr(p): (p, v) for p, v in
                   jax.tree_util.tree_flatten_with_path(params)[0]})
    flat_l = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_flatten_with_path(loaded)[0]}

    out = {}
    n_hit = 0
    for key, (p, v) in flat_t.items():
        lv = flat_l.get(key)
        if lv is not None and np.shape(lv) == np.shape(v):
            out[key] = lv
            n_hit += 1
        else:
            out[key] = v
    leaves = [out[jax.tree_util.keystr(p)] for p, _ in
              jax.tree_util.tree_flatten_with_path(params)[0]]
    treedef = jax.tree_util.tree_structure(params)
    # Commit the restored leaves to device NOW: orbax returns host numpy
    # arrays, and passing those into a jitted step re-uploads the ENTIRE
    # param set on EVERY dispatch (~0.5-1 s/call through this
    # environment's ~37 MB/s tunnel — the round-5 LBA-pipeline
    # pathology). device_put once makes every later dispatch zero-copy.
    tree = jax.device_put(jax.tree_util.tree_unflatten(treedef, leaves))
    return tree, n_hit
