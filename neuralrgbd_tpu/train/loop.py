"""Host-side training loop (reference: train_KVNet.py:270-377).

Epochs -> trajectory batch groups -> per-frame steps with the DPV carry.
Per-lane validity replaces the reference's NaN-lane surgery: an invalid
window zeroes that lane's loss AND invalidates its carry for the next frame
(exactly the effect of ``fill_BVs_predict``/``get_valid_BVs``,
batch_loader.py:30-76). All-invalid steps are skipped on the host like the
reference's ``n_valid_batch == 0`` branch (train_KVNet.py:320-323).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.data.batch_loader import BatchScheduler
from neuralrgbd_tpu.train.step import TrainState, make_train_step
from neuralrgbd_tpu.utils.checkpoint import save_checkpoint
from neuralrgbd_tpu.utils.logging import MetricsWriter


def train_epochs(
    state: TrainState,
    cfg: ModelConfig,
    tcfg: TrainConfig,
    make_traj: Callable[[int], "Trajectory"],
    n_traj: int,
    batch_size: int,
    n_epoch: Optional[int] = None,
    train_step=None,
    log_dir: Optional[str] = None,
    save_dir: Optional[str] = None,
    max_steps: Optional[int] = None,
    verbose: bool = True,
    eval_every: Optional[int] = None,
    eval_fn: Optional[Callable] = None,
) -> TrainState:
    """``eval_fn(state, total_iter)`` runs every ``eval_every`` steps
    (periodic holdout evaluation without restarting the epoch stream)."""
    train_step = train_step or make_train_step(cfg, tcfg)
    writer = MetricsWriter(log_dir) if log_dir else None
    rng = jax.random.PRNGKey(tcfg.seed)

    n_epoch = n_epoch or tcfg.n_epoch
    total_iter = 0
    last_loss = float("nan")
    t_start = time.time()

    # per-step losses stay ON DEVICE and are fetched in one transfer every
    # flush: a float(loss) per step both pays a fixed host round-trip and
    # serializes the dispatch pipeline (the next step's host work can't
    # overlap the current step's compute)
    loss_buf: list = []

    def flush_losses():
        nonlocal last_loss
        if not loss_buf:
            return last_loss
        vals = np.asarray(jnp.stack([l for _, l in loss_buf]))
        if writer:
            for (it, _), v in zip(loss_buf, vals):
                writer.scalar("data/train_error", float(v), it)
        last_loss = float(vals[-1])
        loss_buf.clear()
        return last_loss

    for epoch in range(n_epoch):
        sched = BatchScheduler(make_traj, n_traj, batch_size,
                               t_win_r=cfg.t_win_r, seed=tcfg.seed + epoch,
                               augment=tcfg.augment)
        for group_idx, group in enumerate(sched):
            D = cfg.ndepth
            probe, _ = group.frame_batch(0)
            h, w = probe["dmap_digit"].shape[1:]
            bv_predict = jnp.full((batch_size, D, h, w), -np.log(D),
                                  jnp.float32)
            carry_valid = np.zeros(batch_size, bool)

            for frame_idx in range(group.traj_len):
                batch_np, refs = group.frame_batch(frame_idx)
                lane_valid = batch_np["lane_valid"]

                if lane_valid.sum() == 0:
                    carry_valid[:] = False
                    total_iter += 1
                    continue

                rng, step_key = jax.random.split(rng)
                batch = jax.tree.map(jnp.asarray, batch_np)
                out = train_step(state, batch, bv_predict,
                                 jnp.asarray(carry_valid), step_key)
                state = out.state
                bv_predict = out.bv_predict
                loss_buf.append((total_iter + 1, out.loss))
                # a lane's carry is only valid if THIS window was valid
                carry_valid = lane_valid.copy()
                total_iter += 1

                if writer and total_iter % tcfg.tb_add_img_interv == 0:
                    dl = np.asarray(out.depth_lowres[0])
                    gt = refs[0].dmap if refs[0].dmap is not None else dl
                    writer.image("train/depth_kv|gt",
                                 np.hstack([dl, gt]), total_iter)

                if total_iter % 20 == 0:
                    flush_losses()
                    if verbose:
                        fps = total_iter / (time.time() - t_start)
                        print(f"epoch {epoch} group {group_idx} frame "
                              f"{frame_idx}/{group.traj_len} iter "
                              f"{total_iter} loss {last_loss:.4f} "
                              f"({fps:.2f} it/s)", flush=True)

                if save_dir and total_iter % tcfg.save_model_interv == 0:
                    save_checkpoint(save_dir, int(state.step), state,
                                    extra={"epoch": epoch,
                                           "group": group_idx,
                                           "frame": frame_idx})

                if (eval_fn is not None and eval_every
                        and total_iter % eval_every == 0):
                    flush_losses()
                    eval_fn(state, total_iter)

                if max_steps is not None and total_iter >= max_steps:
                    flush_losses()
                    if save_dir:
                        save_checkpoint(save_dir, int(state.step), state)
                    if writer:
                        writer.close()
                    return state

    flush_losses()
    if save_dir:
        save_checkpoint(save_dir, int(state.step), state)
    if writer:
        writer.close()
    return state
