"""The jitted training step (reference: train_utils/train_KVNet.py:20-203).

One call = forward over all lanes, 4-term NLL loss, Adam update, and the
detached prediction resample that carries the recurrence to the next frame.
Lane validity (invalid poses / missing depth) is a boolean weight on the
loss, replacing the reference's dynamic batch-recomposition
(batch_loader.py:30-76) so the compiled graph is static.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.infer.step import predict_next
from neuralrgbd_tpu.models.kvnet import KVNet
from neuralrgbd_tpu.ops.camera import Camera
from neuralrgbd_tpu.ops.rotations import add_pose_noise
from neuralrgbd_tpu.train.loss import nll_dpv_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def make_lr_schedule(tcfg: TrainConfig):
    """LR schedule from TrainConfig (see config.py; 'constant' == the
    reference's fixed-LR Adam, train_KVNet.py:264). Returns an optax
    schedule (or the float LR for 'constant')."""
    if tcfg.lr_schedule == "constant" or tcfg.lr_decay_steps <= 0:
        if tcfg.lr_schedule not in ("constant", "cosine", "step"):
            raise ValueError(f"unknown lr_schedule: {tcfg.lr_schedule}")
        return tcfg.lr
    if tcfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if tcfg.lr_warmup_steps else tcfg.lr,
            peak_value=tcfg.lr,
            warmup_steps=tcfg.lr_warmup_steps,
            decay_steps=tcfg.lr_decay_steps,
            end_value=tcfg.lr * tcfg.lr_min_ratio,
        )
    if tcfg.lr_schedule == "step":
        return optax.exponential_decay(
            init_value=tcfg.lr, transition_steps=tcfg.lr_decay_steps,
            decay_rate=0.5, staircase=True)
    raise ValueError(f"unknown lr_schedule: {tcfg.lr_schedule}")


def create_train_state(cfg: ModelConfig, tcfg: TrainConfig, sample_batch,
                       rng: Optional[jax.Array] = None) -> TrainState:
    """Initialize params from one (host-side) sample batch."""
    rng = jax.random.PRNGKey(tcfg.seed) if rng is None else rng
    model = KVNet(cfg=cfg)
    D = cfg.ndepth
    h, w = sample_batch["ref"].shape[1] // 4, sample_batch["ref"].shape[2] // 4
    bvp = jnp.full((D, h, w), -jnp.log(float(D)), jnp.float32)
    params = model.init(
        rng,
        jnp.asarray(sample_batch["ref"][0]),
        jnp.asarray(sample_batch["srcs"][0]),
        jnp.asarray(sample_batch["poses"][0]),
        Camera(K=jnp.asarray(sample_batch["K"][0])),
        jnp.asarray(cfg.d_candi),
        bvp,
        jnp.asarray(True),
    )
    lr = make_lr_schedule(tcfg)
    tx = optax.adam(lr, b1=0.9, b2=0.999)  # train_KVNet.py:264
    if tcfg.grad_clip_max is not None:
        # the reference parsed --grad_clip but never applied it
        # (train_KVNet.py:143-145); here the flag actually works.
        tx = optax.chain(optax.clip_by_global_norm(tcfg.grad_clip_max), tx)
    return TrainState(step=jnp.asarray(0), params=params,
                      opt_state=tx.init(params), tx=tx)


class TrainStepOutput(NamedTuple):
    state: Any
    loss: jax.Array
    bv_predict: jax.Array   # (N, D, h, w) detached prediction for next frame
    depth_lowres: jax.Array  # (N, h, w) E[d] of the fused DPV (for logging)


def make_train_step(cfg: ModelConfig, tcfg: TrainConfig, jit: bool = True):
    """Returns ``train_step(state, batch, bv_predict, bv_valid, rng)``.

    ``jit=False`` returns the raw traceable function (the parallel layer
    re-jits it with explicit mesh shardings).

    batch dict (leading N = lanes):
      ref, srcs, poses, K, pose_next   — as in infer.step
      dmap_digit        (N, h, w) int32   digitized GT at DPV res
      dmap_imgsize_digit(N, H, W) int32   digitized GT at image res
      lane_valid        (N,) bool         pose/depth validity of the lane
    """
    model = KVNet(cfg=cfg)
    d_candi_np = cfg.d_candi

    def lane_loss(params, ref, srcs, poses, K, dmap_digit, dmap_img_digit,
                  dmap_imgsize, bv_predict, bv_valid):
        cam = Camera(K=K)
        d_candi = jnp.asarray(d_candi_np)
        out = model.apply(params, ref, srcs, poses, cam, d_candi,
                          bv_predict, bv_valid)
        if tcfg.loss_type == "NLL":
            # 4 NLL terms (train_utils/train_KVNet.py:103-118)
            loss = nll_dpv_loss(out.bv_cur, dmap_digit)
            loss += nll_dpv_loss(out.dpv_cur_refined, dmap_img_digit)
            fused = nll_dpv_loss(out.dpv, dmap_digit)
            fused += nll_dpv_loss(out.dpv_refined, dmap_img_digit)
            loss += jnp.where(bv_valid, fused, 0.0)
        elif tcfg.loss_type == "L1":
            # legacy L1 + variance branch (train_utils/train_KVNet.py:122-146)
            from neuralrgbd_tpu.train.loss import l1_variance_loss

            depth_cur = jnp.einsum("dhw,d->hw",
                                   jnp.exp(out.dpv_cur_refined), d_candi)
            loss = l1_variance_loss(depth_cur, dmap_imgsize, out.bv_cur,
                                    d_candi, tcfg.weight_var)
            depth_kv = jnp.einsum("dhw,d->hw",
                                  jnp.exp(out.dpv_refined), d_candi)
            fused = l1_variance_loss(depth_kv, dmap_imgsize, out.dpv,
                                     d_candi, tcfg.weight_var)
            loss += jnp.where(bv_valid, fused, 0.0)
        else:
            raise ValueError(f"unknown loss_type: {tcfg.loss_type}")
        return loss, out.dpv

    def batch_loss(params, batch, bv_predict, bv_valid):
        # refine_dup: the image-size NLL terms train against the 4*D-bin
        # labels (train_utils/train_KVNet.py:107-108)
        img_digit = (batch["dmap_up4_imgsize_digit"] if cfg.refine_dup
                     else batch["dmap_imgsize_digit"])
        losses, dpvs = jax.vmap(
            lane_loss, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0, 0)
        )(params, batch["ref"], batch["srcs"], batch["poses"], batch["K"],
          batch["dmap_digit"], img_digit,
          batch["dmap_imgsize"], bv_predict, bv_valid)
        w = batch["lane_valid"].astype(losses.dtype)
        # mean over valid lanes == reference's loss/nGPU with nGPU=n_valid
        loss = jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, dpvs

    def train_step(state: TrainState, batch, bv_predict, bv_valid,
                   rng) -> TrainStepOutput:
        if tcfg.pose_noise_level > 0:
            batch = dict(batch)
            batch["poses"] = add_pose_noise(
                rng, batch["poses"], tcfg.pose_noise_level
            )
        (loss, dpvs), grads = jax.value_and_grad(batch_loss, has_aux=True)(
            state.params, batch, bv_predict, bv_valid
        )
        new_state = state.apply_gradients(grads)

        # prediction for the next frame, outside the grad graph == .detach()
        # TBPTT of length one (train_utils/train_KVNet.py:155-171)
        d_candi = jnp.asarray(d_candi_np)

        def lane_predict(dpv, pose_next, K):
            return predict_next(dpv, pose_next, Camera(K=K), d_candi)

        bv_next = jax.vmap(lane_predict)(dpvs, batch["pose_next"], batch["K"])
        depth_low = jnp.einsum("ndhw,d->nhw", jnp.exp(dpvs), d_candi)
        return TrainStepOutput(new_state, loss, bv_next, depth_low)

    if jit:
        return jax.jit(train_step, donate_argnums=(2,))
    return train_step
