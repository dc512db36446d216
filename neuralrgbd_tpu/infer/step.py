"""The jitted inference step (reference: test_utils/test_KVNet.py:19-67).

One call = one temporal-window forward + the Bayesian prediction resample for
the next frame. Batched over lanes (trajectories) with vmap; everything —
frames, poses, intrinsics, the DPV carry — is data, so a single compiled
executable serves every trajectory.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig
from neuralrgbd_tpu.models.kvnet import KVNet, KVNetOutput
from neuralrgbd_tpu.ops.camera import Camera
from neuralrgbd_tpu.ops.dpv import resample_dpv


def predict_next(dpv: jax.Array, pose_next: jax.Array, cam: Camera,
                 d_candi: jax.Array) -> jax.Array:
    """Resample the posterior DPV into the next reference frame's frustum.

    ``pose_next`` is the relative extrinsic current-ref -> next-ref; the
    resample needs the inverse (next-view points into the current volume),
    matching ``rel_Rt = Src_CamPoses[:, t_win_r].inverse()`` /
    ``cam_pose_next.inverse()`` (test_utils/test_KVNet.py:47-62), the
    log(1/D) padding and the (-1000, 0) clamp.

    On TPU this rides the fused Pallas kernel (5x: 31 -> 6 ms at the
    reference operating point); elsewhere the XLA oracle.
    """
    D = dpv.shape[0]
    rel = jnp.linalg.inv(pose_next)
    if jax.default_backend() == "tpu" and dpv.shape[2] <= 128:
        from neuralrgbd_tpu.ops.pallas.resample import resample_dpv_pallas

        return resample_dpv_pallas(
            dpv, rel, cam, d_candi,
            padding_value=math.log(1.0 / D),
            clamp_to=(-1000.0, 0.0),
        )
    if jax.default_backend() == "tpu":
        # W > 128 spans multiple lane tiles (Mosaic's dynamic_gather is
        # single-source-vreg-only): KITTI no-crop (W=192) and image-res
        # dpvs ride the tiled MXU kernel, whose in-jit fallback for
        # extreme motion is the oct-packed XLA gather (both exact).
        from neuralrgbd_tpu.ops.pallas.resample_tiled import (
            resample_dpv_wide)

        return resample_dpv_wide(
            dpv, rel, cam, d_candi,
            padding_value=math.log(1.0 / D),
            clamp_to=(-1000.0, 0.0),
        )
    return resample_dpv(
        dpv, rel, cam, d_candi,
        padding_value=math.log(1.0 / D),
        clamp_to=(-1000.0, 0.0),
    )


def make_frame_features(cfg: ModelConfig):
    """Single-frame feature extractor with PER-FRAME BN statistics.

    Returns ``fe1(params, frame (H,W,3)) -> (layer1 (H/2,W/2,32),
    feat (h,w,F))`` where ``params`` is the full KVNet variables dict.
    This is the window-independent featurization the cached-feature paths
    reuse across overlapping windows (deviation from basic.py:245-252's
    joint window statistics — see PERF.md "Cached-feature rollout").
    Resolves ``cfg.infer_dtype`` exactly like ``make_infer_step``.
    """
    import dataclasses

    from neuralrgbd_tpu.models.feature_extractor import FeatureExtractor

    if cfg.infer_dtype and jax.default_backend() == "tpu":
        cfg = dataclasses.replace(cfg, dtype=cfg.infer_dtype)
    fe = FeatureExtractor(feature_dim=cfg.feature_dim, multi_scale=True,
                          dtype=jnp.dtype(cfg.dtype))

    def fe1(params, frame):
        l1, f = fe.apply(
            {"params": params["params"]["feature_extractor"]}, frame[None])
        return l1[0], f[0]

    return fe1


class InferStepOutput(NamedTuple):
    dpv: jax.Array            # (N, D, h, w) fused posterior (low res)
    dpv_refined: jax.Array    # (N, D, H, W) refined DPV (image res)
    bv_predict: jax.Array     # (N, D, h, w) prediction for the next frame
    depth: jax.Array          # (N, H, W) E[d] from the refined DPV
    confidence: jax.Array     # (N, H, W) exp(max_d) from the refined DPV


def make_infer_step(cfg: ModelConfig, jit: bool = True,
                    fast_sweep: bool | None = None, sweep_band: int = 8,
                    fast_knet: bool | None = None,
                    paired_knet: bool | None = None,
                    packed_fe: bool | None = None,
                    coarse_knet: int | None = None,
                    with_features: bool = False):
    """Returns ``infer_step(params, batch, bv_predict, bv_valid)``.

    ``with_features=True`` returns instead
    ``infer_step(params, batch, bv_predict, bv_valid, feats)`` where
    ``feats = (layer1 (N,V+1,H/2,W/2,32), feat (N,V+1,h,w,F))`` in
    [srcs..., ref] order replaces the in-model feature extractor (the
    cached-feature rollout computes features once per frame).

    ``jit=False`` returns the raw traceable function (the parallel layer
    re-jits it with explicit mesh shardings).

    ``fast_sweep``/``sweep_band`` select the plane-sweep backend: None
    keeps the default (fused Pallas kernel on TPU). The inference loop
    plans these per trajectory from the actual poses
    (``infer/loop.plan_sweep``) so the fused kernel's band precondition is
    checked rather than assumed.

    batch dict (leading N = lanes):
      ref      (N, H, W, 3)   normalized reference frames
      srcs     (N, V, H, W, 3)
      poses    (N, V, 4, 4)   relative extrinsics ref->src
      K        (N, 3, 3)      intrinsics at DPV resolution
      pose_next (N, 4, 4)     relative extrinsic ref->next-ref
    """
    # TPU: fused Pallas sweep (inference has no grads through the warp) and
    # bfloat16 conv compute by default — validated on trained weights
    # (tools/eval_bf16.py / PERF.md: abs-rel +0.06% rel, delta1 -1e-4,
    # mean depth delta 3.9 mm; +8% throughput). cfg.infer_dtype=None keeps
    # the training dtype; CPU (the parity/test backend) always keeps it.
    if cfg.infer_dtype and jax.default_backend() == "tpu":
        import dataclasses

        cfg = dataclasses.replace(cfg, dtype=cfg.infer_dtype)
    # coarse_knet overrides cfg.knet_coarse_d for inference (the config
    # field is what training/fine-tuning reads). Default None keeps the
    # config value — exact reference semantics unless explicitly enabled
    # or the trained-weights accuracy gate flips the deployment config
    # (PERF.md "Coarse-D K-Net").
    if coarse_knet is not None and coarse_knet != cfg.knet_coarse_d:
        import dataclasses

        cfg = dataclasses.replace(cfg, knet_coarse_d=int(coarse_knet))
    if fast_sweep is None:
        fast_sweep = jax.default_backend() == "tpu"
    # fast_knet default OFF: the pair-packed chain measured 22.8 ms vs
    # XLA's 19.0 at the operating point — MXU-peak dots, but the BN-forced
    # inter-layer materialization + entry/exit segments eat the win
    # (PERF.md round-3 "K-Net conv attempt #2"). Kept as a tested opt-in.
    if fast_knet is None:
        fast_knet = False
    # paired_knet default ON on TPU: pure-XLA lane packing, exact conv
    # semantics, 19.2 -> 14.0 ms at the operating point (PERF.md round-3
    # "Paired-lane K-Net"). packed_fe is the same trick on the PSM
    # backbone's 32/64-channel stages — isolated FE win (5.03 -> 3.08 ms)
    # but an in-model NEGATIVE (full step 22.9 -> 27.8 ms, PERF.md
    # "Packed-lane FE"), so it stays an opt-in, default OFF.
    if paired_knet is None:
        paired_knet = jax.default_backend() == "tpu"
    if packed_fe is None:
        packed_fe = False
    model = KVNet(cfg=cfg, single_refine=True,
                  fast_sweep=fast_sweep, sweep_band=sweep_band,
                  fast_knet=fast_knet, paired_knet=paired_knet,
                  packed_fe=packed_fe)

    def one_lane(params, ref, srcs, poses, K, pose_next, bv_predict, bv_valid,
                 precomputed=None):
        cam = Camera(K=K)
        d_candi = jnp.asarray(cfg.d_candi)
        out: KVNetOutput = model.apply(
            params, ref, srcs, poses, cam, d_candi, bv_predict, bv_valid,
            precomputed=precomputed,
        )
        bv_next = predict_next(out.dpv, pose_next, cam, d_candi)
        if cfg.refine_net == "DGF":
            # the DGF head already emits a depth map at image resolution;
            # confidence comes from the low-res posterior, upsampled (the
            # reference defines no DGF export path — this mirrors the DPV
            # head's exp(max_d) definition at the DPV's native resolution)
            from neuralrgbd_tpu.models.layers import upsample_bilinear_ac

            depth = out.dpv_refined
            conf_lr = jnp.max(jnp.exp(out.dpv), axis=0)
            conf = upsample_bilinear_ac(conf_lr[..., None],
                                        depth.shape)[..., 0]
        else:
            # refined-DPV depth regression + confidence (export_res.py:43-62).
            # With refine_dup the refined DPV has 4*D bins over the matching
            # up4 label grid (config.d_candi_up4; see the note there about
            # the reference's mismatched regression grid).
            d_candi_r = (jnp.asarray(cfg.d_candi_up4) if cfg.refine_dup
                         else d_candi)
            p = jnp.exp(out.dpv_refined)
            depth = jnp.einsum("dhw,d->hw", p, d_candi_r)
            conf = jnp.max(p, axis=0)
        return out.dpv, out.dpv_refined, bv_next, depth, conf

    if with_features:
        def infer_step_f(params, batch, bv_predict, bv_valid,
                         feats) -> InferStepOutput:
            outs = jax.vmap(one_lane,
                            in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0))(
                params, batch["ref"], batch["srcs"], batch["poses"],
                batch["K"], batch["pose_next"], bv_predict, bv_valid, feats,
            )
            return InferStepOutput(*outs)

        if jit:
            return jax.jit(infer_step_f, donate_argnums=(2,))
        return infer_step_f

    def infer_step(params, batch, bv_predict, bv_valid) -> InferStepOutput:
        outs = jax.vmap(one_lane, in_axes=(None, 0, 0, 0, 0, 0, 0, 0))(
            params, batch["ref"], batch["srcs"], batch["poses"], batch["K"],
            batch["pose_next"], bv_predict, bv_valid,
        )
        return InferStepOutput(*outs)

    if jit:
        return jax.jit(infer_step, donate_argnums=(2,))
    return infer_step
