"""The full KV-Net: D-Net measurement + K-Net temporal fusion + R-Net refine.

Functional parity with ``/root/reference/code/models/KVNET.py`` and
``D_NET_BASIC`` (``basic.py:141-323``), redesigned for XLA:

- operates on a SINGLE lane (trajectory); the step layer vmaps over lanes —
  this replaces the reference's "N=1 per GPU" DataParallel contract
  (KVNET.py:110-116) and keeps BatchNorm statistics per-lane identical
  (BN sees the V+1 frames of one trajectory, exactly as on one GPU);
- camera intrinsics are *arguments*, not constructor state (the reference
  overrides its constructor intrinsics at every call — basic.py:280-289);
- temporal-recurrence validity is an explicit boolean, not a NaN probe
  (``m_misc.valid_dpv``); the K-Net branch always runs (static graph) and
  ``jnp.where`` selects, so the first frame costs one wasted K-Net pass
  instead of a recompile;
- all warps ride the shared ops.sweep/ops.dpv geometry core.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neuralrgbd_tpu.config import ModelConfig
from neuralrgbd_tpu.models.feature_extractor import FeatureExtractor
from neuralrgbd_tpu.models.knet import KNet
from neuralrgbd_tpu.models.rnet import RNet
from neuralrgbd_tpu.models.layers import avg_pool2d
from neuralrgbd_tpu.ops.camera import Camera
from neuralrgbd_tpu.ops.sweep import sweep_cost_volume, warp_to_ref_over_depths


class KVNetOutput(NamedTuple):
    """All DPVs are log-scale. Low-res DPVs are (D, h, w); refined DPVs are
    (D, H, W) at image resolution — except with ``refine_net='DGF'``, where
    the refined fields are (H, W) depth maps (KVNET.py:127-134,175-182)."""

    bv_cur: jax.Array           # D-Net measurement
    dpv: jax.Array              # fused posterior (== bv_cur on first frame)
    dpv_cur_refined: jax.Array  # R-Net(bv_cur)
    dpv_refined: jax.Array      # R-Net(dpv)


class KVNet(nn.Module):
    cfg: ModelConfig
    # Inference-only: refine just the fused posterior. The two R-Net passes
    # of the reference (KVNET.py:128-134,175-182) produce identical outputs
    # whenever dmap_cur_refined is actually consumed (first frame, where
    # dpv == bv_cur), so one pass suffices and saves ~6.5 ms/frame.
    # Training needs both (both enter the loss) => keep False there.
    single_refine: bool = False
    # Inference-only: route the plane-sweep through the fused Pallas kernel
    # (ops/pallas/sweep_fused.py, 23 -> 6.9 ms/frame on v5e). Not
    # differentiable; taps run at the TPU's default matmul precision (the
    # same bf16-class precision every conv already uses). Training keeps the
    # XLA sweep, which autodiffs through the gathers.
    fast_sweep: bool = False
    # Source-row band height for the fused sweep (exact iff the poses' per-
    # row y-tap spread <= sweep_band - 1; ops/pallas/sweep_fused.band_spread
    # measures it). The inference loop plans this per trajectory from the
    # actual poses (infer/loop.plan_sweep): 4 for small inter-frame roll
    # (~halves the selection matmuls), 8 default, 16 as graceful
    # degradation, XLA fallback beyond.
    sweep_band: int = 8
    # Inference-only: run the ten 64->64 K-Net convs on the pair-packed
    # async-DMA implicit-GEMM chain (ops/pallas/conv3d_pair.py; MXU-peak
    # dots, BN batch-stats reduced in-kernel). Same bf16 numeric class as
    # the bf16 XLA convs. Training keeps the XLA K-Net (differentiable).
    fast_knet: bool = False
    # Run the K-Net on the paired-lane layout (models/knet_paired.py): two
    # adjacent pixels per 128-lane channel row, structured-sparse packed
    # kernels — exact conv semantics (summation order only), pure XLA
    # (epilogue fusion intact, differentiable), 19.2 -> 14.0 ms measured on
    # v5e (C=64 convs run the MXU half-empty; C=128 runs 2.67x faster).
    paired_knet: bool = False
    # Same lane packing for the feature extractor (models/fe_packed.py):
    # the 32-channel stage runs x4-packed, the 64-channel stage x2-packed.
    packed_fe: bool = False

    @nn.compact
    def __call__(
        self,
        ref_frame: jax.Array,    # (H, W, 3) normalized RGB
        src_frames: jax.Array,   # (V, H, W, 3)
        src_poses: jax.Array,    # (V, 4, 4) relative extrinsics ref -> src
        cam: Camera,             # intrinsics at DPV (1/4) resolution
        d_candi: jax.Array,      # (D,)
        bv_predict: jax.Array,   # (D, h, w) log-DPV prediction (uniform if invalid)
        bv_valid: jax.Array,     # () bool — is bv_predict usable?
        precomputed=None,        # optional (layer1 (V+1,H/2,W/2,32),
                                 #           feat (V+1,h,w,F)) in
                                 # [srcs..., ref] order — skips the FE
                                 # (cached-feature rollout, per-frame BN
                                 # stats; see infer/rollout.make_rollout)
    ) -> KVNetOutput:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        V, H, W, _ = src_frames.shape

        # ---- D-Net: features for all V+1 frames in one batch ----
        # (basic.py:245-252 — BN uses the joint batch statistics)
        frames = jnp.concatenate([src_frames, ref_frame[None]], axis=0)
        use_packed_fe = (self.packed_fe and not cfg.fe_per_frame_bn
                         and W % 8 == 0
                         and not self.is_initializing())
        if precomputed is not None and not self.is_initializing():
            layer1, feat = precomputed
        elif use_packed_fe:
            from neuralrgbd_tpu.models.fe_packed import fe_packed_apply

            layer1, feat = fe_packed_apply(
                self.variables["params"]["feature_extractor"], frames,
                feature_dim=cfg.feature_dim, dtype=dtype)
        else:
            fe = FeatureExtractor(
                feature_dim=cfg.feature_dim, multi_scale=True, dtype=dtype,
                name="feature_extractor",
            )
            if cfg.fe_per_frame_bn:
                # per-frame BN statistics (B=1 per call; params shared via
                # the module name) — the cached-feature-rollout semantics,
                # trainable end to end (ModelConfig.fe_per_frame_bn)
                outs = [fe(frames[i:i + 1]) for i in range(frames.shape[0])]
                layer1 = jnp.concatenate([o[0] for o in outs], axis=0)
                feat = jnp.concatenate([o[1] for o in outs], axis=0)
            else:
                layer1, feat = fe(frames)
        feat_ref = feat[-1]          # (h, w, F)
        feat_srcs = feat[:-1]        # (V, h, w, F)
        layer1_ref = layer1[-1]      # (H/2, W/2, 32)

        # image intensity as extra feature channels (basic.py:254-263)
        if cfg.use_img_intensity:
            dw_rate = W // feat.shape[-2]
            ints = avg_pool2d(frames, dw_rate)          # (V+1, h, w, 3)
            feat_ref_sw = jnp.concatenate([feat_ref, ints[-1]], axis=-1)
            feat_srcs_sw = jnp.concatenate([feat_srcs, ints[:-1]], axis=-1)
        else:
            feat_ref_sw, feat_srcs_sw = feat_ref, feat_srcs

        Rs = src_poses[:, :3, :3]
        ts = src_poses[:, :3, 3]

        # One gather pass serves both the cost volume and the K-Net input
        # warps: the last 3 swept channels are the 1/4-res RGB frames the
        # reference re-warps separately (KVNET.py:149-161).
        keep = 3 if cfg.use_img_intensity else 0
        if self.fast_sweep:
            # any width: the fused kernel x-tiles the output row (wide
            # KITTI-no-crop operating points included)
            from neuralrgbd_tpu.ops.pallas.sweep_fused import (
                sweep_cost_volume_fused)

            swept = sweep_cost_volume_fused(
                feat_ref_sw.astype(jnp.float32),
                feat_srcs_sw.astype(jnp.float32),
                Rs, ts, cam, d_candi,
                sigma=cfg.sigma_soft_max, feat_dist=cfg.feat_dist,
                keep_last_channels=keep,
                band=self.sweep_band,
            )
        else:
            swept = sweep_cost_volume(
                feat_ref_sw.astype(jnp.float32),
                feat_srcs_sw.astype(jnp.float32),
                Rs, ts, cam, d_candi,
                sigma=cfg.sigma_soft_max, feat_dist=cfg.feat_dist,
                keep_last_channels=keep,
            )
        cost, warped_rgb = swept if keep else (swept, None)  # (D, h, w)

        if cfg.refine_costv:
            # optional costV refinement convs (basic.py:189-196,304-308):
            # conv2d_leakyRelu x2 + plain conv2d, D channels, pre-softmax
            from neuralrgbd_tpu.models.layers import ConvB, leaky_relu

            Dn = cost.shape[0]
            cv = cost.transpose(1, 2, 0)[None]               # (1, h, w, D)
            cv = leaky_relu(ConvB(Dn, use_bias=True, dtype=dtype,
                                  name="costv_conv0")(cv))
            cv = leaky_relu(ConvB(Dn, use_bias=True, dtype=dtype,
                                  name="costv_conv0_1")(cv))
            cv = ConvB(Dn, use_bias=True, dtype=dtype,
                       name="costv_conv0_2")(cv)
            cost = cv[0].transpose(2, 0, 1)
        bv_cur = jax.nn.log_softmax(-cost, axis=0)

        # ---- R-Net on the measurement ----
        if cfg.refine_net == "DGF":
            from neuralrgbd_tpu.models.guided_filter import RefineNetDGF

            r_net = RefineNetDGF(dtype=dtype, name="r_net")

            def refine(dpv_log):
                # depth-regress the low-res DPV, guided-filter upsample
                # (KVNET.py:127-131,178-179)
                dmap_lr = jnp.einsum("dhw,d->hw", jnp.exp(dpv_log), d_candi)
                return r_net(dmap_lr, ref_frame)  # (H, W) depth map
        else:
            r_net = RNet(D=cfg.ndepth, upsample_D=cfg.refine_dup,
                         dtype=dtype, name="r_net")

            def refine(dpv_log):
                out = r_net(
                    jnp.exp(dpv_log).transpose(1, 2, 0)[None],  # (1, h, w, D)
                    feat_ref[None],
                    layer1_ref[None],
                    ref_frame[None],
                )[0]
                return out.transpose(2, 0, 1)  # (D, H, W)

        dpv_cur_refined = None if self.single_refine else refine(bv_cur)

        if cfg.dnet_bayes:
            # in-net Bayesian filtering (basic.py:309-321): direct log-space
            # product of measurement and prediction, no learned gain
            dpv_fused = jax.nn.log_softmax(bv_cur + bv_predict, axis=0)
        else:
            # ---- K-Net temporal fusion (KVNET.py:146-173) ----
            dw = W // bv_cur.shape[-1]
            ref_dw = avg_pool2d(ref_frame, dw)           # (h, w, 3)
            if warped_rgb is None:
                srcs_dw = avg_pool2d(src_frames, dw)     # (V, h, w, 3)
                warped_rgb = warp_to_ref_over_depths(
                    srcs_dw.astype(jnp.float32), Rs, ts, cam, d_candi
                )  # (V, D, h, w, 3)
            D, h, w = bv_cur.shape
            vol = jnp.concatenate(
                [
                    warped_rgb.transpose(1, 2, 3, 0, 4).reshape(
                        D, h, w, V * 3),
                    jnp.broadcast_to(ref_dw[None], (D, h, w, 3)),
                    (bv_cur - bv_predict)[..., None],
                ],
                axis=-1,
            )  # (D, h, w, 3V+4) == kvnet_in_vol channel order, KVNET.py:166
            # Coarse-D K-Net (cfg.knet_coarse_d > 1, accuracy-gated
            # deviation): downsample the input volume along D on the
            # align_corners grid, run the 3-D CNN at D/cd, and upsample the
            # gain back with the same align-corners D-interpolation as the
            # reference's trilinear D-upsample branch (basic.py:128-139,
            # ported + parity-tested at models/knet.py up_sample_ratio).
            # Linear in D both ways, so a D-linear gain round-trips exactly.
            cd = max(1, int(cfg.knet_coarse_d))
            if cd > 1:
                if D % cd:
                    raise ValueError(
                        f"knet_coarse_d={cd} must divide ndepth={D}")
                from neuralrgbd_tpu.models.layers import (
                    linear_interp_matrix_ac)

                Md = linear_interp_matrix_ac(D, D // cd)
                vol = jnp.einsum("od,dhwc->ohwc", Md, vol)
            use_fast_knet = (self.fast_knet and cfg.kv_feature_dim == 64
                             and not self.is_initializing())
            use_paired_knet = (self.paired_knet and w % 2 == 0
                               and not self.is_initializing()
                               and not use_fast_knet)
            if use_fast_knet:
                from neuralrgbd_tpu.ops.pallas.conv3d_pair import (
                    knet_fast_apply)

                gain = knet_fast_apply(
                    self.variables["params"]["kv_net"], vol)
            elif use_paired_knet:
                from neuralrgbd_tpu.models.knet_paired import (
                    knet_paired_apply)

                gain = knet_paired_apply(
                    self.variables["params"]["kv_net"], vol, dtype=dtype)
            else:
                gain = KNet(feature_dim=cfg.kv_feature_dim, dtype=dtype,
                            name="kv_net")(vol[None])[0]  # (D/cd, h, w)
            if cd > 1:
                Mu = linear_interp_matrix_ac(D // cd, D)
                gain = jnp.einsum("od,dhw->ohw", Mu,
                                  gain.astype(jnp.float32))
            dpv_fused = jax.nn.log_softmax(gain + bv_predict, axis=0)
        dpv = jnp.where(bv_valid, dpv_fused, bv_cur)

        if self.single_refine:
            dpv_refined = refine(dpv)
            dpv_cur_refined = dpv_refined
        else:
            dpv_refined_fused = refine(dpv_fused)
            dpv_refined = jnp.where(bv_valid, dpv_refined_fused,
                                    dpv_cur_refined)

        return KVNetOutput(
            bv_cur=bv_cur,
            dpv=dpv,
            dpv_cur_refined=dpv_cur_refined,
            dpv_refined=dpv_refined,
        )
