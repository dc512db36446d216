"""Torch-CPU oracle harness for the reference NVlabs/neuralrgbd KVNET.

Imports the reference implementation from /root/reference/code at runtime
(nothing is copied), patches the scattered ``.cuda()`` calls to no-ops, and
restores the torch-0.4-era ``grid_sample`` default (``align_corners=True`` —
the convention the reference was written and its weights were trained under;
modern torch flipped the default in 1.3). The result is a bit-exact CPU
oracle of ``KVNET.forward`` (``/root/reference/code/models/KVNET.py:93-185``)
that the end-to-end parity tests and the baseline-FPS measurement both drive.

Usage:
    from tools.ref_oracle import ReferenceOracle
    oracle = ReferenceOracle(feature_dim=32, ndepth=16, t_win_r=2,
                             img_hw=(256, 384), seed=0)
    out = oracle.forward(ref_hw3, srcs_vhw3, poses_v44, bv_predict_dhw)
    state_dict = oracle.state_dict()
"""

from __future__ import annotations

import math
import sys
import types

import numpy as np

_REF_CODE = "/root/reference/code"
_patched = False


def _patch_torch_for_cpu():
    """Make the reference runnable on CPU torch with 2018 semantics."""
    global _patched
    if _patched:
        return
    import torch
    import torch.nn.functional as F

    # The reference scatters .cuda() through the model/warp code
    # (homography.py:306-311 etc.); neutralize on CPU.
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.current_device = lambda: 0
    torch.cuda.is_available = lambda: False

    # torch<=1.2 grid_sample used align_corners=True; the reference calls it
    # without the kwarg (homography.py:418,447,716,...).
    orig_gs = F.grid_sample

    def grid_sample_legacy(input, grid, mode="bilinear",
                           padding_mode="zeros", align_corners=None):
        if align_corners is None:
            align_corners = True
        return orig_gs(input, grid, mode=mode, padding_mode=padding_mode,
                       align_corners=align_corners)

    F.grid_sample = grid_sample_legacy

    # mutils.misc imports torchvision (unused at module level) — stub it.
    if "torchvision" not in sys.modules:
        sys.modules["torchvision"] = types.ModuleType("torchvision")
    _patched = True


def _import_reference():
    _patch_torch_for_cpu()
    if _REF_CODE not in sys.path:
        sys.path.insert(0, _REF_CODE)
    import models.KVNET as ref_kvnet  # noqa: F401
    import warping.homography as ref_homo  # noqa: F401
    import warping.View as ref_view  # noqa: F401
    return ref_kvnet, ref_homo, ref_view


def make_cam_intrinsics(K_dpv: np.ndarray, height: int, width: int) -> dict:
    """Build the reference ``cam_intrinsics`` dict for a DPV-resolution K.

    Mirrors ``scanNet.read_IntM_from_txt`` output (scanNet.py:243-270):
    fov from the principal point, unit rays with normalize_z=True, and the
    (3,4) numpy ``intrinsic_M`` alongside the (3,3) torch ``intrinsic_M_cuda``.
    """
    import torch

    _, _, ref_view = _import_reference()
    K = np.asarray(K_dpv, dtype=np.float64)
    h_fov = math.degrees(math.atan(K[0, 2] / K[0, 0]) * 2)
    v_fov = math.degrees(math.atan(K[1, 2] / K[1, 1]) * 2)
    rays = ref_view.normalised_pixel_to_ray_array(
        width=width, height=height, hfov=h_fov, vfov=v_fov, normalize_z=True)
    rays_2d = np.reshape(np.transpose(rays, axes=[2, 0, 1]), [3, -1])
    IntM34 = np.zeros((3, 4))
    IntM34[:3, :3] = K
    return {
        "hfov": h_fov,
        "vfov": v_fov,
        "unit_ray_array": rays,
        "unit_ray_array_2D": torch.from_numpy(rays_2d.astype(np.float32)),
        "intrinsic_M_cuda": torch.from_numpy(K.astype(np.float32)),
        "focal_length": float(np.mean([K[0, 0], K[1, 1]])),
        "intrinsic_M": IntM34,
    }


class ReferenceOracle:
    """A CPU instance of the reference KVNET at a given operating point."""

    def __init__(self, feature_dim=32, ndepth=16, t_win_r=2,
                 d_min=0.1, d_max=5.0, sigma_soft_max=10.0,
                 img_hw=(256, 384), dpv_scale=0.25, seed=0,
                 refine_name="DPV"):
        import torch

        ref_kvnet, ref_homo, _ = _import_reference()
        self.torch = torch
        self.homo = ref_homo
        H, W = img_hw
        self.img_hw = img_hw
        self.dpv_hw = (int(H * dpv_scale), int(W * dpv_scale))
        self.d_candi = np.linspace(d_min, d_max, ndepth).astype(np.float32)

        # K at DPV resolution with the principal point at the image center
        # (the rescale path of scanNet.py:243-253).
        h, w = self.dpv_hw
        hfov, vfov = math.radians(60.0), math.radians(45.0)
        K = np.array(
            [[(w / 2.0) / math.tan(hfov / 2), 0.0, w / 2.0],
             [0.0, (h / 2.0) / math.tan(vfov / 2), h / 2.0],
             [0.0, 0.0, 1.0]], dtype=np.float64)
        self.K_dpv = K.astype(np.float32)
        self.cam_intrinsics = make_cam_intrinsics(K, h, w)

        torch.manual_seed(seed)
        self.model = ref_kvnet.KVNET(
            feature_dim=feature_dim,
            cam_intrinsics=self.cam_intrinsics,
            d_candi=self.d_candi,
            sigma_soft_max=sigma_soft_max,
            KVNet_feature_dim=feature_dim,
            d_upsample_ratio_KV_net=None,
            if_refined=True,
            refineNet_name=refine_name,
            t_win_r=t_win_r,
        )
        # Deliberately NOT .eval(): the reference never calls model.eval()
        # anywhere (verified: no .eval()/.train() in /root/reference/code), so
        # its inference runs in train mode — every BatchNorm normalizes with
        # batch statistics, including the downsample BNs (_make_layer) and the
        # 3-D K-Net BNs (convbn_3d) that *do* track running buffers (their
        # buffers exist in the released checkpoints but are never consumed).
        # Batch-stats-everywhere is therefore the executed semantics to match.

    def state_dict(self) -> dict:
        """Numpy state_dict (the released-.tar layout the importer expects)."""
        return {k: v.detach().numpy().copy()
                for k, v in self.model.state_dict().items()}

    def forward(self, ref_hw3: np.ndarray, srcs_vhw3: np.ndarray,
                poses_v44: np.ndarray, bv_predict_dhw=None):
        """Run KVNET.forward; channels-last numpy in, channels-first out.

        Returns dict with bv_cur, dpv (D,h,w log) and dpv_cur_refined,
        dpv_refined (D,H,W log) matching KVNetOutput field names.
        """
        torch = self.torch
        ref = torch.from_numpy(
            np.ascontiguousarray(ref_hw3.transpose(2, 0, 1))[None]).float()
        srcs = torch.from_numpy(
            np.ascontiguousarray(srcs_vhw3.transpose(0, 3, 1, 2))[None]
        ).float()
        poses = torch.from_numpy(np.asarray(poses_v44)[None]).float()
        bv_p = None
        if bv_predict_dhw is not None:
            bv_p = torch.from_numpy(np.asarray(bv_predict_dhw)[None]).float()
        with torch.no_grad():
            dmap_cur_ref, dmap_ref, bv_cur, dpv = self.model(
                ref, srcs, poses, BatchIdx=0,
                cam_intrinsics=[self.cam_intrinsics], BV_predict=bv_p)
        out = {
            "bv_cur": bv_cur[0].numpy(),
            "dpv": dpv[0].numpy(),
        }
        if isinstance(dmap_cur_ref, torch.Tensor):
            out["dpv_cur_refined"] = dmap_cur_ref[0].numpy()
            out["dpv_refined"] = dmap_ref[0].numpy()
        return out

    def predict_next(self, dpv_dhw: np.ndarray, rel_extM_44: np.ndarray):
        """The reference prediction step: resample_vol_cuda + pad + clamp
        (train_utils/train_KVNet.py:155-171 / test_utils/test_KVNet.py:47-62).
        """
        torch = self.torch
        D = dpv_dhw.shape[0]
        vol = torch.from_numpy(np.asarray(dpv_dhw)[None]).float()
        rel = torch.from_numpy(np.asarray(rel_extM_44)).float()
        with torch.no_grad():
            res = self.homo.resample_vol_cuda(
                src_vol=vol, rel_extM=rel,
                cam_intrinsic=self.cam_intrinsics,
                d_candi=self.d_candi,
                padding_value=math.log(1.0 / D),
            ).clamp(max=0, min=-1000.0)
        return res.numpy()
