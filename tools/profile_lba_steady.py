"""Decompose the pose-free pipeline's steady-state frame on the real TPU.

The LBA CLI's steady state measures ~1.0 s/frame with trained weights
(round 5) while the isolated LBA program slope-times at 80.6 ms — this
drives the REAL pipeline (cli.test_kvnet_lba components, trained weights,
the bench capture scene + DSO-derived poses) for a few frames, then
slope-times each device program with the captured in-flight values:

  - steady_frame        (the fused device-pose-graph frame)
  - infer_step          (KV-Net window inference)
  - lba_maps            (image-res DPV resample + depth/conf regression)
  - lba_run             (3-scale x 20-it photometric Adam)

Pinpoints which stage is content/pose-dependent (in-jit fallbacks:
resample_tiled.resample_dpv_wide's oct path, the banded sweep's spread
precondition) vs the random-input slope numbers.

LBA_STEADY_MODEL=<ckpt dir> (default the round-5 campaign best)
PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_lba_steady.py
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.cli.test_kvnet_lba import (
    make_lba_maps,
    make_steady_frame,
    twin_pose_indices,
)
from neuralrgbd_tpu.config import ModelConfig
from neuralrgbd_tpu.data.mdata import make_trajectory
from neuralrgbd_tpu.infer.step import make_infer_step
from neuralrgbd_tpu.ops.camera import camera_from_K, rescale_K
from neuralrgbd_tpu.pose import dso
from neuralrgbd_tpu.pose.lba import make_lba_program

MODEL = os.environ.get("LBA_STEADY_MODEL",
                       "/tmp/campaign_ckpt_r4/best/ckpt_00011000")
CAPTURE = os.environ.get("LBA_STEADY_CAPTURE",
                         "/tmp/lba_bench_capture_80")

scene = os.path.join(CAPTURE, "scene0000_00")
cfg = ModelConfig(feature_dim=64, kv_feature_dim=64, ndepth=64,
                  d_min=0.1, d_max=5.0, t_win_r=2)
D, t_win_r, step = cfg.ndepth, cfg.t_win_r, 1
img_wh = (384, 256)
traj = make_trajectory(os.path.join(scene, "*.color.jpg"),
                       os.path.join(CAPTURE, "cam_info.json"),
                       img_size_wh=img_wh, d_candi=cfg.d_candi)
L = len(traj)
traj_extMs = dso.init_traj_extMs(L, os.path.join(CAPTURE, "result.txt"))
focal = float(np.mean([traj.K_img[0, 0], traj.K_img[1, 1]]))
scale = dso.estimate_metric_scale(traj_extMs, focal, cfg.d_max, step)
dso.rescale_traj_t(traj_extMs, scale)
print(f"scene len {L}, metric scale {scale:.4f}", flush=True)

cams_pyr = [camera_from_K(rescale_K(traj.K_orig, traj.orig_wh,
                                    (img_wh[0] // s, img_wh[1] // s)))
            for s in (4, 2, 1)]
d_candi = jnp.asarray(cfg.d_candi)


class _A:
    model_path = MODEL
    t_win = t_win_r
    refine_net = "DPV"


from neuralrgbd_tpu.cli.test_kvnet import _init_or_load_params  # noqa: E402

params, _ = _init_or_load_params(cfg, _A(), traj)
infer_step = make_infer_step(cfg)
lba_run = make_lba_program(cams_pyr, max_iter=20, step=0.01)
lba_maps = make_lba_maps(cams_pyr[-1], d_candi, D)
K_dev = jnp.asarray(traj.K_dpv[None].astype(np.float32))
steady = make_steady_frame(infer_step, lba_run, lba_maps, K_dev,
                           False, False)

# ---- drive a few REAL frames to reach a representative steady state ----
h_dpv, w_dpv = traj.dpv_size_wh[1], traj.dpv_size_wh[0]
bvp = jnp.full((1, D, h_dpv, w_dpv), -np.log(D), jnp.float32)
bvv = jnp.zeros((1,), bool)
dev_extMs = jnp.asarray(np.stack([
    m.astype(np.float32) if isinstance(m, np.ndarray)
    else np.eye(4, dtype=np.float32) for m in traj_extMs]))
imgs = {}


def dimg(i):
    if i not in imgs:
        imgs[i] = jnp.asarray(traj.frame(i).img)
    return imgs[i]


N_WARM = 6
lo = t_win_r * step
captured = None
for k, ref_indx in enumerate(range(lo, lo + N_WARM)):
    win_idx = ([i for i in range(ref_indx - t_win_r, ref_indx)]
               + [i for i in range(ref_indx + 1, ref_indx + t_win_r + 1)])
    idx_next = ref_indx + 1
    pose_idx, opt_idx = twin_pose_indices(idx_next, t_win_r, step)
    idx = {"ref": jnp.int32(ref_indx), "next": jnp.int32(idx_next),
           "pnext": jnp.int32(min(ref_indx + step, L - 1)),
           "win": jnp.asarray(win_idx, jnp.int32),
           "pose": jnp.asarray(pose_idx, jnp.int32),
           "opt": jnp.asarray(opt_idx, jnp.int32)}
    args = (params, dev_extMs, dimg(ref_indx),
            jnp.stack([dimg(i) for i in win_idx]), dimg(idx_next),
            jnp.stack([dimg(i) for i in opt_idx]),
            bvp, bvv, idx, jnp.asarray(np.eye(4, dtype=np.float32)))
    if k == N_WARM - 1:
        captured = args      # a REAL steady-state input set
        break
    bvp, dev_extMs, _dc = steady(*args)
    bvv = jnp.ones((1,), bool)
    jax.block_until_ready(dev_extMs)
    print(f"warm frame {ref_indx} done", flush=True)


def timed(label, fn, n1=2, n2=6, reps=3):
    jax.block_until_ready(fn())
    ts = {n1: [], n2: []}
    for _ in range(reps):
        for n in (n1, n2):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn()
            jax.block_until_ready(out)
            ts[n].append(time.perf_counter() - t0)
    dt = (min(ts[n2]) - min(ts[n1])) / (n2 - n1)
    print(f"{label:<44s} {dt*1e3:8.1f} ms/call", flush=True)
    return dt


(params_c, extMs_c, ref_c, srcs_c, next_c, opts_c, bvp_c, bvv_c,
 idx_c, dso_c) = captured

t_full = timed("steady_frame (fused, REAL state)",
               lambda: steady(*captured)[1])

# components with the same real values
inv_ref = jnp.linalg.inv(extMs_c[idx_c["ref"]])
batch = {"ref": ref_c[None], "srcs": srcs_c[None],
         "poses": (extMs_c[idx_c["win"]] @ inv_ref)[None], "K": K_dev,
         "pose_next": (extMs_c[idx_c["pnext"]] @ inv_ref)[None]}
batch = jax.tree.map(jax.block_until_ready, batch)
# make_infer_step donates the bv carry (argnum 2): pass a fresh device
# copy per call (SKILL.md round-3 lesson)
t_infer = timed("infer_step (REAL poses)",
                lambda: infer_step(params_c, batch, jnp.array(bvp_c),
                                   bvv_c).depth)

out = infer_step(params_c, batch, jnp.array(bvp_c), bvv_c)
dpv = jax.block_until_ready(out.dpv_refined[0])
pose_next = jax.block_until_ready(extMs_c[idx_c["next"]] @ inv_ref)
t_maps = timed("lba_maps (image-res resample, REAL pose)",
               lambda: lba_maps(dpv, pose_next)[2])

_, _, dmap_kf, conf_kf = lba_maps(dpv, pose_next)
dmap_kf = jax.block_until_ready(dmap_kf)
conf_kf = jax.block_until_ready(conf_kf)
rel_inits = jax.block_until_ready(
    extMs_c[idx_c["pose"]] @ jnp.linalg.inv(extMs_c[idx_c["next"]]))
t_lba = timed("lba_run (REAL maps + poses)",
              lambda: lba_run(next_c, opts_c, dmap_kf, conf_kf, rel_inits))

# near-identity pose A/B for the resample fallback question
eye_pose = jnp.asarray(np.eye(4, dtype=np.float32) +
                       np.diag([0, 0, 0, 0]).astype(np.float32))
t_maps_id = timed("lba_maps (identity pose)",
                  lambda: lba_maps(dpv, eye_pose)[2])

print(f"\nsum(infer+maps+lba) = {(t_infer+t_maps+t_lba)*1e3:.1f} ms "
      f"vs fused {t_full*1e3:.1f} ms", flush=True)
