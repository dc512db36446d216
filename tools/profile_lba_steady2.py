"""Scan-chained (bench-methodology) timing of the LBA CLI's device programs.

profile_lba_steady.py's single-dispatch chains gave infer_step=699 ms and
steady_frame=597 ms — numbers that contradict the bench's 30 ms/frame at
the same operating point. On this tunnel only ONE methodology is trusted
(CLAUDE.md): chain iterations INSIDE one jit and fetch a scalar. This does
that for (a) the infer step at the LBA CLI's exact configuration and real
captured inputs, (b) the fused steady_frame, chaining the pose graph and
DPV carry between iterations.

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_lba_steady2.py
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
CAPTURE = os.environ.get("LBA_STEADY_CAPTURE", "/tmp/lba_bench_capture_80")
T = int(os.environ.get("LBA_STEADY_T", "8"))

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


class _A:
    model_path = MODEL
    t_win = t_win_r
    refine_net = "DPV"


from neuralrgbd_tpu.cli.test_kvnet import _init_or_load_params  # noqa: E402

params, _ = _init_or_load_params(cfg, _A(), traj)

cams_pyr = [camera_from_K(rescale_K(traj.K_orig, traj.orig_wh,
                                    (img_wh[0] // s, img_wh[1] // s)))
            for s in (4, 2, 1)]
d_candi = jnp.asarray(cfg.d_candi)
infer_raw = make_infer_step(cfg, jit=False)
infer_step = make_infer_step(cfg)
lba_run = make_lba_program(cams_pyr, max_iter=20, step=0.01)
lba_maps = make_lba_maps(cams_pyr[-1], d_candi, D)
K_dev = jnp.asarray(traj.K_dpv[None].astype(np.float32))
steady = make_steady_frame(infer_step, lba_run, lba_maps, K_dev,
                           False, False)

ref_indx = 6
win_idx = ([i for i in range(ref_indx - t_win_r, ref_indx)]
           + [i for i in range(ref_indx + 1, ref_indx + t_win_r + 1)])
idx_next = ref_indx + 1
pose_idx, opt_idx = twin_pose_indices(idx_next, t_win_r, step)
idx = {"ref": jnp.int32(ref_indx), "next": jnp.int32(idx_next),
       "pnext": jnp.int32(min(ref_indx + step, L - 1)),
       "win": jnp.asarray(win_idx, jnp.int32),
       "pose": jnp.asarray(pose_idx, jnp.int32),
       "opt": jnp.asarray(opt_idx, jnp.int32)}
imgs = {i: jnp.asarray(traj.frame(i).img)
        for i in set(win_idx + opt_idx + [ref_indx, idx_next])}
ext_np = np.stack([m.astype(np.float32) if isinstance(m, np.ndarray)
                   else np.eye(4, dtype=np.float32) for m in traj_extMs])
extMs0 = jnp.asarray(ext_np)
inv_ref = np.linalg.inv(ext_np[ref_indx])
batch = {
    "ref": imgs[ref_indx][None],
    "srcs": jnp.stack([imgs[i] for i in win_idx])[None],
    "poses": jnp.asarray((ext_np[win_idx] @ inv_ref)[None]),
    "K": K_dev,
    "pose_next": jnp.asarray(
        (ext_np[min(ref_indx + step, L - 1)] @ inv_ref)[None]),
}
h_dpv, w_dpv = traj.dpv_size_wh[1], traj.dpv_size_wh[0]
bvp0 = jnp.full((1, D, h_dpv, w_dpv), -np.log(D), jnp.float32)
bvv1 = jnp.ones((1,), bool)


def fetch_timed(label, fn, reps=3):
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = float(fn())
        ts.append(time.perf_counter() - t0)
        assert np.isfinite(s), label
    med = float(np.median(ts))
    print(f"{label:<52s} {med*1e3/T:8.1f} ms/iter ({T} chained)",
          flush=True)
    return med / T


# (a) the infer step, T chained inside ONE jit, scalar out
@jax.jit
def run_infer_chain(params, batch, bvp):
    def body(carry, _):
        out = infer_raw(params, batch, carry, bvv1)
        return out.bv_predict, jnp.sum(out.depth[:, ::64, ::64])

    bv, ss = jax.lax.scan(body, bvp, None, length=T)
    return jnp.sum(ss) + jnp.sum(bv[:, :, ::16, ::16])


fetch_timed("infer_step chain (LBA cfg, REAL poses)",
            lambda: run_infer_chain(params, batch, bvp0))


# (b) the fused steady_frame, T chained: pose graph + DPV carry thread
srcs_s = jnp.stack([imgs[i] for i in win_idx])
opts_s = jnp.stack([imgs[i] for i in opt_idx])
steady_raw_infer = infer_step  # jitted is fine; traced inline under jit


@jax.jit
def run_steady_chain(params, extMs, bvp):
    def body(carry, _):
        bvp, extMs = carry
        bvp2, extMs2, dc = steady(params, extMs, imgs[ref_indx], srcs_s,
                                  imgs[idx_next], opts_s, bvp, bvv1, idx,
                                  jnp.eye(4, dtype=jnp.float32))
        return (bvp2, extMs2), jnp.sum(dc[:, ::64, ::64].astype(jnp.int32))

    (bvp, extMs), ss = jax.lax.scan(body, (bvp, extMs), None, length=T)
    return jnp.sum(ss) + jnp.sum(extMs[idx["opt"]])


fetch_timed("steady_frame chain (fused frame, REAL state)",
            lambda: run_steady_chain(params, extMs0, bvp0))

# (c) lba_run chain for the same methodology cross-check
out = infer_step(params, batch, jnp.array(bvp0), jnp.zeros((1,), bool))
dpv = out.dpv_refined[0]
pose_next = jnp.asarray(ext_np[idx_next] @ inv_ref)
_, _, dmap_kf, conf_kf = lba_maps(dpv, pose_next)
rel_inits = jnp.asarray(ext_np[pose_idx] @ np.linalg.inv(ext_np[idx_next]))


@jax.jit
def run_lba_chain(img_next, opts, dmap, conf, rel):
    def body(carry, _):
        ro = lba_run(img_next, opts, dmap, conf, carry)
        return ro, jnp.sum(ro)

    rel, ss = jax.lax.scan(body, rel, None, length=T)
    return jnp.sum(ss)


fetch_timed("lba_run chain (REAL maps)",
            lambda: run_lba_chain(imgs[idx_next], opts_s, dmap_kf,
                                  conf_kf, rel_inits))
