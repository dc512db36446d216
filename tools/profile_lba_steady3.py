"""Bisect WHICH input makes the infer step 222 ms with the LBA capture
data vs ~30 ms with the bench's synthetic batch (round-5 finding).

One rollout (bench construction: make_rollout, exact semantics, band 8)
is compiled ONCE; variants swap individual input fields between the bench
synthetic batch and the LBA capture's real data — same shapes, so every
variant reuses the compiled executable and differences are pure
value-dependence.

PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_lba_steady3.py
"""
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.data import synthetic_batch
from neuralrgbd_tpu.data.mdata import make_trajectory
from neuralrgbd_tpu.infer.rollout import make_rollout
from neuralrgbd_tpu.pose import dso
from neuralrgbd_tpu.train import create_train_state

MODEL = os.environ.get("LBA_STEADY_MODEL",
                       "/tmp/campaign_ckpt_r4/best/ckpt_00011000")
CAPTURE = os.environ.get("LBA_STEADY_CAPTURE", "/tmp/lba_bench_capture_80")
T = int(os.environ.get("LBA_STEADY_T", "8"))

cfg = ModelConfig()          # bench defaults: 384x256 D=64 fd=64
D, t_win_r = cfg.ndepth, cfg.t_win_r

# --- bench-side inputs ---
bbatch, _ = synthetic_batch(cfg, n_lanes=1, img_hw=(256, 384), seed=0)
state = create_train_state(cfg, TrainConfig(), bbatch)

# --- capture-side inputs (d_min/d_max differ from bench cfg — keep the
# BENCH cfg so the comparison isolates input VALUES, not the model) ---
scene = os.path.join(CAPTURE, "scene0000_00")
traj = make_trajectory(os.path.join(scene, "*.color.jpg"),
                       os.path.join(CAPTURE, "cam_info.json"),
                       img_size_wh=(384, 256), d_candi=cfg.d_candi)
L = len(traj)
traj_extMs = dso.init_traj_extMs(L, os.path.join(CAPTURE, "result.txt"))
focal = float(np.mean([traj.K_img[0, 0], traj.K_img[1, 1]]))
scale = dso.estimate_metric_scale(traj_extMs, focal, cfg.d_max, 1)
dso.rescale_traj_t(traj_extMs, scale)
ext = np.stack([np.asarray(m, np.float32) for m in traj_extMs])
ref_indx = 6
win_idx = [4, 5, 7, 8]
inv_ref = np.linalg.inv(ext[ref_indx])
rbatch = {
    "ref": np.asarray(traj.frame(ref_indx).img)[None],
    "srcs": np.stack([np.asarray(traj.frame(i).img)
                      for i in win_idx])[None],
    "poses": (ext[win_idx] @ inv_ref)[None].astype(np.float32),
    "K": traj.K_dpv[None].astype(np.float32),
    "pose_next": (ext[ref_indx + 1] @ inv_ref)[None].astype(np.float32),
}

# trained params (match the LBA CLI). NOTE: keep the random-init params
# aside BEFORE restoring — an earlier revision overwrote `state` here, so
# its "random-init" row silently timed the trained params too.
from neuralrgbd_tpu.utils.checkpoint import restore_params_only  # noqa: E402

params_random = state.params
params_trained = restore_params_only(MODEL, state).params

keys = ("ref", "srcs", "poses", "K", "pose_next")
rollout = make_rollout(cfg, jit=False, fast_sweep=True, sweep_band=8,
                       cache_features=False, coarse_knet=1)


@jax.jit
def run(params, frames, bvp):
    d, c, bv = rollout(params, frames, bvp, jnp.ones((1,), bool))
    return jnp.sum(d[:, :, ::64, ::64]) + jnp.sum(bv[:, :, ::16, ::16])


def stackT(b):
    return {k: jnp.asarray(np.stack([b[k]] * T)) for k in keys}


def mix(base, other, fields):
    out = dict(stackT(base))
    o = stackT(other)
    for f in fields:
        out[f] = o[f]
    return out


def timeit(label, frames, params, reps=3):
    bvp = jnp.full((1, D, 64, 96), -np.log(float(D)), jnp.float32)
    float(run(params, frames, bvp))           # warm (no recompile expected)
    ts = []
    for _ in range(reps):
        bvp = jnp.full((1, D, 64, 96), -np.log(float(D)), jnp.float32)
        t0 = time.perf_counter()
        s = float(run(params, frames, bvp))
        ts.append(time.perf_counter() - t0)
        assert np.isfinite(s), (label, s)
    print(f"{label:<56s} {np.median(ts)*1e3/T:8.1f} ms/frame", flush=True)


timeit("bench synthetic batch, random-init params",
       stackT(bbatch), params_random)
timeit("bench synthetic batch, TRAINED params",
       stackT(bbatch), params_trained)
timeit("capture batch (all real fields), TRAINED",
       stackT(rbatch), params_trained)
timeit("capture imgs + bench poses/K", mix(rbatch, bbatch,
       ("poses", "K", "pose_next")), params_trained)
timeit("bench imgs + capture poses/K", mix(bbatch, rbatch,
       ("poses", "K", "pose_next")), params_trained)
timeit("capture batch, bench pose_next only", mix(rbatch, bbatch,
       ("pose_next",)), params_trained)
timeit("capture batch, bench poses only", mix(rbatch, bbatch,
       ("poses",)), params_trained)
timeit("capture batch, bench K only", mix(rbatch, bbatch,
       ("K",)), params_trained)
