"""Verify the de-stalled host inference loop on the real TPU.

Drives neuralrgbd_tpu.infer.loop.run_trajectory (the production export path)
at the reference operating point on a 60-frame synthetic scene and checks:
  1. FPS (second pass, compile excluded) vs the scan-rollout bench.
  2. Output contract: pgm files equal the float-path quantization
     (x*1000).astype(uint16) computed from a direct infer_step run.
  3. scene_path_info ordering is dense and sorted.
"""
import os
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig
from neuralrgbd_tpu.data.scannet import make_trajectory
from neuralrgbd_tpu.data.synthetic import write_scannet_scene
from neuralrgbd_tpu.data.trajectory import window_batch
from neuralrgbd_tpu.infer.export import read_pgm
from neuralrgbd_tpu.infer.loop import run_trajectory
from neuralrgbd_tpu.infer.step import make_infer_step

N_FRAMES = int(os.environ.get("VERIFY_FRAMES", "60"))

# VERIFY_COARSE=2 runs the deployment stack's coarse-D K-Net deviation;
# the stepwise oracle below shares cfg, so the contract check still holds.
cfg = ModelConfig(knet_coarse_d=int(os.environ.get("VERIFY_COARSE", "1")))
root = os.path.join(tempfile.gettempdir(),
                    f"verify_host_loop_scene_{N_FRAMES}"
                    if N_FRAMES != 60 else "verify_host_loop_scene")
if not os.path.isdir(os.path.join(root, "scene0000_00")):
    write_scannet_scene(root, n_frames=N_FRAMES)
traj = make_trajectory(0, 5, root, img_size_wh=(384, 256),
                       d_candi=cfg.d_candi)
print("traj len:", len(traj), "devices:", jax.devices(), flush=True)


class _Args:
    t_win = cfg.t_win_r
    model_path = None
    refine_net = "DPV"


from neuralrgbd_tpu.cli.test_kvnet import _init_or_load_params

params, _torch_imported = _init_or_load_params(cfg, _Args(), traj)

res_dir = os.path.join(tempfile.gettempdir(), "verify_host_loop_out")
os.system(f"rm -rf {res_dir} {res_dir}_warm")

CHUNK_T = int(os.environ.get("VERIFY_CHUNK_T", "32"))
# VERIFY_CACHE_FE=0/1 pins the feature-cache mode; unset = production
# default (cached per-frame-BN on TPU when chunked — PERF.md)
_cfe = os.environ.get("VERIFY_CACHE_FE")
CACHE_FE = (None if _cfe is None else bool(int(_cfe)))
cache_fe = (CACHE_FE if CACHE_FE is not None
            else CHUNK_T > 1 and jax.default_backend() == "tpu")
print(f"chunk_t={CHUNK_T} cache_features={cache_fe}", flush=True)
infer_step = make_infer_step(cfg) if CHUNK_T == 1 else None
t0 = time.time()
n = run_trajectory(params, cfg, traj, res_dir + "_warm",
                   infer_step=infer_step, verbose=False, chunk_t=CHUNK_T,
                   cache_features=cache_fe)
print(f"pass 1 (compile): {n} frames in {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
n = run_trajectory(params, cfg, traj, res_dir, infer_step=infer_step,
                   verbose=False, chunk_t=CHUNK_T, cache_features=cache_fe)
dt = time.time() - t0
fps = n / dt
print(f"RESULT host_loop_fps={fps:.2f} ({n} frames in {dt:.1f}s)", flush=True)

# contract check: recompute the first 4 frames via direct steps and compare.
# The oracle must match the deployed semantics: with the feature cache the
# stepwise oracle featurizes per frame (B=1 BN statistics) and feeds the
# features in — caching itself is pure reuse (tests/test_data_e2e.py
# test_chunked_loop_cached_features is the CPU version of this check).
if cache_fe:
    from neuralrgbd_tpu.infer.step import make_frame_features
    fe1 = make_frame_features(cfg)
    step_f = make_infer_step(cfg, with_features=True)

    def infer_step(params, sb, bv, valid):
        window = list(sb["srcs"][0]) + [sb["ref"][0]]
        l1s, fs = zip(*[fe1(params, fr) for fr in window])
        feats = (jnp.stack(l1s)[None], jnp.stack(fs)[None])
        return step_f(params, sb, bv, valid, feats)

infer_step = infer_step or make_infer_step(cfg)
D = cfg.ndepth
w_dpv, h_dpv = traj.dpv_size_wh
bv = jnp.full((1, D, h_dpv, w_dpv), -np.log(D), jnp.float32)
valid = jnp.zeros((1,), bool)
lo = cfg.t_win_r
for k, ref_indx in enumerate(range(lo, lo + 4)):
    b, rec, ok = window_batch(traj, ref_indx, cfg.t_win_r, 1)
    assert ok
    out = infer_step(params, jax.tree.map(jnp.asarray, b), bv, valid)
    bv, valid = out.bv_predict, jnp.ones((1,), bool)
    want_d = (np.asarray(out.depth[0]) * 1000.0).astype(np.uint16)
    want_c = (np.asarray(out.confidence[0]) * 1000.0).astype(np.uint16)
    got_d = read_pgm(os.path.join(res_dir, f"d_{k:05d}.pgm"))
    got_c = read_pgm(os.path.join(res_dir, f"conf_{k:05d}.pgm"))
    nd = int((got_d.astype(np.int32) - want_d).__abs__().max())
    neq_d = int((got_d != want_d).sum())
    neq_c = int((got_c != want_c).sum())
    print(f"frame {k}: depth mismatches={neq_d}/{want_d.size} (max|d|={nd}) "
          f"conf mismatches={neq_c}/{want_c.size}", flush=True)
    assert neq_d <= want_d.size * 1e-3 and neq_c <= want_c.size * 1e-3, \
        "pgm contract broken"

info = open(os.path.join(res_dir, "scene_path_info.txt")).read().splitlines()
idxs = [int(l.split()[0]) for l in info[1:]]
assert idxs == list(range(len(idxs))), f"scene_path_info not dense: {idxs[:9]}"
print("scene_path_info rows:", len(idxs), "OK", flush=True)
print("VERIFY PASS", flush=True)
