"""Sweep the production-loop chunk_t on the real TPU (VERDICT r2 item 3;
round-4 re-sweep: >=480-frame scene, MEDIAN of reps — VERDICT r3 item 5).

Uses a long synthetic trajectory so each configuration runs >15s of
steady state (the 55-frame verify scene finishes in ~3s — pure noise).
Two passes per chunk_t: pass 1 compiles, reps after it are the data.

Env: SWEEP_FRAMES (default 480), SWEEP_REPS (default 3, median reported),
SWEEP_CONFIGS ("32:c,16" = chunk_t 32 cached + 16 exact),
SWEEP_COARSE (knet_coarse_d for the deployment stack).

PYTHONPATH=/root/repo:/root/.axon_site python tools/sweep_chunk_t.py
"""
import os
import tempfile
import time

import numpy as np

import jax

from neuralrgbd_tpu.config import ModelConfig
from neuralrgbd_tpu.data.scannet import make_trajectory
from neuralrgbd_tpu.data.synthetic import write_scannet_scene
from neuralrgbd_tpu.infer.loop import run_trajectory

N_FRAMES = int(os.environ.get("SWEEP_FRAMES", "480"))

cfg = ModelConfig(knet_coarse_d=int(os.environ.get("SWEEP_COARSE", "1")))
root = os.path.join(tempfile.gettempdir(), f"sweep_chunk_scene_{N_FRAMES}")
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

CONFIGS = [(8, False), (16, False), (32, False), (16, True), (32, True)]
if os.environ.get("SWEEP_CONFIGS"):
    CONFIGS = [(int(c.split(":")[0]), c.endswith(":c"))
               for c in os.environ["SWEEP_CONFIGS"].split(",")]

for chunk_t, cache_fe in CONFIGS:
    tag = f"chunk_t={chunk_t} cache_fe={int(cache_fe)}"
    res = os.path.join(tempfile.gettempdir(),
                       f"sweep_chunk_{chunk_t}_{int(cache_fe)}")
    os.system(f"rm -rf {res} {res}_warm")
    t0 = time.time()
    n = run_trajectory(params, cfg, traj, res + "_warm", verbose=False,
                       chunk_t=chunk_t, cache_features=cache_fe)
    print(f"{tag} pass1 (compile): {n} in {time.time()-t0:.1f}s",
          flush=True)
    fps_reps = []
    for rep in range(int(os.environ.get("SWEEP_REPS", "3"))):
        os.system(f"rm -rf {res}")
        t0 = time.time()
        n = run_trajectory(params, cfg, traj, res, verbose=False,
                           chunk_t=chunk_t, cache_features=cache_fe)
        dt = time.time() - t0
        fps_reps.append(n / dt)
        print(f"{tag} rep{rep}: {n} frames in {dt:.1f}s "
              f"= {n/dt:.2f} FPS", flush=True)
    print(f"RESULT {tag} fps_median={np.median(fps_reps):.2f} "
          f"reps={[round(f, 2) for f in fps_reps]}", flush=True)
