"""Practical multi-trajectory throughput on ONE chip (VERDICT r4 item 8).

The recorded negative (PERF.md "Multi-lane inference on one chip"): lanes
share the chip's compute, so N-lane lockstep inference is not faster per
frame. What was NOT recorded is the practical aggregate for a batch of
RAGGED-length trajectories — the reference's DataParallel inference shape
(test_KVNet.py:163) — where the lockstep loop additionally pays padding:
every lane steps until the LONGEST trajectory finishes, shorter lanes
contributing dead work via the validity mask.

This measures, on real files-on-disk scenes of ragged lengths:
  (a) sequential run_trajectory per scene (the recommended deployment)
  (b) run_trajectories_parallel lockstep lanes on the single chip
and reports aggregate frames/sec over the whole batch.

Env: MT_LENGTHS (default "48,96,192"), MT_CHUNK (default 16).
PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_multi_traj.py
"""
import json
import os
import shutil
import tempfile
import time

import jax

from neuralrgbd_tpu.config import ModelConfig
from neuralrgbd_tpu.data.scannet import make_trajectory
from neuralrgbd_tpu.data.synthetic import write_scannet_scene
from neuralrgbd_tpu.infer.loop import run_trajectories_parallel, run_trajectory

LENGTHS = [int(x) for x in os.environ.get("MT_LENGTHS", "48,96,192").split(",")]
CHUNK = int(os.environ.get("MT_CHUNK", "16"))

cfg = ModelConfig(knet_coarse_d=int(os.environ.get("MT_COARSE", "2")))

trajs = []
for li, L in enumerate(LENGTHS):
    root = os.path.join(tempfile.gettempdir(), f"mt_scene_{L}_{li}")
    if not os.path.isdir(os.path.join(root, "scene0000_00")):
        write_scannet_scene(root, n_frames=L, seed=100 + li)
    trajs.append(make_trajectory(0, 5, root, img_size_wh=(384, 256),
                                 d_candi=cfg.d_candi))
print("lengths:", [len(t) for t in trajs], "devices:", jax.devices(),
      flush=True)


class _Args:
    t_win = cfg.t_win_r
    model_path = None
    refine_net = "DPV"


from neuralrgbd_tpu.cli.test_kvnet import _init_or_load_params  # noqa: E402

params, _ = _init_or_load_params(cfg, _Args(), trajs[0])

out_root = tempfile.mkdtemp(prefix="mt_res_")


def res_dir(tag, i):
    return os.path.join(out_root, f"{tag}_{i}")


def run_sequential():
    t0 = time.time()
    n = 0
    for i, t in enumerate(trajs):
        n += run_trajectory(params, cfg, t, res_dir("seq", i),
                            chunk_t=CHUNK, verbose=False)
    return n, time.time() - t0


def run_lockstep():
    # explicit 1-device mesh: all lanes batch onto THIS chip (the default
    # make_mesh(n) would fall back to the virtual-CPU mesh when n exceeds
    # the real device count, which is not the one-chip question)
    from neuralrgbd_tpu.parallel import make_mesh

    t0 = time.time()
    counts = run_trajectories_parallel(
        params, cfg, trajs, [res_dir("par", i) for i in range(len(trajs))],
        mesh=make_mesh(1), chunk_t=CHUNK, verbose=False)
    return sum(counts), time.time() - t0


# pass 1 compiles each path; pass 2 is the measurement
for fn, tag in ((run_sequential, "sequential"), (run_lockstep, "lockstep")):
    n, dt = fn()
    print(f"{tag} pass1 (compile): {n} frames in {dt:.1f}s", flush=True)
results = {}
for fn, tag in ((run_sequential, "sequential"), (run_lockstep, "lockstep")):
    n, dt = fn()
    results[tag] = {"frames": n, "wall_s": round(dt, 1),
                    "agg_fps": round(n / dt, 2)}
    print(f"{tag}: {n} frames in {dt:.1f}s = {n / dt:.2f} FPS aggregate",
          flush=True)

print(json.dumps({"lengths": LENGTHS, "chunk_t": CHUNK, **results}),
      flush=True)
shutil.rmtree(out_root, ignore_errors=True)
