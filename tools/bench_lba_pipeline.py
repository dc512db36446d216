"""Measure the pose-free (DSO + LBA) pipeline on the real TPU.

VERDICT round-2 item 5: the reference's headline demo
(test_KVNet_LBA.py:306-528) needs a perf datum like the given-poses path.
Drives cli/test_kvnet_lba at the reference operating point (384x256, D=64,
LBA 20 it x 3 scales) on a synthetic scene with a DSO-format result derived
from the true poses; pass 1 compiles, pass 2 is the measurement (the CLI's
--timing flag prints the per-stage steady-state budget).

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_lba_pipeline.py
"""
import json
import os
import tempfile
import time

import numpy as np

from neuralrgbd_tpu.data.synthetic import write_scannet_scene

N_FRAMES = int(os.environ.get("LBA_BENCH_FRAMES", "60"))

root = os.path.join(tempfile.gettempdir(),
                    f"lba_bench_capture_{N_FRAMES}")
scene = os.path.join(root, "scene0000_00")
if not os.path.isdir(scene):
    write_scannet_scene(root, n_frames=N_FRAMES)

intrin_path = os.path.join(root, "cam_info.json")
with open(intrin_path, "w") as f:
    json.dump({"IntM": [[585.0, 0, 323.7], [0, 585.0, 237.9], [0, 0, 1]],
               "img_size": [640, 480]}, f)

result_path = os.path.join(root, "result.txt")
dso_scale = 7.0
with open(result_path, "w") as f:
    f.write("\n".join(
        f"{i} {0.02 * i * dso_scale} {1e-6} {1e-6} 1e-6 0 0 1"
        for i in range(N_FRAMES)) + "\n")

from neuralrgbd_tpu.cli.test_kvnet_lba import main  # noqa: E402

argv = [
    "--exp_name", "bench",
    "--img_glob", os.path.join(scene, "*.color.jpg"),
    "--intrin_path", intrin_path,
    "--dso_res_path", result_path,
    "--ndepth", "64", "--feature_dim", "64",
    "--d_min", "0.1", "--d_max", "5.0",
    "--img_width", "384", "--img_height", "256",
    "--LBA_max_iter", "20", "--LBA_step", "0.01",
    "--res_dir", os.path.join(tempfile.gettempdir(), "lba_bench_res"),
    "--timing",
]

t0 = time.time()
n = main(argv)
print(f"pass 1 (compile): {n} frames in {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
n = main(argv)
dt = time.time() - t0
print(f"pass 2: {n} frames in {dt:.1f}s => {n / dt:.2f} FPS "
      f"(incl first-window bootstrap)", flush=True)
