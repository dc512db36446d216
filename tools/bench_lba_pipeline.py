"""Measure the pose-free (DSO + LBA) pipeline on the real TPU.

VERDICT round-4 item 1: the reference's headline demo
(test_KVNet_LBA.py:306-528) needs a published end-to-end FPS for BOTH
pose-graph arms. Drives cli/test_kvnet_lba at the reference operating
point (384x256, D=64, LBA 20 it x 3 scales, V=4) on a synthetic scene
with a DSO-format result derived from the true poses.

The CLI's --timing flag excludes the first 2 compile-polluted steady
frames and reports wall-clock FPS through the final export flush (async
dispatches make per-stage host times enqueue costs, not device times, on
the device pose graph), so ONE pass per arm is an honest measurement.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_lba_pipeline.py
Env: LBA_BENCH_FRAMES (default 80), LBA_BENCH_ARMS (default host,device),
     LBA_BENCH_COARSE (default 1 = exact K-Net semantics).
"""
import contextlib
import io
import json
import os
import re
import tempfile
import time

from neuralrgbd_tpu.data.synthetic import write_scannet_scene

N_FRAMES = int(os.environ.get("LBA_BENCH_FRAMES", "80"))
ARMS = os.environ.get("LBA_BENCH_ARMS", "host,device").split(",")
COARSE = os.environ.get("LBA_BENCH_COARSE", "1")
# trained weights matter here beyond accuracy: with random init the LBA
# optimizes garbage depth maps and can diverge to NaN poses, which the
# host arm's validity gate then skips (deflating its frame count)
MODEL = os.environ.get("LBA_BENCH_MODEL", "")

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


def run_arm(arm: str):
    argv = [
        "--exp_name", f"bench_{arm}",
        "--img_glob", os.path.join(scene, "*.color.jpg"),
        "--intrin_path", intrin_path,
        "--dso_res_path", result_path,
        "--ndepth", "64", "--feature_dim", "64",
        "--d_min", "0.1", "--d_max", "5.0",
        "--img_width", "384", "--img_height", "256",
        "--LBA_max_iter", "20", "--LBA_step", "0.01",
        "--knet_coarse_d", COARSE,
        "--res_dir", os.path.join(tempfile.gettempdir(), "lba_bench_res"),
        "--pose_graph", arm,
        "--timing",
    ]
    if MODEL:
        argv += ["--model_path", MODEL]
    t0 = time.time()
    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            import sys
            sys.__stdout__.write(s)
            return len(s)

        def flush(self):
            import sys
            sys.__stdout__.flush()

    with contextlib.redirect_stdout(Tee()):
        n = main(argv)
    wall = time.time() - t0
    out = buf.getvalue()
    m = re.search(r"TIMING (.*)", out)
    stats = {"arm": arm, "frames_exported": n, "total_wall_s": round(wall, 1)}
    if m:
        for kv in m.group(1).split():
            if "=" in kv:
                k, v = kv.split("=", 1)
                v = v.replace("ms", "")
                try:
                    stats[k] = float(v)
                except ValueError:
                    pass
    print("LBA_BENCH " + json.dumps(stats), flush=True)
    return stats


results = [run_arm(a.strip()) for a in ARMS if a.strip()]
print(json.dumps({"operating_point":
                  {"img": "384x256", "D": 64, "lba": "20it x 3 scales",
                   "V": 4, "frames": N_FRAMES, "coarse_knet": COARSE},
                  "arms": results}, indent=1))
