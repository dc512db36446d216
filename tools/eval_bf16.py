"""Close the bf16 inference-accuracy question on TRAINED weights.

Loads the campaign checkpoint (tools/train_campaign.py) and evaluates the
held-out scene with dtype=float32 vs dtype=bfloat16 compute — same params,
same inputs. Round-1 measured +8% bench throughput for bf16 but could only
check depth deltas on random weights; this is the trained-weights
validation (VERDICT round-2 item 4).
"""
import argparse
import json
import os
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

p = argparse.ArgumentParser()
p.add_argument("--save_dir", type=str, default="/tmp/campaign_ckpt")
p.add_argument("--scenes", type=int, nargs="*", default=[5],
               help="scene indices to evaluate (5 = campaign holdout)")
p.add_argument("--kind", type=str, default="plane",
               help="'mixed' + --n_scenes 26 --scenes 24 25 evaluates the"
                    " round-3 wide-campaign holdouts")
p.add_argument("--n_scenes", type=int, default=6)
p.add_argument("--knet_coarse_d", type=int, default=1,
               help="run both dtype arms at this K-Net coarse-D setting "
                    "(2 = the round-5 deployment-trained semantics)")
args = p.parse_args()

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.data.synthetic import synthetic_dataset
from neuralrgbd_tpu.data.trajectory import window_batch
from neuralrgbd_tpu.infer.metrics import MetricAccumulator, depth_metrics
from neuralrgbd_tpu.infer.step import make_infer_step
from neuralrgbd_tpu.train import create_train_state
from neuralrgbd_tpu.utils.checkpoint import (latest_checkpoint,
                                             restore_params_only)

cfg32 = ModelConfig()
prefix = "campaign_scenes" if args.kind == "plane" else     f"campaign_{args.kind}_scenes"
root = os.path.join(tempfile.gettempdir(),
                    f"{prefix}_{args.n_scenes}x24_384")
make_traj, _ = synthetic_dataset(cfg32, img_size_wh=(384, 256),
                                 n_scenes=args.n_scenes, n_frames=24,
                                 root=root, kind=args.kind)

sample, _, _ = window_batch(make_traj(0), cfg32.t_win_r, cfg32.t_win_r,
                            with_labels=True)
# TrainConfig must match the campaign's optimizer chain (grad clip adds
# opt-state leaves; a mismatched tree fails the orbax restore)
state = create_train_state(cfg32, TrainConfig(grad_clip_max=2.0), sample)
ckpt = latest_checkpoint(args.save_dir)
assert ckpt, f"no checkpoint under {args.save_dir}"
state = restore_params_only(ckpt, state)
print(f"weights: {ckpt} (step {int(state.step)})", flush=True)


def evaluate(cfg, tag):
    infer_step = make_infer_step(cfg)
    acc = MetricAccumulator()
    preds = []
    for s in args.scenes:
        traj = make_traj(s)
        D = cfg.ndepth
        w_dpv, h_dpv = traj.dpv_size_wh
        bvp = jnp.full((1, D, h_dpv, w_dpv), -np.log(D), jnp.float32)
        valid = jnp.zeros((1,), bool)
        for ref_indx in range(cfg.t_win_r, len(traj) - cfg.t_win_r - 1):
            b, rec, ok = window_batch(traj, ref_indx, cfg.t_win_r)
            assert ok
            out = infer_step(state.params, jax.tree.map(jnp.asarray, b),
                             bvp, valid)
            bvp, valid = out.bv_predict, jnp.ones((1,), bool)
            d = np.asarray(out.depth[0], np.float64)
            preds.append(d)
            acc.update(depth_metrics(d, rec.dmap_imgsize,
                                     d_min=cfg.d_min, d_max=cfg.d_max))
    res = acc.result()
    print(f"EVAL[{tag}] " + json.dumps(
        {k: round(float(v), 5) for k, v in res.items()}), flush=True)
    return res, preds


# infer_dtype=None: make_infer_step otherwise promotes the default config
# to bf16 on TPU (the round-2 default flip), which would make both arms
# identical — the fp32 arm must pin the training dtype explicitly.
m32, p32 = evaluate(ModelConfig(infer_dtype=None,
                                knet_coarse_d=args.knet_coarse_d), "fp32")
m16, p16 = evaluate(ModelConfig(dtype="bfloat16",
                                knet_coarse_d=args.knet_coarse_d), "bf16")

dd = np.stack([np.abs(a - b) for a, b in zip(p32, p16)])
print(json.dumps({
    "abs_rel": [round(float(m32["abs_rel"]), 5),
                round(float(m16["abs_rel"]), 5)],
    "delta1": [round(float(m32["delta1"]), 5),
               round(float(m16["delta1"]), 5)],
    "rmse": [round(float(m32["rmse"]), 5), round(float(m16["rmse"]), 5)],
    "depth_absdiff_mean_m": round(float(dd.mean()), 5),
    "depth_absdiff_p99_m": round(float(np.percentile(dd, 99)), 5),
    "depth_absdiff_max_m": round(float(dd.max()), 5),
}), flush=True)
