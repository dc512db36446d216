"""Accuracy gate for the coarse-D K-Net deviation on TRAINED weights.

The deviation (ModelConfig.knet_coarse_d=2): the K-Net input volume is
linearly downsampled along D (align_corners grid), the 3-D CNN runs at D/2,
and the 1-channel gain is D-upsampled back via the reference's own
trilinear branch (basic.py:128-139, ported at models/knet.py). This halves
the dominant conv cost (PERF.md "Coarse-D K-Net").

Mirrors tools/eval_cache_fe.py: same params, same holdout scenes, exact vs
coarse arms, plus the deployment-stack arm (coarse + cached features).

PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_coarse_knet.py \
    --save_dir /tmp/campaign_ckpt_r4/best --kind mixed3 --n_scenes 51 \
    --scenes 48 49 50
"""
import argparse
import json
import os
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

p = argparse.ArgumentParser()
p.add_argument("--save_dir", type=str, default="/tmp/campaign_ckpt_r4/best")
p.add_argument("--scenes", type=int, nargs="*", default=[48, 49, 50],
               help="holdout scene indices (48/49/50 = the r4 --wide holdouts)")
p.add_argument("--kind", type=str, default="mixed3")
p.add_argument("--n_scenes", type=int, default=51)
p.add_argument("--coarse", type=int, default=2)
args = p.parse_args()

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.data.synthetic import synthetic_dataset
from neuralrgbd_tpu.data.trajectory import window_batch
from neuralrgbd_tpu.infer.metrics import MetricAccumulator, depth_metrics
from neuralrgbd_tpu.infer.step import make_frame_features, make_infer_step
from neuralrgbd_tpu.train import create_train_state
from neuralrgbd_tpu.utils.checkpoint import (latest_checkpoint,
                                             restore_params_only)

cfg = ModelConfig()
prefix = ("campaign_scenes" if args.kind == "plane"
          else f"campaign_{args.kind}_scenes")
root = os.path.join(tempfile.gettempdir(),
                    f"{prefix}_{args.n_scenes}x24_384")
make_traj, _ = synthetic_dataset(cfg, img_size_wh=(384, 256),
                                 n_scenes=args.n_scenes, n_frames=24,
                                 root=root, kind=args.kind)

sample, _, _ = window_batch(make_traj(0), cfg.t_win_r, cfg.t_win_r,
                            with_labels=True)
state = create_train_state(cfg, TrainConfig(grad_clip_max=2.0), sample)
ckpt = latest_checkpoint(args.save_dir)
assert ckpt, f"no checkpoint under {args.save_dir}"
state = restore_params_only(ckpt, state)
print(f"weights: {ckpt} (step {int(state.step)})", flush=True)


def evaluate(coarse: int, cached: bool, tag: str):
    infer_step = make_infer_step(cfg, coarse_knet=coarse,
                                 with_features=cached)
    fe_win = None
    if cached:
        fe1 = make_frame_features(cfg)
        fe_win = jax.jit(jax.vmap(lambda p, f: fe1(p, f),
                                  in_axes=(None, 0)))
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
            sb = jax.tree.map(jnp.asarray, b)
            if cached:
                window = jnp.concatenate([sb["srcs"][0], sb["ref"]], axis=0)
                l1s, fs = fe_win(state.params, window)
                out = infer_step(state.params, sb, bvp, valid,
                                 (l1s[None], fs[None]))
            else:
                out = infer_step(state.params, sb, bvp, valid)
            bvp, valid = out.bv_predict, jnp.ones((1,), bool)
            d = np.asarray(out.depth[0], np.float64)
            preds.append(d)
            acc.update(depth_metrics(d, rec.dmap_imgsize,
                                     d_min=cfg.d_min, d_max=cfg.d_max))
    res = acc.result()
    print(f"EVAL[{tag}] " + json.dumps(
        {k: round(float(v), 5) for k, v in res.items()}), flush=True)
    return res, preds


m_exact, p_exact = evaluate(1, False, "exact (full-D K-Net, window BN)")
m_coarse, p_coarse = evaluate(args.coarse, False,
                              f"coarse-D/{args.coarse} K-Net")
m_deploy, p_deploy = evaluate(args.coarse, True,
                              f"deployment (coarse-D/{args.coarse} + cached FE)")

dd = np.stack([np.abs(a - b) for a, b in zip(p_exact, p_coarse)])
print(json.dumps({
    "abs_rel": {"exact": round(float(m_exact["abs_rel"]), 5),
                "coarse": round(float(m_coarse["abs_rel"]), 5),
                "deploy": round(float(m_deploy["abs_rel"]), 5)},
    "delta1": {"exact": round(float(m_exact["delta1"]), 5),
               "coarse": round(float(m_coarse["delta1"]), 5),
               "deploy": round(float(m_deploy["delta1"]), 5)},
    "rmse": {"exact": round(float(m_exact["rmse"]), 5),
             "coarse": round(float(m_coarse["rmse"]), 5),
             "deploy": round(float(m_deploy["rmse"]), 5)},
    "coarse_vs_exact_depth_absdiff_mean_m": round(float(dd.mean()), 5),
    "coarse_vs_exact_depth_absdiff_p99_m": round(
        float(np.percentile(dd, 99)), 5),
    "coarse_vs_exact_depth_absdiff_max_m": round(float(dd.max()), 5),
}), flush=True)
