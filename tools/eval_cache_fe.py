"""Accuracy gate for the cached-feature inference path on TRAINED weights.

The cached paths (make_rollout(cache_features=True), run_trajectory
cache_features=True) replace the reference's joint window featurization
(basic.py:245-252 — BN batch statistics span the V+1 window frames) with
per-frame BN statistics, which is what makes a frame's features
window-independent and therefore cacheable (PERF.md "Cached-feature
rollout": 33.3 -> 39.0 FPS bench, 27.6 -> 30.6 FPS production loop).

This evaluates the holdout scenes with both semantics on the campaign
checkpoint — same params, same inputs — mirroring tools/eval_bf16.py's
gate for the bf16 default. Per-frame-BN features are recomputed per window
here; tests/test_rollout_cached.py proves the cached reuse is numerically
identical to that recompute, so this measures exactly the deployed path.

PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_cache_fe.py \
    --save_dir /tmp/campaign_ckpt_r3 --kind mixed --n_scenes 26 \
    --scenes 24 25
"""
import argparse
import json
import os
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

p = argparse.ArgumentParser()
p.add_argument("--save_dir", type=str, default="/tmp/campaign_ckpt_r3")
p.add_argument("--scenes", type=int, nargs="*", default=[24, 25],
               help="holdout scene indices (24/25 = the --wide holdouts)")
p.add_argument("--kind", type=str, default="mixed")
p.add_argument("--n_scenes", type=int, default=26)
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


def evaluate(cached: bool, tag: str):
    infer_step = make_infer_step(cfg, with_features=cached)
    fe1 = make_frame_features(cfg) if cached else None
    fe_win = None
    if cached:
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


m_win, p_win = evaluate(False, "window-BN (exact)")
m_pf, p_pf = evaluate(True, "per-frame-BN (cached)")

dd = np.stack([np.abs(a - b) for a, b in zip(p_win, p_pf)])
print(json.dumps({
    "abs_rel": [round(float(m_win["abs_rel"]), 5),
                round(float(m_pf["abs_rel"]), 5)],
    "delta1": [round(float(m_win["delta1"]), 5),
               round(float(m_pf["delta1"]), 5)],
    "rmse": [round(float(m_win["rmse"]), 5),
             round(float(m_pf["rmse"]), 5)],
    "depth_absdiff_mean_m": round(float(dd.mean()), 5),
    "depth_absdiff_p99_m": round(float(np.percentile(dd, 99)), 5),
    "depth_absdiff_max_m": round(float(dd.max()), 5),
}), flush=True)
