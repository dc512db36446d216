"""Training campaign at the full operating point (VERDICT round-2 item 6).

Trains KV-Net on multi-view-consistent synthetic plane scenes at the
reference operating point (384x256, D=64, t_win=2) and reports held-out
abs-rel / delta<1.25 before vs after, proving loss AND eval metrics improve
together. Supports mid-run kill + --resume (exercises checkpoint/restore on
the real device).

  python tools/train_campaign.py --max_steps 600
  python tools/train_campaign.py --max_steps 600 --resume   # 600 more

On CPU, pass --mesh to run data-parallel over the 8 virtual devices
(JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8) at a reduced
operating point — the multi-epoch DP-loop mechanics proof.
"""
import argparse
import json
import os
import tempfile
import time

import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--max_steps", type=int, default=600)
p.add_argument("--epochs", type=int, default=None,
               help="run whole epochs instead of a step budget")
p.add_argument("--resume", action="store_true")
p.add_argument("--mesh", action="store_true",
               help="CPU 8-virtual-device DP mesh at reduced op point")
p.add_argument("--lr", type=float, default=1e-4)
p.add_argument("--save_dir", type=str, default="/tmp/campaign_ckpt")
p.add_argument("--eval_frames", type=int, default=None)
p.add_argument("--scenes", type=int, default=None,
               help="training scenes (default: 5 legacy, 48 with --wide)")
p.add_argument("--wide", action="store_true",
               help="round-4 operating point: 48 mixed3 plane/multiplane/"
                    "curved scenes + photometric augmentation + pose noise, "
                    "periodic holdout evals, cosine LR decay")
p.add_argument("--kind", type=str, default=None,
               help="scene kind (default: mixed3 with --wide, plane else)")
p.add_argument("--eval_every", type=int, default=1000,
               help="holdout eval every N steps (--wide)")
p.add_argument("--augment", action="store_true")
p.add_argument("--pose_noise", type=float, default=0.0)
p.add_argument("--lr_schedule", type=str, default=None,
               help="constant|cosine|step (default: cosine with --wide)")
p.add_argument("--lr_decay_steps", type=int, default=0,
               help="cosine horizon / step period (default: max_steps)")
p.add_argument("--lr_warmup_steps", type=int, default=0)
p.add_argument("--knet_coarse_d", type=int, default=1,
               help="train with the coarse-D K-Net deviation enabled")
p.add_argument("--fe_per_frame_bn", action="store_true",
               help="train with per-frame FE BatchNorm statistics — the "
                    "cached-feature deployment semantics "
                    "(ModelConfig.fe_per_frame_bn)")
args = p.parse_args()

if args.mesh:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp

if args.mesh:
    jax.config.update("jax_platforms", "cpu")

from neuralrgbd_tpu.config import ModelConfig, TrainConfig
from neuralrgbd_tpu.data.synthetic import synthetic_dataset
from neuralrgbd_tpu.data.trajectory import window_batch
from neuralrgbd_tpu.infer.metrics import MetricAccumulator, depth_metrics
from neuralrgbd_tpu.infer.step import make_infer_step
from neuralrgbd_tpu.train import create_train_state
from neuralrgbd_tpu.train.loop import train_epochs
from neuralrgbd_tpu.utils.checkpoint import (latest_checkpoint,
                                             restore_checkpoint,
                                             save_checkpoint)

if args.mesh:
    cfg = ModelConfig(ndepth=32, feature_dim=32, kv_feature_dim=32)
    img_wh, n_train, n_frames, batch = (128, 96), 8, 16, 8
    kind = "plane"
else:
    cfg = ModelConfig(knet_coarse_d=args.knet_coarse_d,  # 384x256, D=64
                      fe_per_frame_bn=args.fe_per_frame_bn)
    img_wh, n_frames, batch = (384, 256), 24, 1
    n_train = args.scenes or (48 if args.wide else 5)
    kind = args.kind or ("mixed3" if args.wide else "plane")
if args.wide:
    args.augment = True
    if not args.pose_noise:
        args.pose_noise = 0.02
    if args.lr_schedule is None:
        args.lr_schedule = "cosine"

tcfg = TrainConfig(lr=args.lr, n_epoch=args.epochs or 10_000, seed=0,
                   grad_clip_max=2.0, save_model_interv=10_000,
                   augment=args.augment, pose_noise_level=args.pose_noise,
                   lr_schedule=args.lr_schedule or "constant",
                   lr_decay_steps=(args.lr_decay_steps
                                   or (args.max_steps or 0)),
                   lr_warmup_steps=args.lr_warmup_steps)
if args.epochs:
    args.max_steps = None

# one holdout per geometry kind in the cycle, never trained on
n_hold = 3 if kind == "mixed3" else 2
root = os.path.join(
    tempfile.gettempdir(),
    f"campaign_{kind}_scenes_{n_train + n_hold}x{n_frames}_{img_wh[0]}")
make_traj, _ = synthetic_dataset(cfg, img_size_wh=img_wh,
                                 n_scenes=n_train + n_hold,
                                 n_frames=n_frames, root=root, kind=kind)
holdouts = [make_traj(n_train + j) for j in range(n_hold)]
holdout = holdouts[0]

print("devices:", jax.devices(), flush=True)

sample, _, _ = window_batch(make_traj(0), cfg.t_win_r, cfg.t_win_r,
                            with_labels=True)
state = create_train_state(cfg, tcfg, sample)

if args.resume:
    ckpt = latest_checkpoint(args.save_dir)
    assert ckpt, f"--resume with no checkpoint under {args.save_dir}"
    state, extra = restore_checkpoint(ckpt, state)
    print(f"resumed from {ckpt} at step {int(state.step)}", flush=True)


_INFER_STEP = None


def evaluate(params, tag):
    global _INFER_STEP
    if _INFER_STEP is None:
        _INFER_STEP = make_infer_step(cfg)
    infer_step = _INFER_STEP
    acc = MetricAccumulator()
    D = cfg.ndepth
    evals = holdouts if args.wide else [holdout]
    for ho in evals:
        w_dpv, h_dpv = ho.dpv_size_wh
        bvp = jnp.full((1, D, h_dpv, w_dpv), -np.log(D), jnp.float32)
        valid = jnp.zeros((1,), bool)
        lo, hi = cfg.t_win_r, len(ho) - cfg.t_win_r - 1
        if args.eval_frames:
            hi = min(hi, lo + args.eval_frames)
        for ref_indx in range(lo, hi):
            b, rec, ok = window_batch(ho, ref_indx, cfg.t_win_r)
            assert ok
            out = infer_step(params, jax.tree.map(jnp.asarray, b), bvp, valid)
            bvp, valid = out.bv_predict, jnp.ones((1,), bool)
            acc.update(depth_metrics(np.asarray(out.depth[0]),
                                     rec.dmap_imgsize,
                                     d_min=cfg.d_min, d_max=cfg.d_max))
    res = acc.result()
    print(f"EVAL[{tag}] " + json.dumps(
        {k: round(float(v), 4) for k, v in res.items()}), flush=True)
    return res


train_step = None
if args.mesh:
    from neuralrgbd_tpu.parallel import make_mesh, make_sharded_train_step

    mesh = make_mesh()
    train_step = make_sharded_train_step(cfg, tcfg, mesh)
    print(f"DP over {mesh.devices.size} devices", flush=True)

m0 = evaluate(state.params, f"step{int(state.step)}")
best = {"abs_rel": float("inf"), "step": int(state.step)}


def periodic_eval(st, total_iter):
    m = evaluate(st.params, f"step{int(st.step)}")
    if float(m["abs_rel"]) < best["abs_rel"]:
        best.update(abs_rel=float(m["abs_rel"]),
                    delta1=float(m["delta1"]), step=int(st.step))
        save_checkpoint(os.path.join(args.save_dir, "best"), int(st.step), st)
        print(f"  new best abs_rel {best['abs_rel']:.4f} "
              f"@ step {best['step']} (checkpointed)", flush=True)


t0 = time.time()
state = train_epochs(state, cfg, tcfg, make_traj, n_train, batch,
                     train_step=train_step, save_dir=args.save_dir,
                     max_steps=args.max_steps,
                     eval_every=(args.eval_every if args.wide else None),
                     eval_fn=(periodic_eval if args.wide else None))
dt = time.time() - t0
print(f"trained to step {int(state.step)} in {dt:.0f}s", flush=True)
m1 = evaluate(state.params, f"step{int(state.step)}")

print(json.dumps({
    "campaign": ("mesh-cpu" if args.mesh
                 else "tpu-wide" if args.wide else "tpu-full-op-point"),
    "scenes": n_train, "augment": bool(args.augment),
    "pose_noise": args.pose_noise,
    "steps": int(state.step),
    "abs_rel": [round(float(m0["abs_rel"]), 4),
                round(float(m1["abs_rel"]), 4)],
    "delta1": [round(float(m0["delta1"]), 4), round(float(m1["delta1"]), 4)],
    "best": best if best["abs_rel"] < float("inf") else None,
}), flush=True)
