"""Evaluation CLI: run inference over trajectories and report depth metrics.

Closes the loop the reference left offline (it exported .mat files and
computed abs-rel / delta<1.25 externally — export_res.py:123-137):

  python -m neuralrgbd_tpu.cli.evaluate --dataset scannet \
      --dataset_path /data/scan-net-5-frame --split_file val.txt \
      --model_path ckpt --traj_idx 0 1 2
Prints one JSON line with the aggregated metric suite.
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser():
    from neuralrgbd_tpu.cli.test_kvnet import build_parser as base

    p = base()
    p.description = "KV-Net evaluation (metrics over GT depth)"
    p.add_argument("--max_frames", type=int, default=None,
                   help="cap evaluated frames per trajectory")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuralrgbd_tpu.cli.test_kvnet import _init_or_load_params
    from neuralrgbd_tpu.config import ModelConfig
    from neuralrgbd_tpu.data.trajectory import window_batch
    from neuralrgbd_tpu.infer.metrics import MetricAccumulator, depth_metrics
    from neuralrgbd_tpu.infer.step import make_infer_step

    cfg = ModelConfig(
        feature_dim=args.feature_dim, kv_feature_dim=args.feature_dim,
        ndepth=args.ndepth, d_min=args.d_min, d_max=args.d_max,
        sigma_soft_max=args.sigma_soft_max, t_win_r=args.t_win,
    )
    from neuralrgbd_tpu.cli.test_kvnet import main as _unused  # noqa: F401

    # reuse the dataset factory from the test CLI
    import neuralrgbd_tpu.cli.test_kvnet as tk

    ns = argparse.Namespace(**vars(args))
    get_traj = None

    def make_get_traj():
        # mirror tk.main's inner get_traj without running inference
        img_wh = (args.img_width, args.img_height)

        def get(idx):
            if args.dataset == "synthetic":
                from neuralrgbd_tpu.data.synthetic import synthetic_dataset

                make_traj, n = synthetic_dataset(cfg, img_size_wh=img_wh)
                return make_traj(idx % n)
            if args.dataset == "scannet":
                from neuralrgbd_tpu.data.scannet import make_trajectory

                return make_trajectory(idx, args.frame_interv,
                                       args.dataset_path, args.split_file,
                                       img_size_wh=img_wh,
                                       d_candi=cfg.d_candi)
            if args.dataset == "7scenes":
                from neuralrgbd_tpu.data.sevenscenes import make_trajectory

                return make_trajectory(idx, args.dataset_path,
                                       args.dat_indx_step,
                                       img_size_wh=img_wh,
                                       d_candi=cfg.d_candi)
            if args.dataset == "kitti":
                from neuralrgbd_tpu.data.kitti import make_trajectory

                return make_trajectory(idx, args.dataset_path,
                                       img_size_wh=img_wh,
                                       d_candi=cfg.d_candi)
            raise ValueError(args.dataset)

        return get

    get_traj = make_get_traj()
    params, _torch_imported = _init_or_load_params(cfg, args, get_traj(args.traj_idx[0]))
    infer_step = make_infer_step(cfg)
    acc = MetricAccumulator()

    for traj_idx in args.traj_idx:
        traj = get_traj(traj_idx)
        D = cfg.ndepth
        w_dpv, h_dpv = traj.dpv_size_wh
        bvp = jnp.full((1, D, h_dpv, w_dpv), -np.log(D), jnp.float32)
        valid_c = jnp.zeros((1,), bool)
        lo, hi = cfg.t_win_r, len(traj) - cfg.t_win_r - 1
        if args.max_frames is not None:
            hi = min(hi, lo + args.max_frames)
        for ref_indx in range(lo, hi):
            batch_np, ref_rec, ok = window_batch(traj, ref_indx, cfg.t_win_r)
            if not ok or ref_rec.dmap_imgsize is None:
                valid_c = jnp.zeros((1,), bool)
                continue
            out = infer_step(params, jax.tree.map(jnp.asarray, batch_np),
                             bvp, valid_c)
            bvp = out.bv_predict
            valid_c = jnp.ones((1,), bool)
            m = depth_metrics(np.asarray(out.depth[0]),
                              ref_rec.dmap_imgsize,
                              d_min=cfg.d_min, d_max=cfg.d_max)
            acc.update(m)

    result = {k: round(v, 5) if isinstance(v, float) else v
              for k, v in acc.result().items()}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
