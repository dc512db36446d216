"""Inference CLI with given poses — the ``test_KVNet.py`` equivalent.

Example (the run_demo.sh operating point):
  python -m neuralrgbd_tpu.cli.test_kvnet \
      --dataset 7scenes --dataset_path /data/7scenes \
      --model_path saved_models/exp/ckpt_00005000 \
      --sigma_soft_max 10 --t_win 2 --d_min .1 --d_max 5. \
      --ndepth 64 --feature_dim 64 --res_dir results/demo
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="KV-Net inference (given poses)")
    p.add_argument("--exp_name", type=str, default="exp")
    p.add_argument("--dataset", type=str, default="scannet",
                   choices=["scannet", "7scenes", "kitti", "synthetic"])
    p.add_argument("--dataset_path", type=str, default=".")
    p.add_argument("--split_file", type=str, default=None)
    p.add_argument("--model_path", type=str, default=None,
                   help="orbax checkpoint dir; random init if omitted")
    p.add_argument("--t_win", type=int, default=2)
    p.add_argument("--d_min", type=float, default=0.1)
    p.add_argument("--d_max", type=float, default=5.0)
    p.add_argument("--ndepth", type=int, default=64)
    p.add_argument("--sigma_soft_max", type=float, default=10.0)
    p.add_argument("--refine_net", type=str, default="DPV",
                   choices=["DPV", "DGF"],
                   help="refinement head (--refineNet_name, KVNET.py:80-85)")
    p.add_argument("--feature_dim", type=int, default=64)
    p.add_argument("--frame_interv", type=int, default=5)
    p.add_argument("--dat_indx_step", type=int, default=1,
                   help="window stride (7scenes test uses 3)")
    p.add_argument("--traj_idx", type=int, nargs="*", default=[0])
    p.add_argument("--img_width", type=int, default=384)
    p.add_argument("--img_height", type=int, default=256)
    p.add_argument("--crop_w", type=int, default=384,
                   help="KITTI center-crop width after resize "
                        "(train_KVNet.py:229-237)")
    p.add_argument("--res_dir", type=str, default="results")
    p.add_argument("--multi_device", action="store_true",
                   help="run the listed --traj_idx trajectories in lockstep, "
                        "one per device (data mesh)")
    p.add_argument("--chunk_t", type=int, default=32,
                   help="frames scanned per device dispatch (1 = per-frame "
                        "stepping)")
    p.add_argument("--knet_coarse_d", type=int, default=1,
                   help="run the K-Net gain at D/this (accuracy-gated "
                        "deviation, PERF.md 'Coarse-D K-Net'; 1 = exact "
                        "reference semantics)")
    p.add_argument("--cache_features", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="featurize each unique frame once (per-frame BN "
                        "statistics; accuracy-gated deviation, PERF.md "
                        "'Cached-feature rollout'). Default: on for chunked "
                        "TPU runs, off elsewhere; --no-cache_features forces "
                        "the reference's joint-window semantics")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from neuralrgbd_tpu.config import ModelConfig
    from neuralrgbd_tpu.infer.loop import run_trajectory
    from neuralrgbd_tpu.infer.step import make_infer_step

    cfg = ModelConfig(
        feature_dim=args.feature_dim, kv_feature_dim=args.feature_dim,
        ndepth=args.ndepth, d_min=args.d_min, d_max=args.d_max,
        sigma_soft_max=args.sigma_soft_max, t_win_r=args.t_win,
        refine_net=args.refine_net, knet_coarse_d=args.knet_coarse_d,
    )
    img_wh = (args.img_width, args.img_height)

    def get_traj(idx):
        if args.dataset == "synthetic":
            # self-contained demo: write consistent plane scenes, run on them
            from neuralrgbd_tpu.data.synthetic import synthetic_dataset

            make_traj, n = synthetic_dataset(cfg, img_size_wh=img_wh)
            return make_traj(idx % n)
        if args.dataset == "scannet":
            from neuralrgbd_tpu.data.scannet import make_trajectory

            return make_trajectory(
                idx, args.frame_interv, args.dataset_path, args.split_file,
                img_size_wh=img_wh, d_candi=cfg.d_candi,
            )
        elif args.dataset == "7scenes":
            from neuralrgbd_tpu.data.sevenscenes import make_trajectory

            return make_trajectory(
                idx, args.dataset_path, args.dat_indx_step,
                img_size_wh=img_wh, d_candi=cfg.d_candi,
            )
        elif args.dataset == "kitti":
            from neuralrgbd_tpu.data.kitti import make_trajectory

            return make_trajectory(
                idx, args.dataset_path, img_size_wh=img_wh,
                crop_w=args.crop_w, d_candi=cfg.d_candi,
            )
        raise ValueError(args.dataset)

    params, torch_imported = _init_or_load_params(
        cfg, args, get_traj(args.traj_idx[0]))

    # provenance-aware cached-feature default: the deviation's accuracy
    # gate ran on weights trained here, not on reference torch imports
    from neuralrgbd_tpu.infer.loop import resolve_cache_features

    args.cache_features, cache_warn = resolve_cache_features(
        args.cache_features, torch_imported)
    if cache_warn:
        print(f"WARNING: {cache_warn}")

    if args.multi_device and len(args.traj_idx) > 1:
        from neuralrgbd_tpu.infer.loop import run_trajectories_parallel

        trajs = [get_traj(i) for i in args.traj_idx]
        res_dirs = [os.path.join(args.res_dir, f"{args.exp_name}_{i}")
                    for i in args.traj_idx]
        counts = run_trajectories_parallel(
            params, cfg, trajs, res_dirs, chunk_t=max(1, args.chunk_t),
            cache_features=args.cache_features)
        for i, n in zip(args.traj_idx, counts):
            print(f"trajectory {i}: exported {n} frames")
        return

    infer_step = make_infer_step(cfg) if args.chunk_t == 1 else None
    for traj_idx in args.traj_idx:
        traj = get_traj(traj_idx)
        res_dir = os.path.join(args.res_dir, f"{args.exp_name}_{traj_idx}")
        n = run_trajectory(params, cfg, traj, res_dir, infer_step=infer_step,
                           chunk_t=args.chunk_t,
                           cache_features=args.cache_features)
        print(f"trajectory {traj_idx}: exported {n} frames to {res_dir}")


def _init_or_load_params(cfg, args, traj):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuralrgbd_tpu.models.kvnet import KVNet
    from neuralrgbd_tpu.ops.camera import camera_from_K

    model = KVNet(cfg=cfg)
    rec = traj.frame(args.t_win)
    V = cfg.n_views
    H, W = rec.img.shape[:2]
    D = cfg.ndepth
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rec.img),
        jnp.zeros((V, H, W, 3), jnp.float32),
        jnp.tile(jnp.eye(4), (V, 1, 1)),
        camera_from_K(traj.K_dpv),
        jnp.asarray(cfg.d_candi),
        jnp.full((D, H // 4, W // 4), -np.log(D), jnp.float32),
        jnp.asarray(False),
    )
    if args.model_path and args.model_path.endswith((".tar", ".pth", ".pt")):
        # reference-released torch checkpoint (kvnet_scannet.tar etc.)
        from neuralrgbd_tpu.utils.torch_import import (
            import_torch_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(args.model_path)
        params, report = import_torch_state_dict(
            sd, params, refine_net=args.refine_net)
        print(f"imported {report['n_imported']}/{report['n_params_total']} "
              f"tensors from torch checkpoint {args.model_path}")
        if report["unmatched_torch_keys"]:
            print(f"  unmatched torch keys: "
                  f"{report['unmatched_torch_keys'][:8]} ...")
        if report["shape_mismatches"]:
            print(f"  SHAPE MISMATCHES: {report['shape_mismatches'][:8]}")
        # torch tensors/ndarrays live on host — commit to device once so
        # per-frame dispatches don't re-upload the param set (see
        # utils/checkpoint.restore_params_partial)
        return jax.device_put(params), True
    elif args.model_path:
        from neuralrgbd_tpu.utils.checkpoint import restore_params_partial

        params, n_hit = restore_params_partial(args.model_path, params)
        print(f"loaded {n_hit} tensors from {args.model_path}")
    else:
        print("WARNING: no --model_path given; using random init")
    return params, False


if __name__ == "__main__":
    main()
