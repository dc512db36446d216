"""Pose-free pipeline CLI: DSO initial poses + KV-Net + Local Bundle
Adjustment — the ``test_KVNet_LBA.py`` equivalent.

Flow per frame (reference test_KVNet_LBA.py:306-528):
  1. gate on DSO pose validity; periodic refresh back to the DSO trajectory;
  2. first valid window: estimate the metric scale from DSO baselines and
     rescale the trajectory (:352-366);
  3. KV-Net inference with explicit next-frame pose; export depth/conf;
  4. regress depth+confidence from the refined DPV, resample it into the
     next frame, and run LBA (first window: all frames vs ref; steady state:
     the next window vs the next ref, optionally injecting DSO R/t);
  5. write the optimized relative poses back into the trajectory.
"""

from __future__ import annotations

import argparse
import copy
import math
import os
import threading

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="KV-Net + DSO + LBA (pose-free)")
    p.add_argument("--exp_name", type=str, default="lba")
    p.add_argument("--img_glob", type=str, required=True,
                   help="glob for input images (single-folder capture)")
    p.add_argument("--intrin_path", type=str, required=True,
                   help=".mat/.json/.npz with IntM + img_size")
    p.add_argument("--dso_res_path", type=str, required=True,
                   help="DSO result.txt (run cli.run_dso first)")
    p.add_argument("--dso_filter", action="store_true",
                   help="Butterworth-smooth the DSO translation track")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--t_win", type=int, default=2)
    p.add_argument("--d_min", type=float, default=0.1)
    p.add_argument("--d_max", type=float, default=5.0)
    p.add_argument("--ndepth", type=int, default=64)
    p.add_argument("--sigma_soft_max", type=float, default=10.0)
    p.add_argument("--feature_dim", type=int, default=64)
    p.add_argument("--img_width", type=int, default=384)
    p.add_argument("--img_height", type=int, default=256)
    p.add_argument("--LBA_max_iter", type=int, default=20)
    p.add_argument("--LBA_step", type=float, default=0.01)
    p.add_argument("--opt_r", type=int, default=1)
    p.add_argument("--opt_t", type=int, default=1)
    p.add_argument("--use_dso_R", action="store_true")
    p.add_argument("--use_dso_t", action="store_true")
    p.add_argument("--refresh_frames", type=int, default=1000)
    p.add_argument("--min_frame_idx", type=int, default=0)
    p.add_argument("--max_frame_idx", type=int, default=10**9)
    p.add_argument("--dat_indx_step", type=int, default=1)
    p.add_argument("--res_dir", type=str, default="results")
    p.add_argument("--save_poses", action="store_true",
                   help="write the final optimized trajectory (world->cam "
                        "4x4 per frame + validity mask) to poses.npz in "
                        "the result dir")
    p.add_argument("--timing", action="store_true",
                   help="print per-stage steady-state timing at the end "
                        "(decode/window, infer dispatch, export fetch, LBA)")
    p.add_argument("--knet_coarse_d", type=int, default=1,
                   help="run the K-Net gain at D/this (accuracy-gated "
                        "deviation, PERF.md 'Coarse-D K-Net'; 1 = exact "
                        "reference semantics)")
    p.add_argument("--pose_graph", choices=("auto", "device", "host"),
                   default="auto",
                   help="where the optimized trajectory lives in the "
                        "steady state: 'device' fuses the whole frame "
                        "(window poses + inference + LBA + pose update) "
                        "into one dispatch with zero per-frame fetches "
                        "(PERF.md 'LBA pipeline round 5'); 'host' fetches "
                        "the optimized poses every frame (the faithful "
                        "per-frame loop); 'auto' = device on TPU")
    return p


def twin_pose_indices(ref_indx, t_win_r, step):
    """get_twin_rel_pose index lists (mutils/misc.py:21-54): the pose of the
    last window frame is initialized from frame (ref + t*step - 1)."""
    src_pose_idx = (
        [i for i in range(ref_indx - t_win_r * step, ref_indx, step)]
        + [i for i in range(ref_indx + step,
                            ref_indx + (t_win_r - 1) * step + 1, step)]
        + [t_win_r * step + ref_indx - 1]
    )
    src_opt_idx = (
        [i for i in range(ref_indx - t_win_r * step, ref_indx, step)]
        + [i for i in range(ref_indx + step,
                            ref_indx + t_win_r * step + 1, step)]
    )
    return src_pose_idx, src_opt_idx


def make_lba_maps(cam_img, d_candi, D):
    """Depth + confidence regression for the LBA in ONE dispatch
    (test_KVNet_LBA.py:414-423); results stay on device — they feed
    straight into the jitted ``local_ba_direct``. The image-res (W=384)
    resample is too wide for the banded Pallas kernel (single-vreg lane
    gather, ops/pallas/resample.py); on TPU it rides the tiled MXU
    kernel with an in-jit oct-gather fallback for extreme motion
    (ops/pallas/resample_tiled.py; XLA 432 -> oct 146 -> tiled ~X ms,
    PERF.md round 3)."""
    import jax
    import jax.numpy as jnp

    from neuralrgbd_tpu.ops.dpv import resample_dpv

    d_candi = jnp.asarray(d_candi)

    @jax.jit
    def lba_maps(dpv_ref, pose_next):
        if jax.default_backend() == "tpu":
            from neuralrgbd_tpu.ops.pallas.resample_tiled import (
                resample_dpv_wide)
            dpv_kf = resample_dpv_wide(
                dpv_ref, jnp.linalg.inv(pose_next), cam_img, d_candi,
                padding_value=math.log(1.0 / D))
        else:
            dpv_kf = resample_dpv(
                dpv_ref, jnp.linalg.inv(pose_next), cam_img, d_candi,
                padding_value=math.log(1.0 / D))
        p_ref, p_kf = jnp.exp(dpv_ref), jnp.exp(dpv_kf)
        return (jnp.einsum("dhw,d->hw", p_ref, d_candi),
                jnp.exp(jnp.max(dpv_ref, 0)) ** 2,
                jnp.einsum("dhw,d->hw", p_kf, d_candi),
                jnp.exp(jnp.max(dpv_kf, 0)) ** 2)

    return lba_maps


def quantize_maps(depth, conf):
    """pgm contract quantization on device: one packed uint16 fetch
    (clipped so the XLA saturating cast == numpy's within range)."""
    import jax.numpy as jnp

    return jnp.stack([
        jnp.clip(depth * 1000.0, 0, 65535).astype(jnp.uint16),
        jnp.clip(conf * 1000.0, 0, 65535).astype(jnp.uint16)])


def make_steady_frame(infer_step, lba_run, lba_maps, K_dev,
                      use_dso_R, use_dso_t):
    """Build the fused steady-state frame on the device pose graph.

    The host-owned steady state must FETCH the optimized poses every
    frame (np.asarray(lba_run(...))): frame t+1's window poses depend on
    frame t's LBA output, so the fetch is synchronous — the host idles
    through the whole device chain plus a ~31-35 ms relay round-trip,
    and the device idles through every host stage (PERF.md "LBA pipeline
    round 5"). With pose_graph='device' the trajectory lives ON DEVICE as
    an (L, 4, 4) array and the whole steady-state frame — window
    rel-poses, KV-Net inference, export quantization, LBA depth/conf
    maps, the 3-scale LBA itself, and the pose-graph write-back
    (test_KVNet_LBA.py:414-476) — is ONE jitted dispatch with zero
    per-frame fetches; only the batched uint16 export chunks ride the
    tunnel. The math is unchanged (fp32 rel_pose = src @ inv(ref),
    homography.py:904-906); poses are fetched back once at the end.

    Relay de-stall (round 5): frames arrive as UINT8 device arrays —
    4x fewer relay bytes per upload than the host-normalized float
    images — and are ImageNet-normalized IN-JIT with the exact host
    expression ((u8/255 - mean)/std, data/preprocess.py:31-33, the
    proven infer/loop.py `_chunk_runner` pattern); window/opt frames
    ride in as TUPLES and are stacked inside the jit, so the host
    enqueues no per-frame stack ops.
    """
    import jax
    import jax.numpy as jnp

    from neuralrgbd_tpu.data import preprocess as pp

    mean = jnp.asarray(pp.IMAGENET_MEAN)
    std = jnp.asarray(pp.IMAGENET_STD)

    def norm(u8):
        return (u8.astype(jnp.float32) / 255.0 - mean) / std

    @jax.jit
    def steady_frame(params, extMs, ref_img, src_imgs, next_img, opt_imgs,
                     bv_predict, bv_valid, idx, dso_rel):
        """One fused steady-state frame on the device pose graph.

        idx: dict of int32 index arrays — "ref"/"next"/"pnext" scalars,
        "win" (2*t_win,), "pose"/"opt" (V,). ref/next are (H, W, 3) uint8;
        src/opt are V-tuples of (H, W, 3) uint8. Returns (bv_predict,
        updated extMs, quantized (2, H, W) uint16 maps).
        """
        inv_ref = jnp.linalg.inv(extMs[idx["ref"]])
        batch = {
            "ref": norm(ref_img)[None],
            "srcs": jnp.stack([norm(s) for s in src_imgs])[None],
            "poses": (extMs[idx["win"]] @ inv_ref)[None],
            "K": K_dev,
            "pose_next": (extMs[idx["pnext"]] @ inv_ref)[None],
        }
        out = infer_step(params, batch, bv_predict, bv_valid)
        dc = quantize_maps(out.depth[0], out.confidence[0])
        pose_next = extMs[idx["next"]] @ inv_ref
        _, _, dmap_kf, conf_kf = lba_maps(out.dpv_refined[0], pose_next)
        rel_inits = extMs[idx["pose"]] @ jnp.linalg.inv(extMs[idx["next"]])
        if use_dso_R:
            rel_inits = rel_inits.at[-1, :3, :3].set(dso_rel[:3, :3])
        if use_dso_t:
            rel_inits = rel_inits.at[-1, :3, 3].set(dso_rel[:3, 3])
        rel_opt = lba_run(norm(next_img), jnp.stack([norm(o) for o in opt_imgs]),
                          dmap_kf, conf_kf, rel_inits)
        new_rows = jnp.einsum("vij,jk->vik", rel_opt, extMs[idx["next"]])
        extMs = extMs.at[idx["opt"]].set(new_rows)
        return out.bv_predict, extMs, dc

    return steady_frame


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from collections import OrderedDict
    from concurrent.futures import ThreadPoolExecutor

    from neuralrgbd_tpu.config import ModelConfig
    from neuralrgbd_tpu.data.mdata import make_trajectory
    from neuralrgbd_tpu.data.trajectory import rel_pose
    from neuralrgbd_tpu.infer.export import export_frame, save_scene_path_info
    from neuralrgbd_tpu.infer.step import make_infer_step
    from neuralrgbd_tpu.ops.camera import camera_from_K, rescale_K
    from neuralrgbd_tpu.pose import dso
    from neuralrgbd_tpu.pose.lba import make_lba_program
    from neuralrgbd_tpu.utils.fetch import fetch_with_deadline

    cfg = ModelConfig(
        feature_dim=args.feature_dim, kv_feature_dim=args.feature_dim,
        ndepth=args.ndepth, d_min=args.d_min, d_max=args.d_max,
        sigma_soft_max=args.sigma_soft_max, t_win_r=args.t_win,
        knet_coarse_d=args.knet_coarse_d,
    )
    t_win_r, step = cfg.t_win_r, args.dat_indx_step
    D = cfg.ndepth
    d_candi = jnp.asarray(cfg.d_candi)
    img_wh = (args.img_width, args.img_height)

    traj = make_trajectory(args.img_glob, args.intrin_path,
                           img_size_wh=img_wh, d_candi=cfg.d_candi)
    L = len(traj)
    traj_extMs = dso.init_traj_extMs(L, args.dso_res_path,
                                     if_filter=args.dso_filter)
    traj_extMs_init = copy.deepcopy(traj_extMs)
    traj.pose_loader = lambda i: (
        traj_extMs[i] if isinstance(traj_extMs[i], np.ndarray)
        else np.full((4, 4), np.nan))

    # pyramid intrinsics (1/4, 1/2, 1/1 of working size) for the LBA
    cams_pyr = [
        camera_from_K(rescale_K(traj.K_orig, traj.orig_wh,
                                (img_wh[0] // s, img_wh[1] // s)))
        for s in (4, 2, 1)
    ]
    cam_img = cams_pyr[-1]
    focal_length = float(np.mean([traj.K_img[0, 0], traj.K_img[1, 1]]))

    from neuralrgbd_tpu.cli.test_kvnet import _init_or_load_params

    params, _torch_imported = _init_or_load_params(cfg, args, traj)
    # Sweep-band planning (round 5): the fused Pallas sweep is exact only
    # within its static band precondition (ops/pallas/sweep_fused.py), and
    # unlike the production loop (infer/loop.plan_sweep) this CLI used to
    # assume band 8 unchecked — both pose-graph arms share the kernel, so
    # the host-vs-device parity tests cannot catch a violation. Plan on a
    # metric-rescaled copy of the DSO trajectory (the loop rescales in
    # place at the first valid window; planning must see the same scale),
    # then take one band of headroom for the LBA's subsequent pose
    # refinements, which stay photometrically close to the DSO inits.
    from neuralrgbd_tpu.infer.loop import plan_sweep

    fast_sweep, sweep_band = None, 8
    try:
        plan_ext = copy.deepcopy(traj_extMs)
        plan_scale = dso.estimate_metric_scale(plan_ext, focal_length,
                                               cfg.d_max, step)
        dso.rescale_traj_t(plan_ext, plan_scale)
        orig_loader = traj.pose_loader
        traj.pose_loader = lambda i: (
            plan_ext[i] if dso.valid_pose(plan_ext[i])
            else np.full((4, 4), np.nan))
        fast_sweep, sweep_band = plan_sweep(traj, cfg, t_win_r, step)
        traj.pose_loader = orig_loader
        if fast_sweep and sweep_band < 16:
            sweep_band *= 2          # headroom for LBA pose refinement
    except Exception as e:  # noqa: BLE001 — planning is best-effort
        print(f"sweep planning failed ({type(e).__name__}: {e}); "
              "keeping defaults", flush=True)
    infer_step = make_infer_step(cfg, fast_sweep=fast_sweep,
                                 sweep_band=sweep_band)
    # one fused program: pyramid + chart + 3-scale Adam + pose assembly
    # (pose/lba.make_lba_program) — 1 dispatch per frame instead of ~20
    # pool/convert enqueues at ~2-5 ms of host time each
    lba_run = make_lba_program(cams_pyr, max_iter=args.LBA_max_iter,
                               step=args.LBA_step,
                               opt_vars=(args.opt_r, args.opt_t))
    lba_maps = make_lba_maps(cam_img, d_candi, D)
    quantize_jit = jax.jit(quantize_maps)

    # ---- device-resident pose graph (round-4 de-stall; see
    # make_steady_frame's docstring for the rationale) -------------------
    pose_graph_dev = (args.pose_graph == "device"
                      or (args.pose_graph == "auto"
                          and jax.default_backend() == "tpu"))
    use_dso_R, use_dso_t = bool(args.use_dso_R), bool(args.use_dso_t)
    K_dev = jnp.asarray(traj.K_dpv[None].astype(np.float32))
    steady_frame = make_steady_frame(infer_step, lba_run, lba_maps, K_dev,
                                     use_dso_R, use_dso_t)

    dev_extMs = None          # (L, 4, 4) on device; None => stale/unbuilt

    def upload_extMs():
        return jnp.asarray(np.stack([
            m.astype(np.float32) if isinstance(m, np.ndarray)
            else np.eye(4, dtype=np.float32) for m in traj_extMs]))

    def refresh_valid_mask():
        # host-side validity bookkeeping (dso.valid_pose semantics,
        # dso_io.py:262-272: identity = 'DSO did not return' and NaN poses
        # are INVALID — init_traj_extMs identity-fills missing frames, so an
        # isinstance check would pass everything); device iterations extend
        # the mask incrementally — the indices the LBA writes are known
        # without fetching the values
        return [dso.valid_pose(m) for m in traj_extMs]

    valid_mask = refresh_valid_mask()

    res_dir = os.path.join(args.res_dir, args.exp_name)
    os.makedirs(res_dir, exist_ok=True)
    scene_path_info = [[traj.name]]

    h_dpv, w_dpv = traj.dpv_size_wh[1], traj.dpv_size_wh[0]
    bv_predict = jnp.full((1, D, h_dpv, w_dpv), -np.log(D), jnp.float32)
    bv_valid = jnp.zeros((1,), bool)
    first_frame = True
    frame_cnt_out = 0

    # normalized frames live ON DEVICE, uploaded once per index — each
    # frame is reused ~(2*t_win+1) times across windows and again by the
    # LBA, and a 384x256x3 fp32 re-upload per use is pure tunnel stall
    dev_imgs: "OrderedDict[int, jnp.ndarray]" = OrderedDict()
    dev_lock = threading.Lock()

    def dimg(i: int):
        rec = traj.frame(i)             # decode outside the lock
        with dev_lock:
            if i not in dev_imgs:
                dev_imgs[i] = jnp.asarray(rec.img)
                while len(dev_imgs) > 4 * (2 * t_win_r * step + 2):
                    dev_imgs.popitem(last=False)
            return dev_imgs[i]

    # the device pose-graph arm ships frames as RAW UINT8 (4x fewer bytes
    # on the serial relay than the f32 normalized image; ~24 ms/frame at
    # the measured ~37 MB/s) and normalizes in-jit (make_steady_frame)
    dev_imgs_u8: "OrderedDict[int, jnp.ndarray]" = OrderedDict()

    def dimg_u8(i: int):
        rec = traj.frame(i)
        with dev_lock:
            if i not in dev_imgs_u8:
                dev_imgs_u8[i] = jnp.asarray(rec.img_raw)
                while len(dev_imgs_u8) > 4 * (2 * t_win_r * step + 2):
                    dev_imgs_u8.popitem(last=False)
            return dev_imgs_u8[i]

    # decode+upload prefetcher (device arm): JPEG decode (~36 ms/frame of
    # host CPU) and the u8 upload run AHEAD of the dispatch thread, off
    # its critical path — the infer/loop.py prefetch pattern applied to
    # the steady-state loop. Bounded lead keeps the LRU caches warm.
    prefetch_pos = [0]
    stop_prefetch = [False]

    def _prefetch():
        import time as _t
        last = -1
        while not stop_prefetch[0]:
            target = min(prefetch_pos[0] + t_win_r * step + 2, L - 1)
            if target <= last:
                _t.sleep(0.002)
                continue
            for i in range(max(last + 1, 0), target + 1):
                if stop_prefetch[0]:
                    return
                dimg_u8(i)
            last = target

    prefetcher = threading.Thread(target=_prefetch, daemon=True)
    if pose_graph_dev:
        prefetcher.start()

    K_np = traj.K_dpv[None].astype(np.float32)

    # export runs OFF the dispatch thread, and fetches are BATCHED: each
    # per-frame fetch costs a fixed ~95 ms relay RPC that serializes against
    # the LBA's own per-frame pose fetch, so quantized maps accumulate on
    # device and ride up as ONE stacked uint16 fetch per EXPORT_CHUNK frames
    # (the infer/loop.py chunk pattern applied to the pose-free pipeline)
    EXPORT_CHUNK = 6
    exporter = ThreadPoolExecutor(max_workers=2)
    export_futs = []
    pending_exports = []          # (frame_cnt, img_raw, dc_dev (2,H,W) u16)

    def flush_exports(metas, dc_stack_dev):
        # one watchdog fetch for the chunk (utils/fetch.py: deadline+retry)
        dc = fetch_with_deadline(dc_stack_dev, tag="lba maps")
        for (fc, img_raw), maps in zip(metas, dc):
            export_frame(res_dir, fc, img_raw, maps[0], maps[1])

    def queue_export(fc, img_raw, dc_dev):
        pending_exports.append((fc, img_raw, dc_dev))
        if len(pending_exports) >= EXPORT_CHUNK:
            stack = jnp.stack([p[2] for p in pending_exports])
            metas = [(p[0], p[1]) for p in pending_exports]
            pending_exports.clear()
            export_futs.append(exporter.submit(flush_exports, metas, stack))
            while len(export_futs) > 2:  # bound device-buffer backlog
                export_futs.pop(0).result()

    import time as _time

    # stage accumulators for --timing. The first TIMING_WARM steady frames
    # pay the steady-state program's compile (~30-100 s on the remote
    # service) — they are excluded from both the stage averages and the
    # FPS window. Dispatches are async on the device pose graph, so the
    # honest FPS is wall-clock from the first counted frame through the
    # final export flush/pose fetch (t_end), not the sum of host stages.
    TIMING_WARM = 2
    timing = {"window": 0.0, "infer": 0.0, "export": 0.0, "lba": 0.0,
              "frames": 0, "t_steady": 0.0, "t_start": None, "t_end": None,
              "steady_seen": 0}

    lo = t_win_r * step + args.min_frame_idx
    hi = L - t_win_r * step - step
    for ref_indx in range(lo, hi):
        if ref_indx > args.max_frame_idx:
            break
        win_idx = ([i for i in range(ref_indx - t_win_r * step, ref_indx, step)]
                   + [i for i in range(ref_indx + step,
                                       ref_indx + t_win_r * step + 1, step)])
        if pose_graph_dev:
            valid_seq = all(valid_mask[i] for i in win_idx + [ref_indx])
        else:
            valid_seq = dso.valid_poses(traj_extMs, win_idx + [ref_indx])

        if args.refresh_frames > 0 and ref_indx % args.refresh_frames == 0 \
                and ref_indx > lo:
            print("REFRESH: resetting poses to DSO")
            traj_extMs[:] = copy.deepcopy(traj_extMs_init)
            bv_valid = jnp.zeros((1,), bool)
            first_frame = True
            dev_extMs, valid_mask = None, refresh_valid_mask()

        if not valid_seq:
            bv_valid = jnp.zeros((1,), bool)
            print(f"frame {ref_indx}: invalid DSO pose, skipped")
            continue

        # ---- metric-scale bootstrap on the first valid window ----
        if first_frame:
            scale = dso.estimate_metric_scale(traj_extMs, focal_length,
                                              cfg.d_max, step)
            dso.rescale_traj_t(traj_extMs, scale)
            traj_extMs_dso = copy.deepcopy(traj_extMs)
            print(f"metric scale from DSO baselines: {scale:.4f}")

        # ---- device pose-graph steady state: ONE dispatch, no fetch ----
        if pose_graph_dev and not first_frame and args.LBA_max_iter > 1:
            t_frame0 = _time.perf_counter()
            prefetch_pos[0] = ref_indx
            ref_rec = traj.frame(ref_indx)
            idx_next = ref_indx + 1
            pose_idx, opt_idx = twin_pose_indices(idx_next, t_win_r, step)
            if dev_extMs is None:
                dev_extMs = upload_extMs()
            dso_rel = (rel_pose(traj_extMs_dso[idx_next],
                                traj_extMs_dso[idx_next + t_win_r * step])
                       if (use_dso_R or use_dso_t)
                       else np.eye(4, dtype=np.float32))
            # plain numpy index/pose args ride up WITH the dispatch RPC —
            # pre-converting each with jnp.asarray would cost one ~2-5 ms
            # enqueue round-trip apiece (PERF.md "Host-loop export
            # de-stall" item 2); frames ship as u8 tuples, stacked in-jit
            idx = {
                "ref": np.int32(ref_indx),
                "next": np.int32(idx_next),
                "pnext": np.int32(min(ref_indx + step, L - 1)),
                "win": np.asarray(win_idx, np.int32),
                "pose": np.asarray(pose_idx, np.int32),
                "opt": np.asarray(opt_idx, np.int32),
            }
            t1 = _time.perf_counter()
            bv_predict, dev_extMs, dc = steady_frame(
                params, dev_extMs, dimg_u8(ref_indx),
                tuple(dimg_u8(i) for i in win_idx), dimg_u8(idx_next),
                tuple(dimg_u8(i) for i in opt_idx),
                bv_predict, bv_valid, idx, dso_rel.astype(np.float32))
            bv_valid = jnp.ones((1,), bool)
            t2 = _time.perf_counter()
            queue_export(frame_cnt_out, ref_rec.img_raw, dc)
            scene_path_info.append([frame_cnt_out, ref_rec.img_path])
            frame_cnt_out += 1
            for i in opt_idx:
                valid_mask[i] = True
            t3 = _time.perf_counter()
            timing["steady_seen"] += 1
            if timing["steady_seen"] > TIMING_WARM:
                if timing["t_start"] is None:
                    timing["t_start"] = t_frame0
                timing["window"] += t1 - t_frame0
                timing["infer"] += t2 - t1
                timing["export"] += t3 - t2
                timing["t_steady"] += t3 - t_frame0
                timing["frames"] += 1
            print(f"frame {ref_indx}: exported + poses optimized",
                  flush=True)
            continue

        # ---- KV-Net inference ----
        # window batch assembled from the device-resident frame cache;
        # poses come straight off the (host) DSO/optimized trajectory —
        # no FrameRecord pose refresh, no re-upload of cached frames
        t_frame0 = _time.perf_counter()
        ref_rec = traj.frame(ref_indx)
        poses = np.stack([rel_pose(traj_extMs[ref_indx], traj_extMs[i])
                          for i in win_idx])
        pose_next_ref = rel_pose(traj_extMs[ref_indx],
                                 traj_extMs[min(ref_indx + step, L - 1)])
        batch = {
            "ref": dimg(ref_indx)[None],
            "srcs": jnp.stack([dimg(i) for i in win_idx])[None],
            "poses": jnp.asarray(poses[None].astype(np.float32)),
            "K": K_np,
            "pose_next": jnp.asarray(pose_next_ref[None].astype(np.float32)),
        }
        t1 = _time.perf_counter()
        out = infer_step(params, batch, bv_predict, bv_valid)
        bv_predict = out.bv_predict
        bv_valid = jnp.ones((1,), bool)
        t2 = _time.perf_counter()

        queue_export(frame_cnt_out, ref_rec.img_raw,
                     quantize_jit(out.depth[0], out.confidence[0]))
        scene_path_info.append([frame_cnt_out, ref_rec.img_path])
        frame_cnt_out += 1
        t3 = _time.perf_counter()
        first_frame_was = first_frame

        if args.LBA_max_iter <= 1:
            first_frame = False
            continue

        # ---- depth + confidence for the LBA (test_KVNet_LBA.py:414-423) --
        dpv_ref = out.dpv_refined[0]                   # (D, H, W)
        idx_next = ref_indx + 1
        pose_next = rel_pose(traj_extMs[ref_indx], traj_extMs[idx_next])
        # one dispatch, zero fetches: the maps stay on device and feed the
        # jitted LBA directly (a host round-trip here would be pure stall)
        dmap_ref, conf_ref, dmap_kf, conf_kf = lba_maps(
            dpv_ref, jnp.asarray(pose_next))

        if first_frame:
            first_frame = False
            # optimize every frame of the window against the current ref
            srcs_idx = [i for i in range(ref_indx - t_win_r * step,
                                         ref_indx + t_win_r * step + 1)
                        if i != ref_indx]
            rel_inits = np.stack([
                rel_pose(traj_extMs[ref_indx], traj_extMs[i])
                for i in srcs_idx])
            rel_opt = np.asarray(lba_run(
                dimg(ref_indx), jnp.stack([dimg(i) for i in srcs_idx]),
                dmap_ref, conf_ref, jnp.asarray(rel_inits, jnp.float32)))
            for k, srcidx in enumerate(srcs_idx):
                traj_extMs[srcidx] = rel_opt[k] @ traj_extMs[ref_indx]

        # ---- steady state: optimize the next window vs the next ref ----
        pose_idx, opt_idx = twin_pose_indices(idx_next, t_win_r, step)
        rel_inits = np.stack([
            rel_pose(traj_extMs[idx_next], traj_extMs[i]) for i in pose_idx])
        if args.use_dso_R or args.use_dso_t:
            dRt = rel_pose(traj_extMs_dso[idx_next],
                           traj_extMs_dso[idx_next + t_win_r * step])
            if args.use_dso_R:
                rel_inits[-1][:3, :3] = dRt[:3, :3]
            if args.use_dso_t:
                rel_inits[-1][:3, 3] = dRt[:3, 3]
        rel_opt = np.asarray(lba_run(
            dimg(idx_next), jnp.stack([dimg(i) for i in opt_idx]),
            dmap_kf, conf_kf, jnp.asarray(rel_inits, jnp.float32)))
        for k, srcidx in enumerate(opt_idx):
            traj_extMs[srcidx] = rel_opt[k] @ traj_extMs[idx_next]
        t4 = _time.perf_counter()
        if not first_frame_was:
            # steady state only (first window pays compiles + bootstrap)
            timing["steady_seen"] += 1
            if timing["steady_seen"] > TIMING_WARM:
                if timing["t_start"] is None:
                    timing["t_start"] = t_frame0
                timing["window"] += t1 - t_frame0
                timing["infer"] += t2 - t1
                timing["export"] += t3 - t2
                timing["lba"] += t4 - t3
                timing["t_steady"] += t4 - t_frame0
                timing["frames"] += 1
        print(f"frame {ref_indx}: exported + poses optimized", flush=True)
        if pose_graph_dev:
            # a host-path iteration (bootstrap) wrote traj_extMs: the
            # device copy is stale — rebuild it on the next steady frame
            dev_extMs, valid_mask = None, refresh_valid_mask()

    stop_prefetch[0] = True
    if pending_exports:
        stack = jnp.stack([p[2] for p in pending_exports])
        metas = [(p[0], p[1]) for p in pending_exports]
        pending_exports.clear()
        export_futs.append(exporter.submit(flush_exports, metas, stack))
    for f in export_futs:
        f.result()
    exporter.shutdown()
    if pose_graph_dev and dev_extMs is not None:
        # one fetch for the whole optimized trajectory (the per-frame
        # host path pays this round-trip every frame)
        ext_final = np.asarray(dev_extMs)
        for i, v in enumerate(valid_mask):
            if v:
                traj_extMs[i] = ext_final[i]
    save_scene_path_info(os.path.join(res_dir, "scene_path_info.txt"),
                         scene_path_info)
    if args.save_poses:
        np.savez(os.path.join(res_dir, "poses.npz"),
                 extMs=np.stack([np.asarray(m, np.float64)
                                 for m in traj_extMs]),
                 valid=np.asarray([dso.valid_pose(m) for m in traj_extMs]))
    print(f"done: {frame_cnt_out} frames -> {res_dir}")
    if args.timing and timing["frames"]:
        timing["t_end"] = _time.perf_counter()
        n = timing["frames"]
        wall = timing["t_end"] - timing["t_start"]
        print("TIMING " + " ".join(
            f"{k}={timing[k] / n * 1e3:.1f}ms"
            for k in ("window", "infer", "export", "lba"))
            + f" host_ms={timing['t_steady'] / n * 1e3:.1f}"
            + f" fps={n / wall:.2f} frames={n}"
            + f" (wall incl. final flush; first {TIMING_WARM} steady"
              " frames excluded as compile warmup)", flush=True)
    return frame_cnt_out


if __name__ == "__main__":
    main()
