"""Sliding-window inference over a trajectory with export.

The host loop of test_KVNet.py:171-252: for each reference frame, gate on
pose validity (reset the recurrence on a bad pose), run the jitted step,
export depth/confidence, and advance the window. The DPV carry stays on
device; only the exported maps transfer to host, asynchronously fetched one
step behind the dispatch so the chip never waits on the relay.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig
from neuralrgbd_tpu.data.trajectory import Trajectory, window_batch
from neuralrgbd_tpu.infer.export import export_frame, save_scene_path_info
from neuralrgbd_tpu.infer.step import make_infer_step


def run_trajectory(
    params,
    cfg: ModelConfig,
    traj: Trajectory,
    res_dir: str,
    t_win_r: Optional[int] = None,
    step: int = 1,
    infer_step=None,
    verbose: bool = True,
):
    """Returns the number of exported frames. Writes the full output
    contract (img/d/conf files + scene_path_info.txt) into ``res_dir``."""
    t_win_r = t_win_r if t_win_r is not None else cfg.t_win_r
    infer_step = infer_step or make_infer_step(cfg)
    os.makedirs(res_dir, exist_ok=True)

    D = cfg.ndepth
    w_dpv, h_dpv = traj.dpv_size_wh
    bv_predict = jnp.full((1, D, h_dpv, w_dpv), -np.log(D), jnp.float32)
    bv_valid = jnp.zeros((1,), bool)

    scene_path_info = [[traj.name or os.path.dirname(traj.img_paths[0])]]
    pending = None  # (batch_idx, ref_record, step_output) awaiting fetch
    n_exported = 0

    def flush(p):
        nonlocal n_exported
        batch_idx, ref_rec, out = p
        depth = np.asarray(out.depth[0])
        conf = np.asarray(out.confidence[0])
        export_frame(res_dir, batch_idx, ref_rec.img_raw, depth, conf)
        scene_path_info.append([batch_idx, ref_rec.img_path])
        n_exported += 1

    lo = t_win_r * step
    hi = len(traj) - t_win_r * step - 1
    for frame_cnt, ref_indx in enumerate(range(lo, hi)):
        batch_np, ref_rec, valid = window_batch(traj, ref_indx, t_win_r, step)
        if not valid:
            # invalid pose: skip the frame and reset the recurrence
            # (test_KVNet.py:241-246)
            bv_valid = jnp.zeros((1,), bool)
            bv_predict = jnp.full_like(bv_predict, -np.log(D))
            if verbose:
                print(f"frame {ref_indx}: invalid pose, recurrence reset")
            continue
        batch = jax.tree.map(jnp.asarray, batch_np)
        out = infer_step(params, batch, bv_predict, bv_valid)
        bv_predict = out.bv_predict
        bv_valid = jnp.ones((1,), bool)
        # fetch the PREVIOUS frame's maps while this one computes
        if pending is not None:
            flush(pending)
        pending = (frame_cnt, ref_rec, out)
        if verbose:
            print(f"Finished frame {frame_cnt + 1}/{hi - lo}", flush=True)

    if pending is not None:
        flush(pending)
    save_scene_path_info(os.path.join(res_dir, "scene_path_info.txt"),
                         scene_path_info)
    return n_exported


def run_trajectories_parallel(
    params,
    cfg: ModelConfig,
    trajs,
    res_dirs,
    mesh=None,
    t_win_r: Optional[int] = None,
    step: int = 1,
    verbose: bool = True,
):
    """Data-parallel inference: one trajectory per mesh device, stepping in
    lockstep (the reference also ran its test model under DataParallel,
    test_KVNet.py:163). Shorter trajectories stop contributing via the
    validity mask; every lane writes its own export contract.

    Returns the per-trajectory exported-frame counts.
    """
    from neuralrgbd_tpu.data.trajectory import window_batch
    from neuralrgbd_tpu.parallel import (
        make_mesh,
        make_sharded_infer_step,
        shard_batch,
    )

    t_win_r = t_win_r if t_win_r is not None else cfg.t_win_r
    n = len(trajs)
    mesh = mesh or make_mesh(n)
    infer_step = make_sharded_infer_step(cfg, mesh)

    D = cfg.ndepth
    w_dpv, h_dpv = trajs[0].dpv_size_wh
    assert all(t.dpv_size_wh == trajs[0].dpv_size_wh for t in trajs), \
        "lockstep lanes must share the operating point"

    bv_predict = shard_batch(
        np.full((n, D, h_dpv, w_dpv), -np.log(D), np.float32), mesh)
    carry_valid = np.zeros(n, bool)
    counts = [0] * n
    infos = [[t.name or os.path.dirname(t.img_paths[0])] for t in trajs]

    lo = t_win_r * step
    hi = max(len(t) for t in trajs) - t_win_r * step - 1
    for ref_indx in range(lo, hi):
        lane_parts, lane_refs, lane_ok = [], [], []
        for t in trajs:
            in_range = ref_indx < len(t) - t_win_r * step - 1
            if in_range:
                b, ref, ok = window_batch(t, ref_indx, t_win_r, step)
            else:
                b, ref, ok = window_batch(t, lo, t_win_r, step), None, False
                b = b[0] if isinstance(b, tuple) else b
            lane_parts.append(b)
            lane_refs.append(ref)
            lane_ok.append(ok)
        batch = {k: np.concatenate([p[k] for p in lane_parts], axis=0)
                 for k in lane_parts[0]}
        out = infer_step(params, shard_batch(batch, mesh), bv_predict,
                         shard_batch(np.asarray(carry_valid), mesh))
        bv_predict = out.bv_predict
        depths = np.asarray(out.depth)
        confs = np.asarray(out.confidence)
        for i in range(n):
            if lane_ok[i]:
                export_frame(res_dirs[i], counts[i], lane_refs[i].img_raw,
                             depths[i], confs[i])
                infos[i].append([counts[i], lane_refs[i].img_path])
                counts[i] += 1
            carry_valid[i] = lane_ok[i]
        if verbose:
            print(f"frame {ref_indx}: lanes ok={sum(lane_ok)}/{n}",
                  flush=True)

    for i in range(n):
        os.makedirs(res_dirs[i], exist_ok=True)
        save_scene_path_info(
            os.path.join(res_dirs[i], "scene_path_info.txt"), infos[i])
    return counts
