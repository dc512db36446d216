"""Sliding-window inference over a trajectory with export.

The host loop of test_KVNet.py:171-252: for each reference frame, gate on
pose validity (reset the recurrence on a bad pose), run the jitted step,
export depth/confidence, and advance the window. The DPV carry stays on
device; only the exported maps transfer to host, and those transfers are
(a) quantized to uint16 on device first — exactly the pgm contract's
``(x * 1000).astype(uint16)``, so the output files are byte-identical while
the relay moves 4x fewer bytes — and (b) fetched by a background thread so
the relay round-trip overlaps the next frames' compute instead of
serializing with it (the fetch-bound stall called out in PERF.md).
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from neuralrgbd_tpu.config import ModelConfig
from neuralrgbd_tpu.data import preprocess as pp
from neuralrgbd_tpu.data.trajectory import (Trajectory, rel_pose,
                                            window_indices)
from neuralrgbd_tpu.infer.export import export_frame, save_scene_path_info
from neuralrgbd_tpu.infer.step import make_infer_step
from neuralrgbd_tpu.utils.fetch import fetch_with_deadline


TORCH_IMPORT_CACHE_WARNING = (
    "cache_features: params were imported from a torch checkpoint "
    "(reference-released weights); the cached-feature deviation replaces "
    "the joint-window BatchNorm statistics those weights were trained "
    "under (basic.py:245-252) with per-frame statistics, and its accuracy "
    "gate (PERF.md 'Cached-feature rollout') ran on THIS repo's trained "
    "weights only. Defaulting cache_features OFF for torch-imported "
    "params; pass --cache_features to override.")


def resolve_cache_features(requested: Optional[bool],
                           torch_imported: bool):
    """Provenance-aware default for the cached-feature deviation.

    ``requested`` is the user's tri-state flag (None = auto). For params
    imported from reference torch checkpoints the auto default is OFF (the
    trained-weights accuracy gate covered only weights trained here), and
    an explicit ON carries the warning so the deviation is never silent.
    Returns ``(resolved, warning_text_or_None)``; resolved=None keeps the
    downstream backend-based auto default (ON on TPU)."""
    if not torch_imported:
        return requested, None
    if requested is None:
        return False, TORCH_IMPORT_CACHE_WARNING
    if requested:
        return True, TORCH_IMPORT_CACHE_WARNING
    return False, None


def _auto_cache_features(requested: Optional[bool], params,
                         chunked: bool = True,
                         verbose: bool = True) -> bool:
    """Uniform provenance-aware resolution for programmatic entry points
    (VERDICT r4: the CLI guard alone left run_trajectory/
    run_trajectories_parallel/make_rollout defaulting the cached-FE
    deviation ON for torch-imported weights the accuracy gate never
    covered). ``params`` carrying the torch-import provenance marker
    (utils/torch_import.mark_torch_imported) resolve auto to OFF."""
    from neuralrgbd_tpu.utils.torch_import import params_torch_imported

    resolved, warn = resolve_cache_features(
        requested, params_torch_imported(params))
    if warn and verbose:
        print(warn)
    if resolved is None:
        return chunked and jax.default_backend() == "tpu"
    return bool(resolved)


class _DeviceFrameCache:
    """Upload each video frame to the device ONCE.

    Consecutive sliding windows share all but one frame; re-uploading the
    whole (V+1)-frame window every step moves ~6 MB/frame over this
    environment's ~37 MB/s relay (~160 ms — the real host-loop bottleneck,
    measured). The cache uploads the resized uint8 frame (0.3 MB) when it
    first enters the window and normalizes it on device; window tensors are
    then assembled device-side.
    """

    def __init__(self, capacity: int = 24, device=None):
        self._cache: "dict[int, jax.Array]" = {}
        self._order: "list[int]" = []
        self._raw: "dict[int, jax.Array]" = {}
        self._raw_order: "list[int]" = []
        self._capacity = capacity
        self._device = device  # pin a lane's frames to its mesh device
        mean = jnp.asarray(pp.IMAGENET_MEAN)
        std = jnp.asarray(pp.IMAGENET_STD)
        self._norm = jax.jit(
            lambda u8: (u8.astype(jnp.float32) / 255.0 - mean) / std)

    def get(self, traj: Trajectory, idx: int) -> jax.Array:
        if idx not in self._cache:
            self._cache[idx] = self._norm(self.get_raw(traj, idx))
            self._order.append(idx)
            while len(self._order) > self._capacity:
                del self._cache[self._order.pop(0)]
        return self._cache[idx]

    def get_raw(self, traj: Trajectory, idx: int) -> jax.Array:
        """Device-resident uint8 frame (the chunk runner normalizes
        in-jit, so only the 3x smaller raw bytes ride the relay)."""
        if idx not in self._raw:
            raw = traj.frame(idx).img_raw
            self._raw[idx] = (jax.device_put(raw, self._device)
                              if self._device else jnp.asarray(raw))
            self._raw_order.append(idx)
            while len(self._raw_order) > self._capacity:
                del self._raw[self._raw_order.pop(0)]
        return self._raw[idx]


def _q16(x):
    """Device-side pgm quantization, the ``(x * 1000).astype(uint16)``
    contract. The clip makes XLA's saturating float->int conversion and
    numpy's modulo wrap agree byte-for-byte on the d_max-bounded range the
    model emits (values >= 65.536 would otherwise differ between the two)."""
    return jnp.clip(x * 1000.0, 0.0, 65535.0).astype(jnp.uint16)


_CHUNK_RUNNERS: dict = {}

# graceful-degradation ladder for the fused sweep's source-row band: 4 for
# small inter-frame roll (~halves the selection matmuls), 8 default, 16 as
# the last fused step before the XLA fallback
_SWEEP_BANDS = (4, 8, 16)
_SPREAD_FNS: dict = {}


def _spread_fn(h: int, w: int):
    if (h, w) not in _SPREAD_FNS:
        from neuralrgbd_tpu.ops.camera import Camera
        from neuralrgbd_tpu.ops.pallas.sweep_fused import band_spread_seq

        _SPREAD_FNS[(h, w)] = jax.jit(
            lambda Rs, ts, K, dc: band_spread_seq(
                Rs, ts, Camera(K=K), dc, h, w))
    return _SPREAD_FNS[(h, w)]


def plan_sweep(traj: Trajectory, cfg: ModelConfig, t_win_r: int, step: int,
               enabled: bool | None = None):
    """Pick (fast_sweep, sweep_band) from the trajectory's ACTUAL poses.

    The fused Pallas sweep is exact only while every output row's y-taps
    fit a ``band``-row source band (ops/pallas/sweep_fused.py); a handheld
    sequence with more inter-frame roll would silently produce wrong cost
    volumes. This measures the worst-case spread over all valid windows —
    poses load without image decode, and the check is ONE dispatch + one
    scalar fetch (``band_spread_seq``) — then returns the smallest exact
    band, or disables the fused path loudly when none fits.
    """
    if enabled is None:
        enabled = jax.default_backend() == "tpu"
    if not enabled:
        return None, 8   # make_infer_step keeps the XLA sweep off-TPU
    lo = t_win_r * step
    hi = len(traj) - t_win_r * step - 1
    exts = [np.asarray(traj.pose_loader(i)) for i in range(len(traj))]
    Rs, ts = [], []
    for ref_indx in range(lo, hi):
        idxs = window_indices(ref_indx, t_win_r, step)
        if not (np.isfinite(exts[ref_indx]).all()
                and all(np.isfinite(exts[i]).all() for i in idxs)):
            continue
        for i in idxs:
            rp = rel_pose(exts[ref_indx], exts[i])
            Rs.append(rp[:3, :3])
            ts.append(rp[:3, 3])
    if not Rs:
        return True, 8
    w_dpv, h_dpv = traj.dpv_size_wh
    spread = int(_spread_fn(h_dpv, w_dpv)(
        jnp.asarray(np.stack(Rs), jnp.float32),
        jnp.asarray(np.stack(ts), jnp.float32),
        jnp.asarray(traj.K_dpv, jnp.float32),
        jnp.asarray(cfg.d_candi, jnp.float32)))
    for b in _SWEEP_BANDS:
        if spread <= b - 1:
            return True, b
    import warnings

    warnings.warn(
        f"trajectory inter-frame rotation needs a {spread + 1}-row sweep "
        f"band (> {_SWEEP_BANDS[-1]}): disabling the fused Pallas sweep "
        f"for this trajectory (~3x slower XLA sweep, exact).", stacklevel=2)
    return False, 8


def _chunk_runner(cfg: ModelConfig, chunk_t: int,
                  fast_sweep: bool | None = None, sweep_band: int = 8,
                  cache_features: bool = False):
    """Jitted T-frame scan with IN-JIT window assembly.

    On this environment's tunneled TPU every op/dispatch call costs ~2-5 ms
    of host time to enqueue, so per-frame window assembly from Python
    (~6-10 small device ops) alone caps the loop at ~21 FPS regardless of
    compute. The whole chunk is therefore ONE call: raw uint8 frames go in
    as a single stacked buffer, and each step's ref/src windows are gathered
    and ImageNet-normalized inside the jit. Emits uint16-quantized maps (the
    pgm contract) plus the carry of the LAST REAL step (padded tail chunks
    hand their carry forward correctly)."""
    key = (repr(cfg), chunk_t, fast_sweep, sweep_band, cache_features)
    if key not in _CHUNK_RUNNERS:
        raw_step = make_infer_step(cfg, jit=False, fast_sweep=fast_sweep,
                                   sweep_band=sweep_band,
                                   with_features=cache_features)
        if cache_features:
            from neuralrgbd_tpu.infer.step import make_frame_features

            fe_all = jax.vmap(make_frame_features(cfg), in_axes=(None, 0))

        def chunk(params, frames_u8, ref_idx, src_idx, poses, K, pose_next,
                  bvp, valid, n_real):
            # frames_u8 (F,H,W,3) u8; ref_idx (T,); src_idx (T,V);
            # poses (T,V,4,4); K (3,3); pose_next (T,4,4)
            mean = jnp.asarray(pp.IMAGENET_MEAN)
            std = jnp.asarray(pp.IMAGENET_STD)
            imgs = (frames_u8.astype(jnp.float32) / 255.0 - mean) / std
            if cache_features:
                # every unique frame featurized ONCE per chunk (per-frame
                # BN statistics — PERF.md "Cached-feature rollout"); the
                # scan gathers each window's maps by index
                l1_all, f_all = fe_all(params, imgs)

            def body(carry, xs):
                bvp, v = carry
                ridx, sidx, pose, pnext = xs
                batch = {
                    "ref": imgs[ridx][None],
                    "srcs": imgs[sidx][None],
                    "poses": pose[None],
                    "K": K[None],
                    "pose_next": pnext[None],
                }
                if cache_features:
                    widx = jnp.concatenate([sidx, ridx[None]])
                    out = raw_step(params, batch, bvp, v,
                                   (l1_all[widx][None], f_all[widx][None]))
                else:
                    out = raw_step(params, batch, bvp, v)
                return (out.bv_predict, jnp.ones_like(v)), (
                    _q16(out.depth[0]),
                    _q16(out.confidence[0]),
                    out.bv_predict,
                )

            (_, _), (d16, c16, bvs) = jax.lax.scan(
                body, (bvp, valid), (ref_idx, src_idx, poses, pose_next))
            bv_next = jax.lax.dynamic_index_in_dim(
                bvs, n_real - 1, keepdims=False)
            # one stacked output => ONE host fetch per chunk (each fetch
            # costs ~55 ms fixed on the tunneled relay)
            return jnp.stack([d16, c16]), bv_next

        _CHUNK_RUNNERS[key] = jax.jit(chunk, donate_argnums=(7,))
    return _CHUNK_RUNNERS[key]


_PAR_CHUNK_RUNNERS: dict = {}


def _parallel_chunk_runner(cfg: ModelConfig, mesh, chunk_t: int,
                           axis: str = "data",
                           fast_sweep: bool | None = None,
                           sweep_band: int = 8,
                           cache_features: bool = False):
    """Sharded T-frame scan over the lane mesh with in-jit window assembly
    (the multi-lane counterpart of ``_chunk_runner``). Per-step lane
    validity rides in as an (T, N) mask: step t consumes step t-1's mask as
    its carry validity, exactly the host-side ``carry_valid[i] =
    lane_ok[i]`` recurrence of the per-frame loop."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = (repr(cfg), tuple(d.id for d in mesh.devices.flat), chunk_t, axis,
           fast_sweep, sweep_band, cache_features)
    if key not in _PAR_CHUNK_RUNNERS:
        raw_step = make_infer_step(cfg, jit=False, fast_sweep=fast_sweep,
                                   sweep_band=sweep_band,
                                   with_features=cache_features)
        if cache_features:
            from neuralrgbd_tpu.infer.step import make_frame_features

            fe_lanes = jax.vmap(
                jax.vmap(make_frame_features(cfg), in_axes=(None, 0)),
                in_axes=(None, 0))
        data = NamedSharding(mesh, P(axis))
        repl = NamedSharding(mesh, P())
        tdata = NamedSharding(mesh, P(None, axis))

        def chunk(params, frames_u8, ref_idx, src_idx, poses, K, pose_next,
                  ok, bvp, valid):
            mean = jnp.asarray(pp.IMAGENET_MEAN)
            std = jnp.asarray(pp.IMAGENET_STD)
            imgs = (frames_u8.astype(jnp.float32) / 255.0 - mean) / std
            if cache_features:
                l1_all, f_all = fe_lanes(params, imgs)  # (N, F, ...)

            def body(carry, xs):
                bvp, v = carry
                ridx, sidx, pose, pnext, okt = xs
                batch = {
                    "ref": imgs[:, ridx],
                    "srcs": imgs[:, sidx],
                    "poses": pose,
                    "K": K,
                    "pose_next": pnext,
                }
                if cache_features:
                    widx = jnp.concatenate([sidx, ridx[None]])
                    out = raw_step(params, batch, bvp, v,
                                   (l1_all[:, widx], f_all[:, widx]))
                else:
                    out = raw_step(params, batch, bvp, v)
                return (out.bv_predict, okt), (
                    _q16(out.depth),
                    _q16(out.confidence),
                )

            (bv_f, v_f), (d16, c16) = jax.lax.scan(
                body, (bvp, valid),
                (ref_idx, src_idx, poses, pose_next, ok))
            return d16, c16, bv_f, v_f

        _PAR_CHUNK_RUNNERS[key] = jax.jit(
            chunk,
            in_shardings=(repl, data, repl, repl, tdata, data, tdata,
                          tdata, data, data),
            out_shardings=(tdata, tdata, data, data),
            donate_argnums=(8,),
        )
    return _PAR_CHUNK_RUNNERS[key]


class _RawSource:
    """Process-pool frame decoder + host-side raw LRU.

    PIL's jpeg decode holds the GIL for most of its ~36 ms/frame (measured,
    PERF.md round 2), so the round-2 THREAD prefetcher still stole host time
    from the dispatch loop. Worker PROCESSES remove the decode from this
    process entirely; the task is a pure ``(path, size) -> uint8`` function
    (``data.preprocess.load_raw``) — picklable, no jax, no shared state —
    run under the spawn context so no forked jax/TPU runtime threads ride
    into the children.
    """

    def __init__(self, traj: Trajectory, workers: int = 3,
                 capacity: int = 96):
        import multiprocessing
        from collections import OrderedDict

        self._paths = list(traj.img_paths)
        self._size = traj.img_size_wh
        self._crop_w = getattr(traj, "raw_crop_w", None)
        self._fut: dict = {}
        self._done: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self._capacity = capacity
        try:
            self._pool = ProcessPoolExecutor(
                max_workers=workers,
                mp_context=multiprocessing.get_context("spawn"))
        except Exception:            # restricted environments: decode inline
            self._pool = None

    def _clip(self, idx: int) -> int:
        return min(max(idx, 0), len(self._paths) - 1)

    def prefetch(self, idx: int) -> None:
        idx = self._clip(idx)
        if self._pool and idx not in self._fut and idx not in self._done:
            self._fut[idx] = self._pool.submit(
                pp.load_raw, self._paths[idx], self._size, self._crop_w)

    def get(self, idx: int) -> np.ndarray:
        idx = self._clip(idx)
        if idx not in self._done:
            f = self._fut.pop(idx, None)
            self._done[idx] = (f.result() if f is not None
                               else pp.load_raw(self._paths[idx], self._size,
                                                self._crop_w))
            while len(self._done) > self._capacity:
                self._done.popitem(last=False)
        return self._done[idx]

    def close(self) -> None:
        if self._pool:
            self._pool.shutdown(wait=False, cancel_futures=True)


def run_trajectory(
    params,
    cfg: ModelConfig,
    traj: Trajectory,
    res_dir: str,
    t_win_r: Optional[int] = None,
    step: int = 1,
    infer_step=None,
    verbose: bool = True,
    chunk_t: int = 32,
    cache_features: bool | None = None,
):
    """Returns the number of exported frames. Writes the full output
    contract (img/d/conf files + scene_path_info.txt) into ``res_dir``.

    ``chunk_t``: frames scanned per device dispatch (partial chunks are
    padded to keep one compiled shape; the carry is taken from the last
    real step). The relay fetch cost is fixed per chunk (~95 ms), so it
    amortizes linearly in ``chunk_t``. ``chunk_t=1`` restores per-frame
    stepping via ``infer_step``.

    ``cache_features``: featurize every unique frame once per chunk
    instead of once per window it appears in (per-frame BN statistics —
    the accuracy-gated deviation of PERF.md "Cached-feature rollout":
    holdout abs_rel 0.12434 cached vs 0.12437 exact on trained weights).
    Requires ``chunk_t > 1``. Default (None): ON on TPU when chunked,
    OFF elsewhere (CPU keeps the reference's joint-window semantics) and
    OFF for torch-imported params (provenance marker — the accuracy gate
    covers weights trained in this repo only)."""
    t_win_r = t_win_r if t_win_r is not None else cfg.t_win_r
    if cache_features is None:
        cache_features = _auto_cache_features(None, params,
                                              chunked=chunk_t > 1,
                                              verbose=verbose)
    fast_sweep, sweep_band = plan_sweep(traj, cfg, t_win_r, step)
    if chunk_t > 1:
        return _run_trajectory_chunked(
            params, cfg, traj, res_dir, t_win_r, step, verbose, chunk_t,
            fast_sweep, sweep_band, cache_features)
    infer_step = infer_step or make_infer_step(
        cfg, fast_sweep=fast_sweep, sweep_band=sweep_band)
    os.makedirs(res_dir, exist_ok=True)

    D = cfg.ndepth
    w_dpv, h_dpv = traj.dpv_size_wh
    bv_predict = jnp.full((1, D, h_dpv, w_dpv), -np.log(D), jnp.float32)
    bv_valid = jnp.zeros((1,), bool)

    info_rows = {}
    n_exported = 0
    count_lock = threading.Lock()

    def flush(entries, dc_stack):
        # export worker: the chunk's maps arrive as ONE stacked (2, T, H, W)
        # array — a single relay round-trip (~55 ms fixed each on this
        # environment) instead of two per chunk
        nonlocal n_exported
        dc = fetch_with_deadline(dc_stack, tag="maps")
        for j, (batch_idx, rec) in enumerate(entries):
            export_frame(res_dir, batch_idx, rec.img_raw, dc[0, j], dc[1, j])
            info_rows[batch_idx] = [batch_idx, rec.img_path]
        with count_lock:   # two flush workers can run concurrently
            n_exported += len(entries)

    # 2 workers: batches are independent (ordering restored via info_rows)
    executor = ThreadPoolExecutor(max_workers=2)
    futures = []
    pend_entries, pend_d, pend_c = [], [], []
    fetch_every = 8

    def submit_pending():
        nonlocal pend_entries, pend_d, pend_c
        if not pend_entries:
            return
        futures.append(executor.submit(
            flush, pend_entries,
            jnp.stack([jnp.stack(pend_d), jnp.stack(pend_c)])))
        pend_entries, pend_d, pend_c = [], [], []
        while len(futures) > 3:      # bound device-buffer backlog
            futures.pop(0).result()

    frames = _DeviceFrameCache()
    lo = t_win_r * step
    hi = len(traj) - t_win_r * step - 1

    # decode prefetcher: hides the per-frame image/depth decode (~tens of
    # ms) behind device compute. A small pool decodes concurrently (PIL
    # releases the GIL inside libjpeg/zlib); the bounded lead keeps the
    # trajectory's LRU cache from evicting frames before the dispatch loop
    # reads them.
    traj._cache_size = max(traj._cache_size, 4 * t_win_r * step + 16)
    main_pos = lo
    stop_prefetch = False
    decode_pool = ThreadPoolExecutor(max_workers=3)

    def prefetch():
        import time as _time
        pending = []
        for i in range(lo - t_win_r * step, hi + step):
            while not stop_prefetch and i > main_pos + 2 * t_win_r * step + 6:
                _time.sleep(0.002)
            if stop_prefetch:
                return
            pending.append(decode_pool.submit(
                traj.frame, min(max(i, 0), len(traj) - 1)))
            while len(pending) > 3:
                pending.pop(0).result()

    prefetcher = threading.Thread(target=prefetch, daemon=True)
    prefetcher.start()

    K_np = traj.K_dpv.astype(np.float32)

    for frame_cnt, ref_indx in enumerate(range(lo, hi)):
        main_pos = ref_indx
        idxs = window_indices(ref_indx, t_win_r, step)
        ref_rec = traj.frame(ref_indx)
        src_recs = [traj.frame(i) for i in idxs]
        valid = ref_rec.pose_valid and all(s.pose_valid for s in src_recs)
        if not valid:
            # invalid pose: skip the frame, reset the recurrence
            # (test_KVNet.py:241-246)
            bv_valid = jnp.zeros((1,), bool)
            bv_predict = jnp.full_like(bv_predict, -np.log(D))
            if verbose:
                print(f"frame {ref_indx}: invalid pose, recurrence reset")
            continue
        poses = np.stack([rel_pose(ref_rec.ext_M, s.ext_M)
                          for s in src_recs])
        nxt = traj.frame(min(ref_indx + step, len(traj) - 1))
        pose_next = rel_pose(ref_rec.ext_M, nxt.ext_M)
        batch = {
            "ref": frames.get(traj, ref_indx)[None],
            "srcs": jnp.stack([frames.get(traj, i) for i in idxs])[None],
            "poses": poses[None].astype(np.float32),
            "K": K_np[None],
            "pose_next": pose_next[None].astype(np.float32),
        }
        out = infer_step(params, batch, bv_predict, bv_valid)
        bv_predict = out.bv_predict
        bv_valid = jnp.ones((1,), bool)
        # device-side pgm quantization (see _q16): byte-identical files
        # on the bounded depth range, 4x fewer relay bytes
        pend_entries.append((frame_cnt, ref_rec))
        pend_d.append(_q16(out.depth[0]))
        pend_c.append(_q16(out.confidence[0]))
        if len(pend_entries) >= fetch_every:
            submit_pending()
        if verbose:
            print(f"Finished frame {frame_cnt + 1}/{hi - lo}", flush=True)

    stop_prefetch = True
    prefetcher.join(timeout=5)
    decode_pool.shutdown(wait=False)
    submit_pending()
    for f in futures:
        f.result()
    executor.shutdown()
    scene_path_info = [[traj.name or os.path.dirname(traj.img_paths[0])]]
    scene_path_info += [info_rows[k] for k in sorted(info_rows)]
    save_scene_path_info(os.path.join(res_dir, "scene_path_info.txt"),
                         scene_path_info)
    return n_exported


def _run_trajectory_chunked(params, cfg, traj, res_dir, t_win_r, step,
                            verbose, chunk_t, fast_sweep, sweep_band,
                            cache_features=False):
    """The production export path: chunked jitted scans with in-jit window
    assembly, process-pool decode, device-side quantization, and one
    stacked fetch per chunk (PERF.md "Host-loop export de-stall")."""
    chunk_run = _chunk_runner(cfg, chunk_t, fast_sweep, sweep_band,
                              cache_features)
    os.makedirs(res_dir, exist_ok=True)

    D = cfg.ndepth
    w_dpv, h_dpv = traj.dpv_size_wh
    bv_predict = jnp.full((1, D, h_dpv, w_dpv), -np.log(D), jnp.float32)
    bv_valid = jnp.zeros((1,), bool)

    # poses load without image decode; validity mirrors FrameRecord's
    exts = [np.asarray(traj.pose_loader(i)) for i in range(len(traj))]
    pose_ok = [bool(np.isfinite(e).all()) for e in exts]

    source = _RawSource(traj)
    dev_raw: "dict[int, jax.Array]" = {}
    dev_order: list = []

    def dev_frame(idx: int):
        idx = min(max(idx, 0), len(traj) - 1)
        if idx not in dev_raw:
            dev_raw[idx] = jnp.asarray(source.get(idx))
            dev_order.append(idx)
            while len(dev_order) > max(64, 2 * chunk_t + 8):
                del dev_raw[dev_order.pop(0)]
        return dev_raw[idx]

    info_rows = {}
    n_exported = 0
    count_lock = threading.Lock()

    def flush(entries, dc_stack):
        # ONE stacked (2, T, H, W) fetch per chunk (~95 ms fixed relay cost
        # each, amortized over chunk_t frames), off the dispatch thread
        nonlocal n_exported
        dc = fetch_with_deadline(dc_stack, tag="chunk maps")
        for j, (batch_idx, raw, path) in enumerate(entries):
            export_frame(res_dir, batch_idx, raw, dc[0, j], dc[1, j])
            info_rows[batch_idx] = [batch_idx, path]
        with count_lock:
            n_exported += len(entries)

    executor = ThreadPoolExecutor(max_workers=2)
    futures = []

    lo = t_win_r * step
    hi = len(traj) - t_win_r * step - 1
    span = t_win_r * step

    # chunk accumulation: (frame_cnt, ref_indx, poses, pose_next)
    chunk_bufs = []
    win_off = np.array(window_indices(0, t_win_r, step), np.int32)  # (V,)
    n_frames_c = (chunk_t - 1) + 2 * span + 1
    K_np = traj.K_dpv.astype(np.float32)

    # Double-buffered fetches: the relay serializes RPCs, so starting the
    # ~95 ms stacked fetch of chunk N before chunk N+1's uploads/dispatch
    # are enqueued stalls the device between chunks. Hold each chunk's
    # result one dispatch behind and submit its fetch only after the NEXT
    # chunk is in flight (measured on-chip: PERF.md "Production loop
    # round-4"). NRGBD_NO_DOUBLE_BUFFER=1 restores the eager fetch (A/B).
    pending: list = []               # at most one (entries, dc16)
    eager_fetch = bool(int(os.environ.get("NRGBD_NO_DOUBLE_BUFFER", "0")))

    def submit_pending():
        if pending:
            futures.append(executor.submit(flush, *pending.pop()))
        while len(futures) > 3:      # bound device-buffer backlog
            futures.pop(0).result()

    def dispatch_chunk():
        nonlocal bv_predict, bv_valid
        if not chunk_bufs:
            return
        n_real = len(chunk_bufs)
        pad = chunk_t - n_real
        base = chunk_bufs[0][1] - span
        # one contiguous device frame buffer covering every window (refs
        # are consecutive), stacked from per-frame cached uploads
        frames_u8 = jnp.stack([
            dev_frame(base + j) for j in range(n_frames_c)])
        ref_idx = np.array([c[1] - base for c in chunk_bufs], np.int32)
        ref_idx = np.concatenate([ref_idx, ref_idx[-1:].repeat(pad)])
        src_idx = ref_idx[:, None] + win_off[None, :]
        poses = np.stack([c[2] for c in chunk_bufs])
        poses = np.concatenate([poses, poses[-1:].repeat(pad, 0)])
        pose_next = np.stack([c[3] for c in chunk_bufs])
        pose_next = np.concatenate([pose_next, pose_next[-1:].repeat(pad, 0)])
        dc16, bv_predict = chunk_run(
            params, frames_u8, ref_idx, src_idx,
            poses.astype(np.float32), K_np, pose_next.astype(np.float32),
            bv_predict, bv_valid, np.int32(n_real))
        bv_valid = jnp.ones((1,), bool)
        entries = [(fc, source.get(ri), traj.img_paths[ri])
                   for (fc, ri, *_rest) in chunk_bufs]
        chunk_bufs.clear()
        if eager_fetch:
            pending.append((entries, dc16))
            submit_pending()
        else:
            # previous chunk's fetch goes out now that THIS chunk's
            # dispatches are already enqueued ahead of it on the relay
            submit_pending()
            pending.append((entries, dc16))

    lead = n_frames_c + chunk_t      # decode ~one chunk ahead
    for j in range(min(lead, len(traj))):
        source.prefetch(j)

    for frame_cnt, ref_indx in enumerate(range(lo, hi)):
        source.prefetch(ref_indx + lead)
        valid = pose_ok[ref_indx] and all(
            pose_ok[i] for i in window_indices(ref_indx, t_win_r, step))
        if not valid:
            dispatch_chunk()
            bv_valid = jnp.zeros((1,), bool)
            bv_predict = jnp.full_like(bv_predict, -np.log(D))
            if verbose:
                print(f"frame {ref_indx}: invalid pose, recurrence reset")
            continue
        poses = np.stack([
            rel_pose(exts[ref_indx], exts[i])
            for i in window_indices(ref_indx, t_win_r, step)])
        nxt = min(ref_indx + step, len(traj) - 1)
        pose_next = rel_pose(exts[ref_indx], exts[nxt])
        chunk_bufs.append((frame_cnt, ref_indx, poses, pose_next))
        if len(chunk_bufs) == chunk_t:
            dispatch_chunk()
        if verbose:
            print(f"Finished frame {frame_cnt + 1}/{hi - lo}", flush=True)

    dispatch_chunk()
    submit_pending()
    for f in futures:
        f.result()
    executor.shutdown()
    source.close()
    scene_path_info = [[traj.name or os.path.dirname(traj.img_paths[0])]]
    scene_path_info += [info_rows[k] for k in sorted(info_rows)]
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
    chunk_t: int = 8,
    cache_features: bool | None = None,
):
    """Data-parallel inference: trajectories mapped over the mesh, stepping
    in lockstep (the reference also ran its test model under DataParallel,
    test_KVNet.py:163). Shorter trajectories stop contributing via the
    validity mask; every lane writes its own export contract. ``chunk_t``
    frames are scanned per sharded dispatch with in-jit window assembly
    (see ``_parallel_chunk_runner``). ``cache_features`` defaults like
    ``run_trajectory``: ON on TPU when chunked, OFF elsewhere and OFF for
    torch-imported params (provenance marker).

    More lanes than devices is supported: lanes are block-mapped onto the
    mesh (lane i -> device i // (n_lanes / n_dev)), matching the contiguous
    blocks of ``P("data")`` sharding; n_lanes must divide evenly over the
    mesh. With ``mesh=None`` the largest divisor of n_lanes that fits the
    available devices is used (on one chip, all lanes batch onto it).

    Returns the per-trajectory exported-frame counts.
    """
    from neuralrgbd_tpu.parallel import make_mesh, shard_batch

    t_win_r = t_win_r if t_win_r is not None else cfg.t_win_r
    if cache_features is None:
        cache_features = _auto_cache_features(None, params,
                                              chunked=chunk_t > 1,
                                              verbose=verbose)
    n = len(trajs)
    if mesh is None:
        n_dev = len(jax.devices())
        mesh = make_mesh(max(d for d in range(1, min(n, n_dev) + 1)
                             if n % d == 0))
    m_dev = int(mesh.devices.size)
    if n % m_dev:
        raise ValueError(
            f"{n} lanes do not divide evenly over the {m_dev}-device mesh")
    per_dev = n // m_dev

    D = cfg.ndepth
    w_dpv, h_dpv = trajs[0].dpv_size_wh
    assert all(t.dpv_size_wh == trajs[0].dpv_size_wh for t in trajs), \
        "lockstep lanes must share the operating point"

    bv_predict = shard_batch(
        np.full((n, D, h_dpv, w_dpv), -np.log(D), np.float32), mesh)
    counts = [0] * n
    infos = [[t.name or os.path.dirname(t.img_paths[0])] for t in trajs]

    def flush_chunk(entries, d16, c16):
        depths = fetch_with_deadline(d16, tag="lane maps")  # (T, N, H, W)
        confs = fetch_with_deadline(c16, tag="lane confs")  # ONE per stack
        for t_off, refs, okrow, row_counts in entries:
            for i in range(n):
                if okrow[i]:
                    export_frame(res_dirs[i], row_counts[i],
                                 refs[i].img_raw,
                                 depths[t_off, i], confs[t_off, i])
                    infos[i].append([row_counts[i], refs[i].img_path])

    executor = ThreadPoolExecutor(max_workers=1)
    futures = []
    # double-buffered fetches (see _run_trajectory_chunked): hold each
    # chunk's stacked fetch until the next chunk's dispatches are enqueued
    pending: list = []
    eager_fetch = bool(int(os.environ.get("NRGBD_NO_DOUBLE_BUFFER", "0")))

    def submit_pending():
        if pending:
            futures.append(executor.submit(flush_chunk, *pending.pop()))
        while len(futures) > 2:
            futures.pop(0).result()

    lane_devices = list(mesh.devices.flat)
    caches = [_DeviceFrameCache(device=lane_devices[i // per_dev])
              for i in range(n)]

    lo = t_win_r * step
    hi = max(len(t) for t in trajs) - t_win_r * step - 1
    from jax.sharding import NamedSharding, PartitionSpec as P

    # lockstep lanes share ONE compiled program: the band must satisfy
    # every lane's trajectory, and any lane needing the XLA fallback
    # disables the fused sweep for all
    plans = [plan_sweep(t, cfg, t_win_r, step) for t in trajs]
    fast_sweep = (None if all(p[0] is None for p in plans)
                  else all(bool(p[0]) for p in plans))
    sweep_band = max(p[1] for p in plans)
    chunk_run = _parallel_chunk_runner(cfg, mesh, chunk_t,
                                       fast_sweep=fast_sweep,
                                       sweep_band=sweep_band,
                                       cache_features=cache_features)
    win_off = np.array(window_indices(0, t_win_r, step), np.int32)
    n_frames_c = (chunk_t - 1) + 2 * t_win_r * step + 1
    Ks = np.stack([t.K_dpv for t in trajs]).astype(np.float32)
    valid_dev = shard_batch(np.zeros(n, bool), mesh)
    eye = np.tile(np.eye(4, dtype=np.float32), (len(win_off), 1, 1))

    for c0 in range(lo, hi, chunk_t):
        t_real = min(chunk_t, hi - c0)
        base = c0 - t_win_r * step
        # one contiguous u8 frame buffer per lane, already on its device;
        # one SHARD per mesh device = that device's block of per_dev lanes
        lane_stacks = [jnp.stack([
            caches[i].get_raw(t, min(max(base + j, 0), len(t) - 1))
            for j in range(n_frames_c)
        ]) for i, t in enumerate(trajs)]
        shards = [jnp.stack(lane_stacks[k * per_dev:(k + 1) * per_dev])
                  for k in range(m_dev)]
        frames_u8 = jax.make_array_from_single_device_arrays(
            (n,) + shards[0].shape[1:], NamedSharding(mesh, P("data")),
            shards)

        ref_idx = np.minimum(np.arange(chunk_t, dtype=np.int32), t_real - 1) \
            + (c0 - base)
        src_idx = ref_idx[:, None] + win_off[None, :]
        poses = np.zeros((chunk_t, n, len(win_off), 4, 4), np.float32)
        pose_next = np.zeros((chunk_t, n, 4, 4), np.float32)
        ok = np.zeros((chunk_t, n), bool)
        chunk_refs = [[None] * n for _ in range(chunk_t)]
        for t_off in range(chunk_t):
            ref_indx = min(c0 + t_off, hi - 1)
            for i, t in enumerate(trajs):
                in_range = (t_off < t_real
                            and ref_indx < len(t) - t_win_r * step - 1)
                if not in_range:
                    poses[t_off, i] = eye
                    pose_next[t_off, i] = np.eye(4, dtype=np.float32)
                    continue
                rec = t.frame(ref_indx)
                srcs = [t.frame(ref_indx + int(o)) for o in win_off]
                lane_ok = rec.pose_valid and all(s.pose_valid for s in srcs)
                if lane_ok:
                    poses[t_off, i] = np.stack(
                        [rel_pose(rec.ext_M, s.ext_M) for s in srcs])
                    nxt = t.frame(min(ref_indx + step, len(t) - 1))
                    pose_next[t_off, i] = rel_pose(rec.ext_M, nxt.ext_M)
                else:
                    poses[t_off, i] = eye
                    pose_next[t_off, i] = np.eye(4, dtype=np.float32)
                ok[t_off, i] = lane_ok
                chunk_refs[t_off][i] = rec

        d16, c16, bv_predict, valid_dev = chunk_run(
            params, frames_u8, ref_idx, src_idx, poses, Ks, pose_next,
            ok, bv_predict, valid_dev)

        # export: whole chunk stacks, fetched once in the worker
        entries = []
        for t_off in range(t_real):
            row_counts = list(counts)
            for i in range(n):
                if ok[t_off, i]:
                    counts[i] += 1
            entries.append((t_off, chunk_refs[t_off], ok[t_off].copy(),
                            row_counts))
        if eager_fetch:
            pending.append((entries, d16, c16))
            submit_pending()
        else:
            submit_pending()
            pending.append((entries, d16, c16))
        if verbose:
            print(f"chunk {c0}..{c0 + t_real - 1}: "
                  f"ok={int(ok[:t_real].sum())}/{t_real * n}", flush=True)

    submit_pending()
    for f in futures:
        f.result()
    executor.shutdown()
    for i in range(n):
        os.makedirs(res_dirs[i], exist_ok=True)
        save_scene_path_info(
            os.path.join(res_dirs[i], "scene_path_info.txt"), infos[i])
    return counts
