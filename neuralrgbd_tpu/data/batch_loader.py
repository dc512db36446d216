"""Trajectory batch scheduler for training.

Reference semantics (``mdataloader/batch_loader.py``): one trajectory per
batch lane (= one device), trajectories partitioned into groups of
``batch_size``; every lane starts at a random frame and all lanes advance
one reference frame per step for a common ``traj_len`` =
min(lane lengths) - 2 * t_win_r (batch_loader.py:175-190); invalid
poses/depths surface as per-lane validity instead of NaN volume surgery.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from neuralrgbd_tpu.data.trajectory import Trajectory, window_batch


class BatchGroup:
    """A group of ``batch_size`` trajectories advanced in lockstep."""

    def __init__(self, lanes: List[Trajectory], t_win_r: int, step: int,
                 rng: np.random.RandomState):
        self.lanes = lanes
        self.t_win_r = t_win_r
        self.step = step
        span = 2 * t_win_r * step
        usable = [len(t) - span - 1 for t in lanes]
        self.traj_len = max(0, min(usable))
        # per-lane random start offset so lanes don't sync on scene structure
        self.offsets = [
            int(rng.randint(0, u - self.traj_len + 1)) if u > self.traj_len
            else 0
            for u in usable
        ]

    def frame_batch(self, frame_idx: int):
        """Stacked lanes batch for reference-frame position ``frame_idx``.

        Returns (batch dict incl. labels + lane_valid, ref records)."""
        parts, refs = [], []
        for lane, off in zip(self.lanes, self.offsets):
            ref_indx = self.t_win_r * self.step + off + frame_idx
            b, ref, valid = window_batch(lane, ref_indx, self.t_win_r,
                                         self.step, with_labels=True)
            b["lane_valid"] = np.asarray([valid])
            parts.append(b)
            refs.append(ref)
        batch = {
            k: np.concatenate([p[k] for p in parts], axis=0)
            for k in parts[0]
        }
        return batch, refs


class BatchScheduler:
    """Iterates over groups of trajectories (one epoch)."""

    def __init__(
        self,
        make_traj: Callable[[int], Trajectory],
        n_traj: int,
        batch_size: int,
        t_win_r: int = 2,
        step: int = 1,
        seed: int = 0,
        shuffle: bool = True,
    ):
        self.make_traj = make_traj
        self.n_traj = n_traj
        self.batch_size = batch_size
        self.t_win_r = t_win_r
        self.step = step
        self.rng = np.random.RandomState(seed)
        order = np.arange(n_traj)
        if shuffle:
            self.rng.shuffle(order)
        # drop the ragged tail so lane count (= mesh lanes) stays static
        n_groups = n_traj // batch_size
        self.groups = [
            order[i * batch_size:(i + 1) * batch_size].tolist()
            for i in range(n_groups)
        ]

    def __len__(self) -> int:
        return len(self.groups)

    def __iter__(self):
        for idxs in self.groups:
            lanes = [self.make_traj(i) for i in idxs]
            yield BatchGroup(lanes, self.t_win_r, self.step, self.rng)
