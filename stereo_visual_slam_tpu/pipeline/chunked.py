"""Chunked host driver for the device-resident SLAM core.

The host's whole job: stack B frames, upload once, dispatch the scanned
chunk program (models/slam_core.py), and — one chunk LATE — fetch the
per-frame records. With double buffering the ~24 ms tunnel round trip and
the next chunk's device compute overlap, so the host adds O(RT / B) per
frame instead of O(RT).

Semantics equal pipeline/vo.py with lookahead=0 (exact reference
sequencing, BA feedback on the very next frame) — this driver simply moves
the map + state machine out of Python and into the scan carry.
"""

from __future__ import annotations

import collections
from typing import Deque, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.models import slam_core
from stereo_visual_slam_tpu.pipeline.trajectory import TrajectoryWriter
from stereo_visual_slam_tpu.utils.config import Config


class ChunkedSlam:
    def __init__(
        self,
        config: Config,
        chunk: int = 8,
        pose_path: Optional[str] = None,
        seed: int = 0,
    ):
        self.config = config
        self.chunk = chunk
        self.chunk_step = slam_core.make_chunk_step(config)
        self.carry = slam_core.init_carry(config)
        self.key = jax.random.PRNGKey(seed)
        self.writer = TrajectoryWriter(pose_path) if pose_path else None
        self.inflight: Deque[Tuple] = collections.deque()
        self.pending: List[Tuple[int, np.ndarray, np.ndarray]] = []
        self.estimates: Dict[int, np.ndarray] = {}
        self.stats: List[dict] = []
        self.lost = False
        self._evictions: List[Tuple[int, np.ndarray]] = []

    # ------------------------------------------------------------------
    def warmup(self):
        """Compile the chunk program on dummy frames (slow over the tunnel,
        cached persistently afterwards)."""
        H, W = self.config.padded_hw
        images = jnp.zeros((self.chunk, 2, H, W), jnp.uint8)
        fids = jnp.arange(self.chunk, dtype=jnp.int32)
        carry, recs = self.chunk_step(
            self.carry, images, fids, jax.random.PRNGKey(0)
        )
        jax.block_until_ready(recs)

    # ------------------------------------------------------------------
    def process(self, frame_id: int, left: np.ndarray, right: np.ndarray):
        """Feed one frame; dispatches when a full chunk accumulates."""
        if self.lost:
            return
        self.pending.append((frame_id, left, right))
        if len(self.pending) >= self.chunk:
            self._dispatch(self.pending[: self.chunk])
            self.pending = self.pending[self.chunk:]
            # keep exactly one chunk in flight: collect the previous one
            while len(self.inflight) > 1:
                self._collect()

    # ------------------------------------------------------------------
    def _dispatch(self, frames):
        H, W = self.config.padded_hw
        B = len(frames)
        stacked = np.zeros((B, 2, H, W), np.uint8)
        fids = np.zeros((B,), np.int32)
        for i, (fid, left, right) in enumerate(frames):
            h, w = left.shape
            stacked[i, 0, :h, :w] = left
            stacked[i, 1, :h, :w] = right
            fids[i] = fid
        self.key, k = jax.random.split(self.key)
        carry, recs = self.chunk_step(
            self.carry, jnp.asarray(stacked), jnp.asarray(fids), k
        )
        self.carry = carry
        self.inflight.append(recs)

    # ------------------------------------------------------------------
    def _collect(self):
        recs = jax.device_get(self.inflight.popleft())
        B = len(recs.frame_id)
        for i in range(B):
            fid = int(recs.frame_id[i])
            if bool(recs.lost[i]):
                self.lost = True
            rec = dict(
                frame_id=fid,
                state="lost" if bool(recs.lost[i]) else (
                    "tracked" if bool(recs.tracked[i]) else "rejected"
                ),
                keyframe=bool(recs.is_keyframe[i]),
                n_matches=int(recs.n_matches[i]),
                n_inliers=int(recs.n_inliers[i]),
                n_new_landmarks=int(recs.n_new[i]),
                twist=float(recs.twist[i]),
                ba_cost=float(recs.ba_cost[i]) if bool(recs.ba_ran[i]) else None,
            )
            self.stats.append(rec)
            if bool(recs.tracked[i]):
                self.estimates[fid] = np.asarray(recs.T_c_w[i])
            if bool(recs.evict_valid[i]):
                efid = int(recs.evict_frame_id[i])
                eT = np.asarray(recs.evict_T[i])
                self._evictions.append((efid, eT))
                self.estimates[efid] = eT
                if self.writer is not None:
                    self.writer.write(efid, eT)

    # ------------------------------------------------------------------
    def finish(self):
        """Flush the partial chunk, drain in-flight results, and write the
        remaining window poses (write_remaining_pose, map.cpp:198-204)."""
        if self.pending and not self.lost:
            self._dispatch(self.pending)  # short last chunk: new compile of
            self.pending = []             # size B' — amortized across runs
        while self.inflight:
            self._collect()
        kf_ids, kf_T, count = jax.device_get(
            (
                self.carry.mstate.kf_frame_id,
                self.carry.mstate.kf_T,
                self.carry.mstate.kf_count,
            )
        )
        order = np.argsort(kf_ids[: int(count)])
        for j in order:
            fid = int(kf_ids[j])
            if fid < 0:
                continue
            self.estimates[fid] = np.asarray(kf_T[j])
            if self.writer is not None:
                self.writer.write(fid, kf_T[j])
