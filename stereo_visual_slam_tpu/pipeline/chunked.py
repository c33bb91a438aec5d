"""Chunked host driver for the device-resident SLAM core — the PRODUCTION
driver (run_vslam.py dispatches here by default).

The host's whole job: stack B frames, upload once, dispatch the scanned
chunk program (models/slam_core.py), and — one chunk LATE — fetch the
per-frame records. With double buffering the ~24 ms tunnel round trip and
the next chunk's device compute overlap, so the host adds O(RT / B) per
frame instead of O(RT).

Semantics equal pipeline/vo.py with lookahead=0 (exact reference
sequencing, BA feedback on the very next frame) — this driver simply moves
the map + state machine out of Python and into the scan carry.

Partial chunks (the sequence tail, or a flush before a snapshot) are padded
to the static chunk size with `active=False` slots, so every dispatch hits
the same compiled program. The per-frame RNG is keyed on the frame id with
a run-constant base key, making results independent of chunk boundaries:
stop/snapshot/resume at any frame reproduces the uninterrupted run
bit-exactly.
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


class _KeyframeView:
    def __init__(self, frame_id: int, T_c_w: np.ndarray):
        self.frame_id = frame_id
        self.keyframe_id = frame_id
        self.T_c_w = T_c_w


class _MapView:
    """Read-only MapStore-shaped view of a fetched device MapState (the
    fields pipeline/viz consumes: pos, alive, inlier, keyframes)."""

    def __init__(self, mstate):
        self.pos = np.asarray(mstate.pos)
        self.alive = np.asarray(mstate.obs_mask.max(axis=1) > 0)
        self.inlier = np.asarray(mstate.inlier) & self.alive
        self.keyframes = {}
        for slot in range(len(mstate.kf_frame_id)):
            fid = int(mstate.kf_frame_id[slot])
            if fid >= 0:
                self.keyframes[fid] = _KeyframeView(
                    fid, np.asarray(mstate.kf_T[slot])
                )


class ChunkedSlam:
    def __init__(
        self,
        config: Config,
        chunk: int = 8,
        pose_path: Optional[str] = None,
        seed: int = 0,
        mesh=None,
    ):
        self.config = config
        self.chunk = chunk
        self.mesh = mesh
        self.chunk_step = slam_core.make_chunk_step(config, mesh=mesh)
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
        active = jnp.ones((self.chunk,), bool)
        carry, recs = self.chunk_step(
            self.carry, images, fids, active, jax.random.PRNGKey(0)
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
        """Upload one chunk. Short lists are padded with inactive slots, so
        the compiled program is the same for every dispatch."""
        H, W = self.config.padded_hw
        B = self.chunk
        stacked = np.zeros((B, 2, H, W), np.uint8)
        fids = np.zeros((B,), np.int32)
        active = np.zeros((B,), bool)
        for i, (fid, left, right) in enumerate(frames):
            h, w = left.shape
            stacked[i, 0, :h, :w] = left
            stacked[i, 1, :h, :w] = right
            fids[i] = fid
            active[i] = True
        # padding slots reuse the last real frame id (any value works: the
        # carry passes through and the record is dropped)
        fids[len(frames):] = fids[max(len(frames) - 1, 0)]
        carry, recs = self.chunk_step(
            self.carry,
            jnp.asarray(stacked),
            jnp.asarray(fids),
            jnp.asarray(active),
            self.key,
        )
        self.carry = carry
        self.inflight.append(recs)

    # ------------------------------------------------------------------
    def _collect(self):
        recs = jax.device_get(self.inflight.popleft())
        B = len(recs.frame_id)
        for i in range(B):
            if not bool(recs.active[i]):
                continue
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
    def flush(self):
        """Dispatch any buffered partial chunk and drain every in-flight
        result, leaving the carry current through the last fed frame."""
        if self.pending and not self.lost:
            self._dispatch(self.pending)
            self.pending = []
        while self.inflight:
            self._collect()

    # ------------------------------------------------------------------
    def finish(self):
        """Flush and write the remaining window poses
        (write_remaining_pose, map.cpp:198-204)."""
        self.flush()
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

    # ------------------------------------------------------------------
    def landmarks(self) -> np.ndarray:
        """(M, 3) world positions of the live landmark arena rows — the
        device analog of MapStore's landmark cloud (used by --ply/--plot)."""
        m = jax.device_get(self.carry.mstate)
        live = (m.obs_mask.max(axis=1) > 0) & m.inlier
        return np.asarray(m.pos[live])

    @property
    def map(self) -> "_MapView":
        """Duck-typed MapStore view over the device map, so pipeline/viz
        (plot_trajectory, export_landmarks_ply) works unchanged."""
        return _MapView(jax.device_get(self.carry.mstate))

    # ------------------------------------------------------------------
    def save_snapshot(self, path: str):
        """Serialize the device carry + host counters. Drains the pipeline
        first (the partial chunk dispatches with inactive padding, so no
        recompile and no semantic difference vs an uninterrupted run)."""
        self.flush()
        carry = jax.device_get(self.carry)
        data = {"chunked_version": np.int64(1), "lost": np.bool_(self.lost)}
        data["key"] = np.asarray(jax.device_get(self.key))
        for part in ("tstate", "mstate"):
            sub = getattr(carry, part)
            for name, arr in sub._asdict().items():
                data[f"{part}_{name}"] = np.asarray(arr)
        for name in ("last_frame_id", "num_lost"):
            data[f"carry_{name}"] = np.asarray(getattr(carry, name))
        data["carry_lost"] = np.asarray(carry.lost)
        np.savez_compressed(path, **data)

    # ------------------------------------------------------------------
    def load_snapshot(self, path: str):
        """Restore a carry saved by save_snapshot (same Config required)."""
        from stereo_visual_slam_tpu.models import vslam

        z = np.load(path, allow_pickle=False)
        assert int(z["chunked_version"]) == 1
        tstate = vslam.TrackState(
            **{n: jnp.asarray(z[f"tstate_{n}"]) for n in vslam.TrackState._fields}
        )
        mstate = slam_core.MapState(
            **{n: jnp.asarray(z[f"mstate_{n}"])
               for n in slam_core.MapState._fields}
        )
        self.carry = slam_core.SlamCarry(
            tstate=tstate,
            mstate=mstate,
            last_frame_id=jnp.asarray(z["carry_last_frame_id"]),
            num_lost=jnp.asarray(z["carry_num_lost"]),
            lost=jnp.asarray(z["carry_lost"]),
        )
        self.key = jnp.asarray(z["key"])
        self.lost = bool(z["lost"])
