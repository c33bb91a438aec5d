"""Sliding-window keyframe/landmark map — host-side bookkeeping.

Replaces the reference's `Map` (map.hpp:15-81, map.cpp): hash maps of
keyframes and landmarks, observation back-links, the 10-keyframe sliding
window with distance-based eviction (map.cpp:48-130) and landmark GC
(map.cpp:132-152).

Design: control flow and small mutable state live on the host in numpy
(exact mirror of the reference's role for Map), while every BA call gets a
dense padded (L, K) observation grid assembled here and shipped to the
device in one transfer. A native C++ implementation with the same interface
lives in native/mapstore.cpp (bound via ctypes) for the production path.

A keyframe's features are stored as fixed-size arrays (slot-indexed like the
device TrackState), so assembly is pure vectorized numpy.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from stereo_visual_slam_tpu.utils.config import Config


def se3_log_norm(T: np.ndarray) -> float:
    """||log(T)|| for a 4x4 rigid transform (numpy, host)."""
    R = T[:3, :3]
    t = T[:3, 3]
    cos_t = np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    theta = float(np.arccos(cos_t))
    if theta < 1e-6:
        w = np.array(
            [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
        ) * 0.5
        v = t
    else:
        w = (
            np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
            * theta
            / (2.0 * np.sin(theta))
        )
        wx = np.array(
            [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]
        )
        t2 = theta * theta
        Vinv = (
            np.eye(3)
            - 0.5 * wx
            + (1.0 - theta * np.cos(theta / 2.0) / (2.0 * np.sin(theta / 2.0)))
            / t2
            * (wx @ wx)
        )
        v = Vinv @ t
    return float(np.sqrt(np.sum(v * v) + np.sum(w * w)))


@dataclasses.dataclass
class Keyframe:
    keyframe_id: int
    frame_id: int
    T_c_w: np.ndarray           # (4, 4)
    lm_ids: np.ndarray          # (N,) int64, -1 where no landmark
    uv: np.ndarray              # (N, 2) f32 pixel (x, y)
    valid: np.ndarray           # (N,) bool


@dataclasses.dataclass
class Landmark:
    landmark_id: int
    position: np.ndarray        # (3,) world
    reliable_depth: bool
    is_inlier: bool = True
    observed_times: int = 0


class MapStore:
    """Sliding-window map. All mutation is host-side; `assemble_ba` produces
    the dense device payload."""

    def __init__(self, config: Config):
        self.config = config
        self.keyframes: Dict[int, Keyframe] = {}
        self.landmarks: Dict[int, Landmark] = {}
        self.current_keyframe_id: int = -1
        self.evicted: List[Keyframe] = []   # drained by the trajectory writer

    # ------------------------------------------------------------- inserts
    def insert_landmark(self, lm: Landmark):
        self.landmarks[lm.landmark_id] = lm

    def insert_keyframe(self, kf: Keyframe):
        """Insert + count observations; evict if the window overflows
        (Map::insert_keyframe, map.cpp:13-33)."""
        self.keyframes[kf.keyframe_id] = kf
        self.current_keyframe_id = kf.keyframe_id
        for lm_id in kf.lm_ids[kf.valid]:
            lm = self.landmarks.get(int(lm_id))
            if lm is not None:
                lm.observed_times += 1
        if len(self.keyframes) > self.config.keyframe.window_size:
            self.remove_keyframe()

    # ------------------------------------------------------------- eviction
    def remove_keyframe(self):
        """Distance rule of map.cpp:48-130: among the other keyframes, evict
        the CLOSEST to the current one if its distance < 0.2, else the
        FARTHEST."""
        cur = self.keyframes[self.current_keyframe_id]
        T_w_cur = np.linalg.inv(cur.T_c_w)
        min_d, max_d = np.inf, -np.inf
        min_id = max_id = None
        for kf_id, kf in self.keyframes.items():
            if kf_id == self.current_keyframe_id:
                continue
            d = se3_log_norm(kf.T_c_w @ T_w_cur)
            if d < min_d:
                min_d, min_id = d, kf_id
            if d > max_d:
                max_d, max_id = d, kf_id
        if min_id is None:
            return
        victim_id = (
            min_id
            if min_d < self.config.keyframe.eviction_min_dist
            else max_id
        )
        victim = self.keyframes.pop(victim_id)
        for lm_id in victim.lm_ids[victim.valid]:
            lm = self.landmarks.get(int(lm_id))
            if lm is not None:
                lm.observed_times -= 1
        self.evicted.append(victim)
        self.clean_map()

    def clean_map(self):
        """GC landmarks with no remaining observations (map.cpp:132-152)."""
        dead = [k for k, lm in self.landmarks.items() if lm.observed_times <= 0]
        for k in dead:
            del self.landmarks[k]

    # ------------------------------------------------------------- queries
    def n_keyframes(self) -> int:
        return len(self.keyframes)

    def has_landmark(self, lm_id: int) -> bool:
        return lm_id in self.landmarks

    # ------------------------------------------------------------- BA I/O
    def assemble_ba(
        self, require_reliable: bool = True
    ) -> Optional[Tuple[dict, np.ndarray, np.ndarray]]:
        """Build the dense (L, K) BA problem arrays.

        Landmark filter mirrors optimize_map (optimization.cpp:158-163):
        is_inlier and (if require_reliable) reliable_depth_.

        Returns (arrays dict, kf_ids (K,), lm_ids (L,)) or None if empty.
        Arrays are padded to (config.ba.max_landmarks, window_size).
        """
        cfg = self.config
        Kw = cfg.keyframe.window_size
        L = cfg.ba.max_landmarks
        kf_ids = np.array(sorted(self.keyframes.keys()), dtype=np.int64)
        nK = len(kf_ids)
        if nK == 0:
            return None
        col_of = {int(k): i for i, k in enumerate(kf_ids)}

        sel_ids = [
            lm_id
            for lm_id, lm in self.landmarks.items()
            if lm.is_inlier and (lm.reliable_depth or not require_reliable)
        ]
        sel_ids.sort()
        if not sel_ids:
            return None
        if len(sel_ids) > L:
            sel_ids = sel_ids[:L]
        row_of = {lm_id: i for i, lm_id in enumerate(sel_ids)}
        nL = len(sel_ids)

        T = np.tile(np.eye(4, dtype=np.float32), (Kw, 1, 1))
        pts = np.zeros((L, 3), np.float32)
        uv = np.zeros((L, Kw, 2), np.float32)
        obs = np.zeros((L, Kw), np.float32)
        pose_mask = np.zeros((Kw,), np.float32)
        point_mask = np.zeros((L,), np.float32)

        for i, lm_id in enumerate(sel_ids):
            pts[i] = self.landmarks[lm_id].position
        point_mask[:nL] = 1.0

        for kf_id in kf_ids:
            kf = self.keyframes[int(kf_id)]
            k = col_of[int(kf_id)]
            T[k] = kf.T_c_w
            pose_mask[k] = 1.0
            vmask = kf.valid & (kf.lm_ids >= 0)
            ids = kf.lm_ids[vmask]
            uvs = kf.uv[vmask]
            rows = np.array([row_of.get(int(x), -1) for x in ids])
            okr = rows >= 0
            uv[rows[okr], k] = uvs[okr]
            obs[rows[okr], k] = 1.0

        fixed = np.zeros((Kw,), np.float32)
        if cfg.ba.fix_oldest_pose and nK > 0:
            fixed[0] = 1.0  # kf_ids sorted: col 0 is the oldest

        arrays = dict(
            T_c_w=T,
            points=pts,
            uv=uv,
            obs_mask=obs,
            point_mask=point_mask,
            pose_mask=pose_mask,
            fixed_pose=fixed,
        )
        return arrays, kf_ids, np.array(sel_ids, dtype=np.int64)

    def write_back(
        self,
        kf_ids: np.ndarray,
        lm_ids: np.ndarray,
        T_c_w: Optional[np.ndarray] = None,
        points: Optional[np.ndarray] = None,
        landmark_inlier: Optional[np.ndarray] = None,
    ):
        """Write BA results into the map (optimize_map writeback,
        optimization.cpp:254-287)."""
        if T_c_w is not None:
            for i, kf_id in enumerate(kf_ids):
                if int(kf_id) in self.keyframes:
                    self.keyframes[int(kf_id)].T_c_w = np.asarray(
                        T_c_w[i], np.float32
                    )
        for i, lm_id in enumerate(lm_ids):
            lm = self.landmarks.get(int(lm_id))
            if lm is None:
                continue
            if points is not None:
                lm.position = np.asarray(points[i], np.float32)
            if landmark_inlier is not None:
                lm.is_inlier = bool(landmark_inlier[i])
