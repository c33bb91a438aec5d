"""The SLAM driver: tracking state machine + BA schedule.

Host-side orchestration of the jitted device programs, mirroring the control
flow of the reference:

  * state machine Init -> Track -> Lost with a 10-failure fuse
    (VO::pipeline, visual_odometry.cpp:649-706),
  * motion sanity check and keyframe rule evaluated ON DEVICE inside the
    fused per-frame step (models/vslam.py make_full_step),
  * on rejection the previous frame is KEPT so the matcher gate and motion
    gate scale with the growing frame gap (visual_odometry.cpp:239, :328),
  * per inserted keyframe, the complete BA schedule of run_vslam.cpp:58-71
    runs as ONE device dispatch (ba/schedule.py),
  * backend -> frontend feedback: tracking restarts from the BA-optimized
    pose of the last keyframe (visual_odometry.cpp:553-556),
  * evicted keyframes stream to the trajectory writer (map.cpp:119-122).

Host <-> device traffic per frame: 1 image upload + 1 dispatch + 1 small
scalar fetch; keyframes add 1 feature-table fetch + 1 BA upload/dispatch/
fetch cycle. (The first implementation did ~67 blocking round trips per
frame; over the TPU tunnel that dominated everything.)
"""

from __future__ import annotations

import enum
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.ba import schedule as ba_schedule
from stereo_visual_slam_tpu.mapping.store import Keyframe, MapStore
from stereo_visual_slam_tpu.models import frontend as frontend_mod
from stereo_visual_slam_tpu.models import vslam
from stereo_visual_slam_tpu.pipeline.trajectory import TrajectoryWriter
from stereo_visual_slam_tpu.utils.config import Config


class TrackState(enum.Enum):
    INIT = 0
    TRACK = 1
    LOST = 2


class VisualOdometry:
    def __init__(
        self,
        config: Config,
        pose_path: Optional[str] = None,
        seed: int = 0,
        enable_ba: bool = True,
    ):
        self.config = config
        self.extract = frontend_mod.make_extractor(config)
        self.full_step = vslam.make_full_step(config, self.extract)
        _, self.keyframe_update = vslam.make_tracker(config)
        self.run_schedule = ba_schedule.make_ba_schedule(config.ba)
        self.map = MapStore(config)
        self.writer = TrajectoryWriter(pose_path) if pose_path else None
        self.enable_ba = enable_ba

        cam = config.camera
        self.K = jnp.asarray(
            [[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], jnp.float32
        )
        self.state = TrackState.INIT
        self.dstate: Optional[vslam.TrackState] = None
        self.T_c_l = np.eye(4, dtype=np.float32)
        self.last_frame_id = -1
        self.num_lost = 0
        self.next_lm_id = 0
        self.next_kf_id = 0
        self.rng = jax.random.PRNGKey(seed)
        self.estimates: Dict[int, np.ndarray] = {}
        self.stats: List[dict] = []

    # ------------------------------------------------------------------
    def _upload(self, left: np.ndarray, right: np.ndarray) -> jnp.ndarray:
        """One transfer for both images, uint8 (KITTI native depth)."""
        H, W = self.config.padded_hw
        h, w = left.shape
        stacked = np.zeros((2, H, W), np.uint8)
        stacked[0, :h, :w] = np.asarray(left, np.uint8)
        stacked[1, :h, :w] = np.asarray(right, np.uint8)
        return jnp.asarray(stacked)

    def process(self, frame_id: int, left: np.ndarray, right: np.ndarray) -> dict:
        """Feed one stereo frame. Returns a stats dict for this frame."""
        t0 = time.perf_counter()
        if self.state == TrackState.INIT:
            rec = self._initialize(frame_id, left, right)
        elif self.state == TrackState.TRACK:
            rec = self._track(frame_id, left, right)
        else:
            rec = dict(frame_id=frame_id, state="lost")
        rec["wall_s"] = time.perf_counter() - t0
        self.stats.append(rec)
        return rec

    # ------------------------------------------------------------------
    def _initialize(self, frame_id: int, left, right) -> dict:
        """First frame: spawn landmarks from stereo, insert keyframe 0
        (VO::initialization, visual_odometry.cpp:491-545)."""
        images = self._upload(left, right)
        feats = self.extract(
            images[0].astype(jnp.float32), images[1].astype(jnp.float32)
        )
        n = self.config.frontend.n_features
        st = vslam.TrackState(
            yx=feats.yx,
            valid=jnp.zeros((n,), bool),
            signs=feats.signs,
            lm_id=-jnp.ones((n,), jnp.int32),
            lm_pos=jnp.zeros((n, 3), jnp.float32),
            lm_reliable=jnp.zeros((n,), bool),
            T_c_w=jnp.eye(4, dtype=jnp.float32),
        )
        st, n_new, _ = self.keyframe_update(
            st, feats, jnp.asarray(self.next_lm_id, jnp.int32)
        )
        self.dstate = st
        self._register_keyframe(frame_id, upgrades=None)
        self.state = TrackState.TRACK
        self.last_frame_id = frame_id
        self.estimates[frame_id] = np.eye(4, dtype=np.float32)
        return dict(
            frame_id=frame_id,
            state="init",
            keyframe=True,
            n_landmarks=int(n_new),
        )

    # ------------------------------------------------------------------
    def _track(self, frame_id: int, left, right) -> dict:
        cfg = self.config
        frame_gap = float(frame_id - self.last_frame_id)
        prev = self.dstate

        images = self._upload(left, right)
        T_init = jnp.asarray(self.T_c_l, jnp.float32) @ prev.T_c_w
        self.rng, key = jax.random.split(self.rng)

        new_state, info_d, upgrades = self.full_step(
            images,
            prev,
            T_init,
            jnp.asarray(frame_gap, jnp.float32),
            key,
            jnp.asarray(self.next_lm_id, jnp.int32),
        )
        info = jax.device_get(info_d)   # one blocking transfer

        if not bool(info.ok):
            self.num_lost += 1
            if self.num_lost > cfg.keyframe.max_lost:
                self.state = TrackState.LOST
            return dict(
                frame_id=frame_id,
                state="rejected" if self.state == TrackState.TRACK else "lost",
                n_matches=int(info.n_matches),
                n_inliers=int(info.n_inliers),
                twist=float(info.twist_norm),
            )

        self.num_lost = 0
        self.dstate = new_state
        self.T_c_l = np.asarray(info.T_c_l)
        self.last_frame_id = frame_id

        is_keyframe = bool(info.is_keyframe)
        ba_stats = {}
        if is_keyframe:
            self._register_keyframe(frame_id, upgrades)
            if self.enable_ba and self.map.n_keyframes() >= cfg.keyframe.window_size:
                ba_stats = self._run_ba()
        self.estimates[frame_id] = np.asarray(self.dstate.T_c_w)

        self._drain_evicted()
        return dict(
            frame_id=frame_id,
            state="tracked",
            keyframe=is_keyframe,
            n_matches=int(info.n_matches),
            n_inliers=int(info.n_inliers),
            n_new_landmarks=int(info.n_new),
            twist=float(info.twist_norm),
            yaw=float(info.angle_y),
            **ba_stats,
        )

    # ------------------------------------------------------------------
    def _register_keyframe(self, frame_id: int, upgrades=None):
        """Pull the keyframe's feature table (one transfer) and update the
        arena map (VO::insert_key_frame bookkeeping,
        visual_odometry.cpp:358-427) with vectorized numpy."""
        st = self.dstate
        fetch = (st.yx, st.valid, st.lm_id, st.lm_pos, st.lm_reliable, st.T_c_w)
        if upgrades is not None:
            fetch = fetch + (upgrades,)
        got = jax.device_get(fetch)
        yx, valid, lm_id, lm_pos, lm_rel, T_c_w = got[:6]
        upg = got[6] if upgrades is not None else None
        lm_id = lm_id.astype(np.int64)

        live = valid & (lm_id >= 0)
        new_mask = live & (lm_id >= self.next_lm_id)
        if new_mask.any():
            self.map.spawn(
                lm_id[new_mask], lm_pos[new_mask], lm_rel[new_mask]
            )
            self.next_lm_id = int(lm_id[new_mask].max()) + 1

        rows = self.map.rows_of(lm_id)
        known = live & (rows >= 0)
        if upg is not None:
            up = known & upg
            if up.any():
                self.map.upgrade(rows[up], lm_pos[up])

        uv = np.stack([yx[:, 1], yx[:, 0]], axis=-1).astype(np.float32)
        kf = Keyframe(
            keyframe_id=self.next_kf_id,
            frame_id=frame_id,
            T_c_w=np.asarray(T_c_w, np.float32),
            rows=np.where(known, rows, -1).astype(np.int32),
            uv=uv,
            valid=known,
        )
        self.next_kf_id += 1
        self.map.insert_keyframe(kf)

    # ------------------------------------------------------------------
    def _run_ba(self) -> dict:
        """One device dispatch for the whole BA schedule."""
        asm = self.map.assemble_schedule_input()
        if asm is None:
            return {}
        arrays, kf_ids, rows = asm
        inp = ba_schedule.ScheduleInput(
            **{k: jnp.asarray(v) for k, v in arrays.items()}
        )
        res = jax.device_get(self.run_schedule(inp, self.K))
        nK = len(kf_ids)
        self.map.write_back_schedule(
            kf_ids, rows, res.T_c_w[:nK], res.inlier[: len(rows)]
        )
        # feed the optimized pose back into the live tracking state
        T_opt = self.map.keyframes[self.map.current_keyframe_id].T_c_w
        self.dstate = self.dstate._replace(T_c_w=jnp.asarray(T_opt, jnp.float32))
        # refresh per-frame estimates with the optimized window poses
        for kf in self.map.keyframes.values():
            self.estimates[kf.frame_id] = kf.T_c_w
        return dict(
            ba_cost=float(res.cost_full), pose_only_cost=float(res.cost_pose)
        )

    # ------------------------------------------------------------------
    def _drain_evicted(self):
        if self.writer is None:
            self.map.evicted.clear()
            return
        for kf in self.map.evicted:
            self.writer.write(kf.frame_id, kf.T_c_w)
        self.map.evicted.clear()

    def finish(self):
        """Flush remaining keyframe poses (write_remaining_pose,
        map.cpp:198-204)."""
        self._drain_evicted()
        if self.writer is not None:
            for kf_id in sorted(self.map.keyframes.keys()):
                kf = self.map.keyframes[kf_id]
                self.writer.write(kf.frame_id, kf.T_c_w)
