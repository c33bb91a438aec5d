"""The SLAM driver: tracking state machine + BA schedule.

Host-side orchestration of the jitted device programs, mirroring the control
flow of the reference:

  * state machine Init -> Track -> Lost with a 10-failure fuse
    (VO::pipeline, visual_odometry.cpp:649-706),
  * motion sanity check: >= 10 inliers and ||log(T_c_l)|| <= 5 * frame_gap
    (check_motion_estimation, :316-346),
  * keyframe rule: insert unless (inliers >= 80 and |yaw| < 0.03) (:353),
  * on rejection the previous frame is KEPT so the matcher gate and motion
    gate scale with the growing frame gap (:239, :328),
  * BA schedule per inserted keyframe once the window is full
    (run_vslam.cpp:58-71): 2 classify-only passes (5 iters), one full BA
    writing poses but NOT landmarks (10 iters), one pose-only pass (10),
  * backend -> frontend feedback: tracking restarts from the BA-optimized
    pose of the last keyframe (:553-556),
  * evicted keyframes stream to the trajectory writer (map.cpp:119-122).
"""

from __future__ import annotations

import enum
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.ba import pose_only as pose_only_mod
from stereo_visual_slam_tpu.ba import schur_lm
from stereo_visual_slam_tpu.mapping.store import Keyframe, Landmark, MapStore
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
        self.track_step, self.keyframe_update = vslam.make_tracker(config)
        self.map = MapStore(config)
        self.writer = TrajectoryWriter(pose_path) if pose_path else None
        self.enable_ba = enable_ba

        cam = config.camera
        self.K = jnp.asarray(
            [[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], jnp.float32
        )
        self.state = TrackState.INIT
        self.dstate: Optional[vslam.TrackState] = None  # device track state
        self.T_c_l = np.eye(4, dtype=np.float32)  # last relative motion
        self.last_frame_id = -1
        self.last_was_keyframe = False
        self.num_lost = 0
        self.next_lm_id = 0
        self.next_kf_id = 0
        self.rng = jax.random.PRNGKey(seed)
        # per-frame estimates for evaluation: frame_id -> T_c_w
        self.estimates: Dict[int, np.ndarray] = {}
        self.stats: List[dict] = []

    # ------------------------------------------------------------------
    def process(self, frame_id: int, left: np.ndarray, right: np.ndarray) -> dict:
        """Feed one stereo frame. Returns a stats dict for this frame."""
        t0 = time.perf_counter()
        hw = self.config.padded_hw
        lp = frontend_mod.prepare_image(jnp.asarray(left), hw)
        rp = frontend_mod.prepare_image(jnp.asarray(right), hw)
        feats = self.extract(lp, rp)

        if self.state == TrackState.INIT:
            rec = self._initialize(frame_id, feats)
        elif self.state == TrackState.TRACK:
            rec = self._track(frame_id, feats)
        else:
            rec = dict(frame_id=frame_id, state="lost")
        rec["wall_s"] = time.perf_counter() - t0
        self.stats.append(rec)
        return rec

    # ------------------------------------------------------------------
    def _initialize(self, frame_id: int, feats) -> dict:
        """First frame: spawn landmarks from stereo, insert keyframe 0
        (VO::initialization, visual_odometry.cpp:491-545)."""
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
        self._register_keyframe(frame_id, st)
        self.state = TrackState.TRACK
        self.last_frame_id = frame_id
        self.last_was_keyframe = True
        self.estimates[frame_id] = np.eye(4, dtype=np.float32)
        return dict(
            frame_id=frame_id,
            state="init",
            keyframe=True,
            n_landmarks=int(n_new),
        )

    # ------------------------------------------------------------------
    def _track(self, frame_id: int, feats) -> dict:
        cfg = self.config
        frame_gap = float(frame_id - self.last_frame_id)
        prev = self.dstate

        # backend->frontend feedback: refresh last pose from the map if the
        # last frame became a keyframe and BA has since adjusted it
        if self.last_was_keyframe and self.map.current_keyframe_id >= 0:
            T_opt = self.map.keyframes[self.map.current_keyframe_id].T_c_w
            prev = prev._replace(T_c_w=jnp.asarray(T_opt, jnp.float32))

        # constant-velocity prior
        T_init = jnp.asarray(self.T_c_l, jnp.float32) @ prev.T_c_w

        self.rng, key = jax.random.split(self.rng)
        new_state, info = self.track_step(
            feats, prev, T_init, jnp.asarray(frame_gap, jnp.float32), key
        )
        info = jax.device_get(info)  # ONE host round-trip for all scalars
        n_inliers = int(info.n_inliers)
        twist = float(info.twist_norm)
        yaw = float(info.angle_y)

        # motion sanity (check_motion_estimation, visual_odometry.cpp:316-346)
        ok = (
            n_inliers >= cfg.pnp.min_inliers
            and twist <= cfg.pnp.max_twist * frame_gap
        )
        if not ok:
            self.num_lost += 1
            if self.num_lost > cfg.keyframe.max_lost:
                self.state = TrackState.LOST
            return dict(
                frame_id=frame_id,
                state="rejected" if self.state == TrackState.TRACK else "lost",
                n_matches=int(info.n_matches),
                n_inliers=n_inliers,
                twist=twist,
            )

        self.num_lost = 0
        # keyframe rule (visual_odometry.cpp:353)
        is_keyframe = not (
            n_inliers >= cfg.keyframe.min_inliers_skip
            and yaw < cfg.keyframe.max_yaw_skip
        )

        n_new = 0
        if is_keyframe:
            new_state, n_new_j, upgrades = self.keyframe_update(
                new_state, feats, jnp.asarray(self.next_lm_id, jnp.int32)
            )
            n_new = int(n_new_j)
            self._register_keyframe(frame_id, new_state, upgrades)

        self.dstate = new_state
        self.T_c_l = np.asarray(info.T_c_l)
        self.last_frame_id = frame_id
        self.last_was_keyframe = is_keyframe
        self.estimates[frame_id] = np.asarray(new_state.T_c_w)

        ba_stats = {}
        if (
            is_keyframe
            and self.enable_ba
            and self.map.n_keyframes() >= cfg.keyframe.window_size
        ):
            ba_stats = self._run_ba_schedule()
            # pose feedback into the device state
            T_opt = self.map.keyframes[self.map.current_keyframe_id].T_c_w
            self.dstate = self.dstate._replace(
                T_c_w=jnp.asarray(T_opt, jnp.float32)
            )
            self.estimates[frame_id] = np.asarray(T_opt)

        self._drain_evicted()
        return dict(
            frame_id=frame_id,
            state="tracked",
            keyframe=is_keyframe,
            n_matches=int(info.n_matches),
            n_inliers=n_inliers,
            n_new_landmarks=n_new,
            twist=twist,
            yaw=yaw,
            **ba_stats,
        )

    # ------------------------------------------------------------------
    def _register_keyframe(self, frame_id: int, st: vslam.TrackState, upgrades=None):
        """Pull the keyframe's feature table to the host and update the map
        (VO::insert_key_frame bookkeeping, visual_odometry.cpp:358-427)."""
        yx, valid, lm_id, lm_pos, lm_rel, T_c_w = jax.device_get(
            (st.yx, st.valid, st.lm_id, st.lm_pos, st.lm_reliable, st.T_c_w)
        )
        lm_id = lm_id.astype(np.int64)
        valid = valid.copy()
        lm_id = lm_id.copy()

        # spawn / upgrade landmarks
        for i in np.nonzero(valid)[0]:
            lid = int(lm_id[i])
            if lid < 0:
                continue
            lm = self.map.landmarks.get(lid)
            if lm is None:
                if lid >= self.next_lm_id:  # newly spawned on device
                    self.map.insert_landmark(
                        Landmark(
                            landmark_id=lid,
                            position=lm_pos[i].copy(),
                            reliable_depth=bool(lm_rel[i]),
                        )
                    )
                else:
                    # landmark was GC'd while still tracked; drop the feature
                    valid[i] = False
                    lm_id[i] = -1
            elif upgrades is not None and bool(np.asarray(upgrades)[i]):
                lm.position = lm_pos[i].copy()
                lm.reliable_depth = True

        self.next_lm_id = int(max(self.next_lm_id, lm_id.max() + 1))
        uv = np.stack([yx[:, 1], yx[:, 0]], axis=-1).astype(np.float32)
        kf = Keyframe(
            keyframe_id=self.next_kf_id,
            frame_id=frame_id,
            T_c_w=T_c_w,
            lm_ids=np.where(valid, lm_id, -1),
            uv=uv,
            valid=valid,
        )
        self.next_kf_id += 1
        self.map.insert_keyframe(kf)

    # ------------------------------------------------------------------
    def _run_ba_schedule(self) -> dict:
        """The per-keyframe BA schedule of run_vslam.cpp:58-71."""
        cfg = self.config.ba
        stats = {}
        # two classify-only passes: optimize but write back only inlier flags
        for p in range(cfg.classify_passes):
            asm = self.map.assemble_ba(require_reliable=True)
            if asm is None:
                return stats
            arrays, kf_ids, lm_ids = asm
            problem = schur_lm.BAProblem(
                **{k: jnp.asarray(v) for k, v in arrays.items()}
            )
            res = schur_lm.lm_optimize(
                problem,
                self.K,
                iters=cfg.classify_iters,
                huber_delta=cfg.huber_delta,
                chi2_threshold=cfg.chi2_threshold,
                adaptive_rounds=cfg.adaptive_rounds,
                target_inlier_ratio=cfg.target_inlier_ratio,
                lambda_init=cfg.lm_lambda_init,
            )
            nlm = len(lm_ids)
            self.map.write_back(
                kf_ids,
                lm_ids,
                landmark_inlier=np.asarray(res.landmark_inlier)[:nlm],
            )

        # full BA: write back POSES only (run_vslam.cpp:64,
        # if_update_landmark=false keeps stereo scale pinned)
        asm = self.map.assemble_ba(require_reliable=True)
        if asm is not None:
            arrays, kf_ids, lm_ids = asm
            problem = schur_lm.BAProblem(
                **{k: jnp.asarray(v) for k, v in arrays.items()}
            )
            res = schur_lm.lm_optimize(
                problem, self.K, iters=cfg.full_iters,
                huber_delta=cfg.huber_delta,
                chi2_threshold=cfg.chi2_threshold,
                lambda_init=cfg.lm_lambda_init,
            )
            nK = len(kf_ids)
            nlm = len(lm_ids)
            self.map.write_back(
                kf_ids,
                lm_ids,
                T_c_w=np.asarray(res.T_c_w)[:nK],
                landmark_inlier=np.asarray(res.landmark_inlier)[:nlm],
            )
            stats["ba_cost"] = float(res.cost)

        # pose-only refinement (landmarks fixed, no reliable_depth filter)
        asm = self.map.assemble_ba(require_reliable=False)
        if asm is not None:
            arrays, kf_ids, lm_ids = asm
            problem = schur_lm.BAProblem(
                **{k: jnp.asarray(v) for k, v in arrays.items()}
            )
            res = pose_only_mod.optimize_pose_only(
                problem, self.K, iters=cfg.pose_only_iters,
                huber_delta=cfg.huber_delta,
                chi2_threshold=cfg.chi2_threshold,
                lambda_init=cfg.lm_lambda_init,
            )
            nK = len(kf_ids)
            nlm = len(lm_ids)
            self.map.write_back(
                kf_ids,
                lm_ids,
                T_c_w=np.asarray(res.T_c_w)[:nK],
                landmark_inlier=np.asarray(res.landmark_inlier)[:nlm],
            )
            stats["pose_only_cost"] = float(res.cost)
        return stats

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
