"""Benchmark: full SLAM pipeline throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: keyframes per second of the full pipeline (tracking + the complete
per-keyframe BA schedule), the reference's headline number — it reports
~0.18 s per keyframe (README.md:90), i.e. 5.56 keyframes/s, on a desktop
CPU. vs_baseline > 1 means faster than the reference.

Runs on whatever platform jax selects (the driver provides the TPU); the
workload is a synthetic KITTI-geometry sequence (1241 x 376 stereo,
fx=718.856) since no KITTI data ships in this image. Warm-up frames (jit
compilation) are excluded from timing.
"""

import json
import sys
import time

import numpy as np

REFERENCE_KEYFRAMES_PER_S = 1.0 / 0.18


def main():
    n_frames = 60
    warmup = 12

    from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from stereo_visual_slam_tpu.data import synthetic
    from stereo_visual_slam_tpu.pipeline import trajectory as traj_mod
    from stereo_visual_slam_tpu.pipeline.vo import VisualOdometry
    from stereo_visual_slam_tpu.utils.config import Config

    cfg = Config()
    world = synthetic.make_world(cfg, n_frames=n_frames, n_points=8000, seed=0)
    frames = [
        (f, l, r) for f, l, r in synthetic.frames(world)
    ]  # pre-render: exclude dataset IO from timing

    vo = VisualOdometry(cfg, enable_ba=True)
    t_timed = 0.0
    n_keyframes_timed = 0
    n_tracked = 0
    for f, left, right in frames:
        t0 = time.perf_counter()
        rec = vo.process(f, left, right)
        dt = time.perf_counter() - t0
        if rec["state"] == "lost":
            break
        if rec["state"] in ("tracked", "init"):
            n_tracked += 1
        if f >= warmup:
            t_timed += dt
            if rec.get("keyframe"):
                n_keyframes_timed += 1
    vo.finish()

    # accuracy side-channel (printed to stderr, not the JSON line)
    fids = sorted(vo.estimates.keys())
    est = np.stack([vo.estimates[f] for f in fids])
    gt = world.poses_T_c_w[fids]
    t_err, r_err = traj_mod.kitti_errors(est, gt)
    ate = traj_mod.ate_rmse(est, gt)
    print(
        f"# tracked {n_tracked}/{n_frames} ate={ate:.3f}m "
        f"trans={t_err:.2f}% rot={r_err:.4f}deg/m "
        f"timed: {n_keyframes_timed} keyframes in {t_timed:.2f}s",
        file=sys.stderr,
    )

    kf_per_s = n_keyframes_timed / t_timed if t_timed > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "keyframes_per_s",
                "value": round(kf_per_s, 3),
                "unit": "keyframes/s",
                "vs_baseline": round(kf_per_s / REFERENCE_KEYFRAMES_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
