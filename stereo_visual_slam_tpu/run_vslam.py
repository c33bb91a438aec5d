"""CLI driver — the analog of the reference's run_vslam node
(src/run_vslam.cpp): loops a stereo sequence through the pipeline,
schedules BA per keyframe, writes the trajectory, and reports errors.

Usage:
    python -m stereo_visual_slam_tpu.run_vslam --dataset /path/to/seq00 \
        [--sequence 00] [--frames N] [--pose-out estimated_traj.txt]
    python -m stereo_visual_slam_tpu.run_vslam --synthetic 100 [--cpu]

    --params params.yaml    YAML overrides (see utils/config_io.py)
    --no-ba                 frontend-only ("Without Optimization" row)
    --lookahead N           pipeline depth (0 = exact reference sequencing)
    --plot out.png          bird's-eye trajectory figure
    --ply out.ply           landmark cloud export
    --record out.jsonl      per-frame structured log
    --snapshot out.npz      save full SLAM state at the end
    --resume in.npz         restore state before processing
"""

from __future__ import annotations

import argparse
import sys
import time


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", help="KITTI sequence dir (or dataset root)")
    p.add_argument("--sequence", help="sequence id when --dataset is a root")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="run on an N-frame synthetic sequence instead")
    p.add_argument("--frames", type=int, default=0, help="limit frame count")
    p.add_argument("--params", help="YAML config overrides")
    p.add_argument("--pose-out", default="estimated_traj.txt")
    p.add_argument("--no-ba", action="store_true")
    p.add_argument("--lookahead", type=int, default=1)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--plot", help="write trajectory plot PNG")
    p.add_argument("--ply", help="write landmark cloud PLY")
    p.add_argument("--record", help="write per-frame JSONL log")
    p.add_argument("--snapshot", help="save state snapshot at the end")
    p.add_argument("--resume", help="load state snapshot before running")
    p.add_argument("--quiet", action="store_true")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
    from stereo_visual_slam_tpu.utils.config import Config

    enable_compilation_cache()

    base = Config()
    if args.params:
        from stereo_visual_slam_tpu.utils.config_io import config_from_yaml

        base = config_from_yaml(args.params, base)

    gt = None
    if args.synthetic:
        from stereo_visual_slam_tpu.data import synthetic

        cfg = base
        world = synthetic.make_world(cfg, n_frames=args.synthetic, n_points=8000)
        source = synthetic.frames(world)
        n_frames = args.synthetic
        gt = world.poses_T_c_w
    elif args.dataset:
        from stereo_visual_slam_tpu.data import kitti

        seq = kitti.open_sequence(args.dataset, args.sequence)
        cfg = kitti.config_for(seq, base)
        source = seq.frames()
        n_frames = seq.n_frames
        gt = seq.gt_T_c_w
    else:
        print("need --dataset or --synthetic", file=sys.stderr)
        return 2

    if args.frames:
        n_frames = min(n_frames, args.frames)

    from stereo_visual_slam_tpu.pipeline.vo import VisualOdometry

    vo = VisualOdometry(
        cfg,
        pose_path=args.pose_out,
        enable_ba=not args.no_ba,
        lookahead=args.lookahead,
    )
    recorder = None
    if args.record:
        from stereo_visual_slam_tpu.pipeline.viz import TrajectoryRecorder

        recorder = TrajectoryRecorder(args.record)
    if args.resume:
        from stereo_visual_slam_tpu.pipeline.snapshot import load_snapshot

        load_snapshot(vo, args.resume)

    t0 = time.perf_counter()
    for f, left, right in source:
        if f >= n_frames:
            break
        rec = vo.process(f, left, right)
        if recorder:
            recorder.record(rec, vo.estimates.get(rec.get("frame_id", -1)))
        if not args.quiet and (f % 50 == 0 or rec.get("keyframe")):
            print(
                f"frame {f:5d} {rec['state']:9s} "
                f"kf={int(bool(rec.get('keyframe', False)))} "
                f"inl={rec.get('n_inliers', 0):4d}",
                flush=True,
            )
        if rec["state"] == "lost":
            print("tracking LOST", file=sys.stderr)
            break
    vo.finish()
    wall = time.perf_counter() - t0

    n_kf = vo.next_kf_id
    print(f"processed {vo.last_frame_id + 1} frames, {n_kf} keyframes "
          f"in {wall:.1f}s ({(vo.last_frame_id + 1) / wall:.2f} fps)")

    if gt is not None and len(vo.estimates) > 2:
        from stereo_visual_slam_tpu.pipeline import trajectory as traj_mod

        fids = sorted(k for k in vo.estimates if k < len(gt))
        est = np.stack([vo.estimates[f] for f in fids])
        t_err, r_err = traj_mod.kitti_errors(est, gt[fids])
        ate = traj_mod.ate_rmse(est, gt[fids])
        print(f"ATE RMSE {ate:.3f} m | KITTI trans {t_err:.2f} % "
              f"rot {r_err:.4f} deg/m")

    if args.plot:
        from stereo_visual_slam_tpu.pipeline.viz import plot_trajectory

        plot_trajectory(vo.estimates, args.plot, gt, vo.map)
        print(f"wrote {args.plot}")
    if args.ply:
        from stereo_visual_slam_tpu.pipeline.viz import export_landmarks_ply

        export_landmarks_ply(vo.map, args.ply)
        print(f"wrote {args.ply}")
    if args.snapshot:
        from stereo_visual_slam_tpu.pipeline.snapshot import save_snapshot

        save_snapshot(vo, args.snapshot)
        print(f"wrote {args.snapshot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
