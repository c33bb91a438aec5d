"""Split the scanned slam step's cost: tracking-only frames vs keyframe
frames (insert + BA), by forcing the keyframe rule on/off via config."""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.data import synthetic
from stereo_visual_slam_tpu.models import slam_core
from stereo_visual_slam_tpu.pipeline.chunked import ChunkedSlam
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config


def run(cfg, frames, chunk=8, label=""):
    slam = ChunkedSlam(cfg, chunk=chunk)
    slam.warmup()
    # feed one warm chunk first
    for f, l, r in frames[:chunk]:
        slam.process(f, l, r)
    slam.flush()
    t0 = time.perf_counter()
    for f, l, r in frames[chunk:]:
        slam.process(f, l, r)
    slam.finish()
    dt = time.perf_counter() - t0
    n = len(frames) - chunk
    kf = sum(1 for s in slam.stats if s.get("keyframe"))
    print(f"{label:28s} {dt/n*1e3:8.2f} ms/frame  ({kf} kf total)")


def main():
    enable_compilation_cache()
    cfg = Config()
    n_frames = 40
    world = synthetic.make_world(cfg, n_frames=n_frames, n_points=8000, seed=0)
    frames = list(synthetic.frames(world))

    run(cfg, frames, label="default rule")

    # never insert keyframes after the window fills: skip whenever tracked
    kc = dataclasses.replace(
        cfg.keyframe, min_inliers_skip=1, max_yaw_skip=1e9
    )
    cfg_nokf = dataclasses.replace(cfg, keyframe=kc)
    run(cfg_nokf, frames, label="no keyframes (track only)")

    # always keyframe
    kc2 = dataclasses.replace(cfg.keyframe, min_inliers_skip=10**9)
    cfg_allkf = dataclasses.replace(cfg, keyframe=kc2)
    run(cfg_allkf, frames, label="every frame keyframe")


if __name__ == "__main__":
    main()
