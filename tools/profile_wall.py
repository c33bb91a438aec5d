"""Wall-time sweep of the ChunkedSlam host pipeline: chunk size x prefetch
depth, same frames, drained runs. Finds the configuration whose wall time
tracks device throughput closest (docs/PERF.md: wall - device gap is the
host/tunnel overhead)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from stereo_visual_slam_tpu.data import synthetic  # noqa: E402
from stereo_visual_slam_tpu.pipeline.chunked import ChunkedSlam  # noqa: E402
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache  # noqa: E402
from stereo_visual_slam_tpu.utils.config import Config  # noqa: E402


def main():
    enable_compilation_cache()
    cfg = Config()
    n_frames = 160
    world = synthetic.make_world(cfg, n_frames=n_frames, n_points=8000, seed=0)
    frames = [(f, l, r) for f, l, r in synthetic.frames(world)]

    combos = [(8, 3), (8, 6), (16, 3), (16, 6)]
    if len(sys.argv) > 1:
        combos = [tuple(map(int, c.split(":"))) for c in sys.argv[1:]]

    for chunk, prefetch in combos:
        slam = ChunkedSlam(cfg, chunk=chunk, prefetch=prefetch)
        slam.warmup()
        # warm BA/steady-state before timing: run 4 chunks, then reset timer
        t0 = time.perf_counter()
        t_mark = None
        for f, left, right in frames:
            if f == 4 * chunk:
                t_mark = time.perf_counter()
            slam.process(f, left, right)
        slam.finish()
        t_total = time.perf_counter() - (t_mark or t0)
        n_timed = n_frames - 4 * chunk
        kf = sum(1 for s in slam.stats if s["keyframe"])
        print(
            f"chunk={chunk:3d} prefetch={prefetch}: "
            f"{t_total/n_timed*1e3:6.2f} ms/frame wall "
            f"({n_timed} frames, {kf} kf total) "
            f"timing={ {k: round(v,2) for k,v in slam.timing.items()} }",
            flush=True,
        )


if __name__ == "__main__":
    main()
