"""Host-side phase timing for the chunked driver.

The driver keeps its own phase breakdown (`ChunkedSlam.timing`): time the
main thread spends waiting on uploads, dispatching chunk programs, and
waiting on record fetches. fetch_wait is the device-throughput governor —
it absorbs whatever the chunk program has not finished by collection time.
"""

import time

from stereo_visual_slam_tpu.data import synthetic
from stereo_visual_slam_tpu.pipeline.chunked import ChunkedSlam
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config


def main():
    enable_compilation_cache()
    cfg = Config()
    chunk = 8
    n_frames = chunk * 10
    world = synthetic.make_world(cfg, n_frames=n_frames, n_points=8000, seed=0)
    frames = [(f, l, r) for f, l, r in synthetic.frames(world)]

    slam = ChunkedSlam(cfg, chunk=chunk)
    t0 = time.perf_counter()
    slam.warmup()
    print(f"warmup {time.perf_counter() - t0:.1f}s")

    best = None
    for _ in range(3):
        slam = ChunkedSlam(cfg, chunk=chunk)
        t0 = time.perf_counter()
        for f, l, r in frames:
            slam.process(f, l, r)
        slam.finish()
        wall = time.perf_counter() - t0
        if best is None or wall < best[0]:
            best = (wall, dict(slam.timing), slam.stats)

    wall, timing, stats = best
    nkf = sum(1 for s in stats if s["keyframe"])
    print(f"wall {wall * 1e3 / n_frames:.2f} ms/frame "
          f"({n_frames} frames, {nkf} keyframes)")
    for k, v in sorted(timing.items()):
        print(f"  {k:14s} {v * 1e3 / n_frames:8.2f} ms/frame")
    other = wall - sum(timing.values())
    print(f"  {'other':14s} {other * 1e3 / n_frames:8.2f} ms/frame")


if __name__ == "__main__":
    main()
