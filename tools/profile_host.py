"""Host-side stage timing for the chunked driver: stacking, upload,
dispatch, collect — to find where wall time above device time goes."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.data import synthetic
from stereo_visual_slam_tpu.pipeline.chunked import ChunkedSlam
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config


def main():
    enable_compilation_cache()
    cfg = Config()
    chunk = 8
    n_frames = chunk * 6
    world = synthetic.make_world(cfg, n_frames=n_frames, n_points=8000, seed=0)
    frames = list(synthetic.frames(world))

    slam = ChunkedSlam(cfg, chunk=chunk)
    slam.warmup()

    times = {}

    def tick(name, dt):
        times.setdefault(name, []).append(dt)

    orig_dispatch = slam._dispatch
    def timed_dispatch(fr):
        t = time.perf_counter(); orig_dispatch(fr); tick("dispatch_total", time.perf_counter() - t)
    slam._dispatch = timed_dispatch

    orig_collect = slam._collect
    def timed_collect():
        t = time.perf_counter(); orig_collect(); tick("collect", time.perf_counter() - t)
    slam._collect = timed_collect

    # also time the pieces inside dispatch by monkeypatching asarray use:
    H, W = cfg.padded_hw
    t_stack = []
    t_upload = []
    t_step = []
    def manual_dispatch(fr):
        t0 = time.perf_counter()
        B = len(fr)
        stacked = np.zeros((B, 2, H, W), np.uint8)
        fids = np.zeros((B,), np.int32)
        for i, (fid, left, right) in enumerate(fr):
            h, w = left.shape
            stacked[i, 0, :h, :w] = left
            stacked[i, 1, :h, :w] = right
            fids[i] = fid
        t1 = time.perf_counter()
        imgs = jnp.asarray(stacked)
        fidsd = jnp.asarray(fids)
        t2 = time.perf_counter()
        active = jnp.ones(fidsd.shape, bool)
        carry, recs = slam.chunk_step(slam.carry, imgs, fidsd, active, slam.key)
        slam.carry = carry
        slam.inflight.append(recs)
        t3 = time.perf_counter()
        t_stack.append(t1 - t0); t_upload.append(t2 - t1); t_step.append(t3 - t2)
    slam._dispatch = manual_dispatch

    t0 = time.perf_counter()
    for f, l, r in frames:
        slam.process(f, l, r)
    slam.finish()
    wall = time.perf_counter() - t0

    print(f"wall: {wall/n_frames*1e3:.2f} ms/frame over {n_frames} frames")
    for name, arr in [("stack", t_stack), ("upload", t_upload),
                      ("dispatch", t_step)]:
        print(f"  {name:10s} {np.sum(arr)/n_frames*1e3:7.2f} ms/frame "
              f"(mean {np.mean(arr)*1e3:.1f} ms/chunk, n={len(arr)})")
    for name, arr in times.items():
        print(f"  {name:10s} {np.sum(arr)/n_frames*1e3:7.2f} ms/frame "
              f"(mean {np.mean(arr)*1e3:.1f} ms/chunk, n={len(arr)})")


if __name__ == "__main__":
    main()
