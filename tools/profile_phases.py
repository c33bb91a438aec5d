"""Phase split of the production chunk program: batched extraction vs the
sequential tracking/BA scan, at several chunk sizes.

Method: time (a) the full chunk_step, (b) batch_extract alone, on live
synthetic frames, serialized dispatches with block_until_ready, min of
several reps. The axon tunnel dispatch floor (~0.1 ms for array-arg
dispatches) is noise at these scales.
"""

import time

import jax
import numpy as np

from stereo_visual_slam_tpu.data import synthetic
from stereo_visual_slam_tpu.models import frontend as frontend_mod
from stereo_visual_slam_tpu.models import slam_core
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config


def timed(fn, reps=5):
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    enable_compilation_cache()
    cfg = Config()
    H, W = cfg.padded_hw
    n_total = 40
    world = synthetic.make_world(cfg, n_frames=n_total, n_points=8000, seed=0)
    frames = [(f, l, r) for f, l, r in synthetic.frames(world)]

    batch_extract = frontend_mod.make_batch_extractor(cfg)

    for chunk in (8, 16, 32):
        stacked = np.zeros((chunk, 2, H, W), np.uint8)
        for i, (f, l, r) in enumerate(frames[:chunk]):
            h, w = l.shape
            stacked[i, 0, :h, :w] = l
            stacked[i, 1, :h, :w] = r
        imgs = jax.device_put(stacked)
        fids = jax.device_put(np.arange(chunk, dtype=np.int32))
        act = jax.device_put(np.ones((chunk,), bool))
        key = jax.random.PRNGKey(0)

        chunk_step = slam_core.make_chunk_step(cfg)
        carry = slam_core.init_carry(cfg)
        # advance carry so timing reflects steady state (window filling)
        carry, _ = chunk_step(carry, imgs, fids, act, key)
        carry = jax.block_until_ready(carry)

        t_full = timed(lambda: chunk_step(carry, imgs, fids, act, key)[1])
        t_ext = timed(lambda: batch_extract(imgs))
        print(
            f"B={chunk:3d}: full {t_full*1e3:7.1f} ms "
            f"({t_full/chunk*1e3:5.2f}/frame) | extract {t_ext*1e3:7.1f} ms "
            f"({t_ext/chunk*1e3:5.2f}/frame) | scan-part "
            f"{(t_full-t_ext)/chunk*1e3:5.2f}/frame",
            flush=True,
        )


if __name__ == "__main__":
    main()
