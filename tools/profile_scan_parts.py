"""In-scan cost split of slam_frame_step on real hardware, two-length fori
method (cancels dispatch overhead): tracking-only path, +insert_keyframe,
+full BA schedule. Uses config forcing to pin the keyframe branch."""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.data import synthetic
from stereo_visual_slam_tpu.models import slam_core
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config


def step_time(cfg, carry, img, label, r=16):
    frame_step = slam_core.make_slam_step(cfg)

    runs = {}
    for n in (r, 3 * r):

        @jax.jit
        def run(c, n=n):
            def body(i, c):
                c2, rec = frame_step(
                    c, img, c.last_frame_id + 1,
                    jax.random.fold_in(jax.random.PRNGKey(0), i),
                )
                return c2
            return jax.lax.fori_loop(0, n, body, c)

        jax.block_until_ready(run(carry))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(carry))
            best = min(best, time.perf_counter() - t0)
        runs[n] = best
    dt = (runs[3 * r] - runs[r]) / (2 * r)
    print(f"{label:44s} {dt*1e3:8.3f} ms/frame", flush=True)


def main():
    enable_compilation_cache()
    base = Config()
    # build a realistic warm carry by running a few real frames
    world = synthetic.make_world(base, n_frames=24, n_points=8000, seed=0)
    frames = list(synthetic.frames(world))
    H, W = base.padded_hw

    def pad(im):
        out = np.zeros((H, W), np.uint8)
        out[: im.shape[0], : im.shape[1]] = im
        return out

    step = jax.jit(slam_core.make_slam_step(base))
    carry = slam_core.init_carry(base)
    for f, l, r in frames:
        carry, _ = step(
            carry, jnp.asarray(np.stack([pad(l), pad(r)])),
            jnp.asarray(f, jnp.int32),
            jax.random.fold_in(jax.random.PRNGKey(0), f),
        )
    carry = jax.block_until_ready(carry)
    img = jax.block_until_ready(
        jnp.asarray(np.stack([pad(frames[-1][1]), pad(frames[-1][2])]))
    )

    # 1. tracking-only: skip_kf rule always skips (inliers >= 0, yaw < inf)
    cfg_track = base.replace(
        keyframe=dataclasses.replace(
            base.keyframe, min_inliers_skip=0, max_yaw_skip=1e9
        )
    )
    step_time(cfg_track, carry, img, "track only (kf rule always skips)")

    # 2. +insert, BA disabled
    cfg_ins = base.replace(
        keyframe=dataclasses.replace(
            base.keyframe, min_inliers_skip=10**9
        ),
        ba=dataclasses.replace(
            base.ba, classify_passes=0, full_iters=0, pose_only_iters=0
        ),
    )
    step_time(cfg_ins, carry, img, "every frame keyframe, BA off")

    # 3. +BA full schedule
    cfg_ba = base.replace(
        keyframe=dataclasses.replace(base.keyframe, min_inliers_skip=10**9)
    )
    step_time(cfg_ba, carry, img, "every frame keyframe, BA on")


if __name__ == "__main__":
    main()
