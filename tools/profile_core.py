"""Device-time breakdown of the chunked SLAM core's three big programs:
frontend extract, the fused chunk step, and the BA schedule in isolation.
Run on the real chip to see where the per-frame budget goes."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.data import synthetic
from stereo_visual_slam_tpu.models import frontend as frontend_mod
from stereo_visual_slam_tpu.models import slam_core
from stereo_visual_slam_tpu.ba import schedule as ba_schedule
from stereo_visual_slam_tpu.pipeline.chunked import ChunkedSlam
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config


def timeit(fn, n=20):
    fn()  # warm
    jax.effects_barrier()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    enable_compilation_cache()
    cfg = Config()
    chunk = 8
    n_frames = chunk * 6
    world = synthetic.make_world(cfg, n_frames=n_frames, n_points=8000, seed=0)
    frames = list(synthetic.frames(world))

    # ---- frontend extract alone ----
    extract = jax.jit(frontend_mod.make_extractor(cfg))
    H, W = cfg.padded_hw
    lf = jnp.zeros((H, W), jnp.float32) + jnp.asarray(
        np.pad(frames[0][1].astype(np.float32),
               ((0, H - frames[0][1].shape[0]), (0, W - frames[0][1].shape[1]))))
    rf = jnp.zeros((H, W), jnp.float32) + jnp.asarray(
        np.pad(frames[0][2].astype(np.float32),
               ((0, H - frames[0][2].shape[0]), (0, W - frames[0][2].shape[1]))))
    t_extract = timeit(lambda: extract(lf, rf))
    print(f"extract:            {t_extract*1e3:8.2f} ms/frame")

    # ---- full chunked pipeline, real state evolution ----
    slam = ChunkedSlam(cfg, chunk=chunk)
    t0 = time.perf_counter()
    slam.warmup()
    print(f"(warmup {time.perf_counter()-t0:.1f}s)")
    t0 = time.perf_counter()
    for f, l, r in frames:
        slam.process(f, l, r)
    slam.finish()
    dt = time.perf_counter() - t0
    n_kf = sum(1 for r in slam.stats if r["keyframe"])
    print(f"chunked pipeline:   {dt/n_frames*1e3:8.2f} ms/frame "
          f"({n_frames} frames, {n_kf} keyframes)")

    # ---- BA schedule in isolation on the final map state ----
    m = slam.carry.mstate
    cam = cfg.camera
    K = jnp.asarray([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                    jnp.float32)
    Kw = cfg.keyframe.window_size
    run_schedule = jax.jit(ba_schedule.make_ba_schedule(cfg.ba))
    present = (jnp.max(m.obs_mask, axis=1) > 0).astype(jnp.float32)
    inp = ba_schedule.ScheduleInput(
        T_c_w=m.kf_T, points=m.pos, uv=m.obs_uv, obs_mask=m.obs_mask,
        inlier=m.inlier.astype(jnp.float32),
        reliable=m.reliable.astype(jnp.float32), present=present,
        pose_mask=(jnp.arange(Kw) < m.kf_count).astype(jnp.float32),
        fixed_pose=jnp.zeros((Kw,), jnp.float32).at[0].set(
            1.0 if cfg.ba.fix_oldest_pose else 0.0),
    )
    t_ba = timeit(lambda: run_schedule(inp, K))
    print(f"BA schedule:        {t_ba*1e3:8.2f} ms/keyframe")

    # ---- fused chunk step dispatch (device time, steady map) ----
    step = slam_core.make_chunk_step(cfg)
    imgs = jnp.stack([
        jnp.stack([
            jnp.asarray(np.pad(l.astype(np.uint8), ((0, H - l.shape[0]), (0, W - l.shape[1])))),
            jnp.asarray(np.pad(r.astype(np.uint8), ((0, H - r.shape[0]), (0, W - r.shape[1])))),
        ]) for _, l, r in frames[:chunk]
    ])
    fids = jnp.arange(chunk, dtype=jnp.int32) + 100
    key = jax.random.PRNGKey(0)
    carry = slam.carry
    active = jnp.ones((chunk,), bool)
    t_step = timeit(lambda: step(carry, imgs, fids, active, key))
    print(f"chunk step (dev):   {t_step/chunk*1e3:8.2f} ms/frame (steady-state carry)")


if __name__ == "__main__":
    main()
