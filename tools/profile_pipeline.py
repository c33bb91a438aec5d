"""Per-stage wall-time breakdown of the pipeline on real hardware.

Times each host-visible stage: image upload, fused-step dispatch, info
sync, keyframe registration (device_get + numpy map bookkeeping), BA
assemble + dispatch + fetch, plus raw device time of the two big programs.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.data import synthetic
from stereo_visual_slam_tpu.pipeline.vo import VisualOdometry
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config


def main():
    enable_compilation_cache()
    cfg = Config()
    n_frames = 40
    world = synthetic.make_world(cfg, n_frames=n_frames, n_points=8000, seed=0)
    frames = list(synthetic.frames(world))

    vo = VisualOdometry(cfg, enable_ba=True, lookahead=0)
    t0 = time.perf_counter()
    vo.warmup()
    print(f"warmup {time.perf_counter()-t0:.1f}s")

    # ---- instrument: monkeypatch to time stages ----
    times = {}

    def tick(name, dt):
        times.setdefault(name, []).append(dt)

    orig_upload = vo._upload
    def timed_upload(l, r):
        t = time.perf_counter(); out = orig_upload(l, r); tick("upload", time.perf_counter()-t); return out
    vo._upload = timed_upload

    orig_full = vo.full_step
    def timed_full(*a, **k):
        t = time.perf_counter(); out = orig_full(*a, **k); tick("dispatch_step", time.perf_counter()-t); return out
    vo.full_step = timed_full

    orig_reg = vo._register_keyframe
    def timed_reg(*a, **k):
        t = time.perf_counter(); out = orig_reg(*a, **k); tick("register_kf", time.perf_counter()-t); return out
    vo._register_keyframe = timed_reg

    orig_ba = vo._run_ba
    def timed_ba(*a, **k):
        t = time.perf_counter(); out = orig_ba(*a, **k); tick("run_ba", time.perf_counter()-t); return out
    vo._run_ba = timed_ba

    orig_collect = vo._collect
    def timed_collect(*a, **k):
        t = time.perf_counter(); out = orig_collect(*a, **k); tick("collect_total", time.perf_counter()-t); return out
    vo._collect = timed_collect

    t0 = time.perf_counter()
    for f, l, r in frames:
        vo.process(f, l, r)
    vo.drain()
    total = time.perf_counter() - t0
    print(f"total {total:.2f}s for {n_frames} frames = {n_frames/total:.1f} fps")
    for k, v in sorted(times.items()):
        print(f"  {k:16s} n={len(v):3d} mean={1e3*np.mean(v):7.2f}ms total={np.sum(v):6.3f}s")

    # ---- raw device time of the fused step (no host overhead) ----
    H, W = cfg.padded_hw
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (2, H, W)), jnp.uint8)
    import stereo_visual_slam_tpu.models.vslam as vslam
    st = vo.dstate if vo.dstate is not None else vslam.empty_state(cfg)
    key = jax.random.PRNGKey(0)
    out = orig_full(images, st, jnp.asarray(1.0, jnp.float32), key, jnp.asarray(0, jnp.int32))
    jax.block_until_ready(out)
    t = time.perf_counter()
    N = 20
    for i in range(N):
        out = orig_full(images, st, jnp.asarray(1.0, jnp.float32), key, jnp.asarray(0, jnp.int32))
    jax.block_until_ready(out)
    print(f"raw fused step device time: {(time.perf_counter()-t)/N*1e3:.2f}ms")

    # raw BA schedule time
    from stereo_visual_slam_tpu.ba import schedule as ba_schedule
    Kw = cfg.keyframe.window_size
    L = cfg.ba.max_landmarks
    inp = ba_schedule.ScheduleInput(
        T_c_w=jnp.tile(jnp.eye(4, dtype=jnp.float32), (Kw, 1, 1)),
        points=jnp.ones((L, 3), jnp.float32),
        uv=jnp.zeros((L, Kw, 2), jnp.float32),
        obs_mask=jnp.ones((L, Kw), jnp.float32),
        inlier=jnp.ones((L,), jnp.float32),
        reliable=jnp.ones((L,), jnp.float32),
        present=jnp.ones((L,), jnp.float32),
        pose_mask=jnp.ones((Kw,), jnp.float32),
        fixed_pose=jnp.zeros((Kw,), jnp.float32).at[0].set(1.0),
    )
    r = vo.run_schedule(inp, vo.K)
    jax.block_until_ready(r)
    t = time.perf_counter()
    for i in range(10):
        r = vo.run_schedule(inp, vo.K)
    jax.block_until_ready(r)
    print(f"raw BA schedule device time: {(time.perf_counter()-t)/10*1e3:.2f}ms")


if __name__ == "__main__":
    main()
