"""True device-time profiler: each stage runs R iterations inside ONE jitted
lax.fori_loop, so the ~3 ms tunnel round trip amortizes away and the
measurement is pure device time per iteration.

Every body feeds a data-dependent scalar back into its input, preventing
XLA from hoisting the stage out of the loop or dead-code-eliminating it.
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.ba import schedule as ba_schedule
from stereo_visual_slam_tpu.models import frontend as frontend_mod
from stereo_visual_slam_tpu.models import slam_core, vslam
from stereo_visual_slam_tpu.ops import image as im_ops
from stereo_visual_slam_tpu.ops import matcher as matcher_ops
from stereo_visual_slam_tpu.ops import orb as orb_ops
from stereo_visual_slam_tpu.ops import stereo as stereo_ops
from stereo_visual_slam_tpu.tracking import pnp
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config

R = 30


def loop_time(body, label, r=R):
    """body: scalar -> scalar (data-dependent). Times the body via two
    device-side fori_loop lengths (r and 3r), single dispatch each; the
    difference cancels the ~26 ms per-dispatch tunnel cost that captured
    constants incur on the axon backend (min of 3 samples per length)."""

    runs = {}
    for n in (r, 3 * r):

        @jax.jit
        def run(s, n=n):
            return jax.lax.fori_loop(0, n, lambda i, c: body(c), s)

        jax.block_until_ready(run(jnp.zeros(())))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.ones(())))
            best = min(best, time.perf_counter() - t0)
        runs[n] = best
    dt = (runs[3 * r] - runs[r]) / (2 * r)
    print(f"{label:48s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def feed(x):
    return jnp.tanh(jnp.sum(x)) * 1e-20


def main():
    enable_compilation_cache()
    cfg = Config()
    rng = np.random.default_rng(0)
    H, W = cfg.padded_hw
    left = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    fe = cfg.frontend
    cam = cfg.camera
    K = jnp.asarray(
        [[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], jnp.float32
    )
    N = fe.max_raw_keypoints

    # ---- extract at various level counts ----
    for n_levels in (1, 8):
        c = cfg.replace(
            frontend=dataclasses.replace(fe, n_levels=n_levels)
        )
        ext = frontend_mod.make_extractor(c)

        def body(s, ext=ext):
            f = ext(left + s, right)
            return feed(f.signs) + feed(f.depth)

        loop_time(body, f"extract n_levels={n_levels}", r=10)

    # ---- L0-scale stage breakdown ----
    from stereo_visual_slam_tpu.ops.pallas import fast_kernel
    from stereo_visual_slam_tpu.ops import fast as fast_ops

    def d_pallas(s):
        yx, sc = fast_kernel.detect(
            left + s, max_kp=512, threshold=fe.fast_threshold,
            border=fe.border_margin, valid_hw=cfg.image_hw)
        return feed(sc) + feed(yx.astype(jnp.float32))
    loop_time(d_pallas, "L0 detect pallas+topk k=512")

    def d_xla(s):
        yx, sc = fast_ops.detect(
            left + s, max_kp=512, threshold=fe.fast_threshold,
            border=fe.border_margin, valid_hw=cfg.image_hw)
        return feed(sc) + feed(yx.astype(jnp.float32))
    loop_time(d_xla, "L0 detect XLA+topk k=512")

    def d_score_only(s):
        sc = fast_kernel.fast_nms_score_map(
            left + s, threshold=fe.fast_threshold)
        return feed(sc)
    loop_time(d_score_only, "L0 pallas score map only")

    def d_topk(s):
        sc, idx = jax.lax.top_k((left + s).reshape(-1), 512)
        return feed(sc) + feed(idx.astype(jnp.float32))
    loop_time(d_topk, "L0 top_k 512 of 491K")

    def d_resize(s):
        im = jax.image.resize(
            (left + s)[:376, :1241], (313, 1034), method="linear")
        return feed(im)
    loop_time(d_resize, "L1 resize")

    def d_blur(s):
        return feed(im_ops.box_blur(left + s, fe.blur_box))
    loop_time(d_blur, "L0 blur 5x5")

    yx512 = jnp.asarray(rng.integers(24, 350, (512, 2)), jnp.int32)

    def d_desc(s):
        p, sgn, th = orb_ops.describe(
            left + s, yx512, bits=fe.descriptor_bits, patch=fe.patch_size,
            steer=fe.steer_descriptor)
        return feed(sgn)
    loop_time(d_desc, "L0 describe k=512")

    yxN = jnp.asarray(rng.integers(24, 350, (N, 2)), jnp.int32)
    validN = jnp.ones((N,), bool)

    def d_stereo(s):
        st = stereo_ops.match_disparity(
            left + s, right, yxN, validN, fx=cam.fx, baseline=cam.baseline,
            max_disparity=fe.max_disparity, patch=fe.stereo_patch,
            min_zncc=fe.min_zncc, min_depth=fe.min_depth,
            max_depth=fe.max_depth, reliable_depth=fe.reliable_depth)
        return feed(st.depth) + feed(st.score)
    loop_time(d_stereo, f"stereo N={N}")

    # ---- tracking ----
    signs_a = jnp.asarray(
        np.where(rng.integers(0, 2, (N, 256)), 1.0, -1.0), jnp.float32)
    signs_b = jnp.asarray(
        np.where(rng.integers(0, 2, (N, 256)), 1.0, -1.0), jnp.float32)
    pts_w = jnp.asarray(np.stack(
        [rng.uniform(-20, 20, N), rng.uniform(-5, 5, N),
         rng.uniform(10, 60, N)], -1), jnp.float32)
    uvN = jnp.asarray(rng.uniform(0, 1000, (N, 2)), jnp.float32)
    mc, pc = cfg.matcher, cfg.pnp

    def d_match(s):
        m = matcher_ops.match(
            signs_a + s, validN, signs_b, validN, jnp.asarray(1.0),
            pred_yx=uvN, curr_yx=yxN.astype(jnp.float32),
            search_radius=jnp.asarray(mc.search_radius),
            base_gate=mc.base_gate, min_dist_factor=mc.min_dist_factor,
            margin=mc.margin)
        return feed(m.dist)
    loop_time(d_match, f"matcher {N}x{N}")

    def d_pnp(s):
        r = pnp.solve_pnp_ransac(
            pts_w + s, uvN, validN, K, jnp.eye(4, dtype=jnp.float32),
            jax.random.PRNGKey(0), n_hypotheses=pc.n_hypotheses,
            sample_size=pc.sample_size, inlier_px=pc.inlier_px,
            gn_iters_hypothesis=pc.gn_iters_hypothesis,
            gn_iters_refine=pc.gn_iters_refine, huber_px=pc.huber_px)
        return feed(r.T_c_w)
    loop_time(d_pnp, "pnp full")

    # ---- BA schedule on a realistic-shape random window ----
    Kw, L = cfg.keyframe.window_size, cfg.ba.max_landmarks
    ptsL = jnp.asarray(np.stack(
        [rng.uniform(-20, 20, L), rng.uniform(-5, 5, L),
         rng.uniform(10, 60, L)], -1), jnp.float32)
    Ts = jnp.tile(jnp.eye(4, dtype=jnp.float32), (Kw, 1, 1))
    uvw = jnp.asarray(rng.uniform(0, 1000, (L, Kw, 2)), jnp.float32)
    ones_l = jnp.ones((L,), jnp.float32)
    run_schedule = ba_schedule.make_ba_schedule(cfg.ba)
    inp = ba_schedule.ScheduleInput(
        T_c_w=Ts, points=ptsL, uv=uvw,
        obs_mask=jnp.ones((L, Kw), jnp.float32), inlier=ones_l,
        reliable=ones_l, present=ones_l,
        pose_mask=jnp.ones((Kw,), jnp.float32),
        fixed_pose=jnp.zeros((Kw,), jnp.float32).at[0].set(1.0))

    def d_ba(s):
        res = run_schedule(inp._replace(points=ptsL + s), K)
        return feed(res.T_c_w) + feed(res.cost_full)
    loop_time(d_ba, "BA schedule (4 passes)", r=10)

    # ---- the real frame step, tracking-only path (garbage images keep
    #      is_kf false after the first frame) ----
    frame_step = slam_core.make_slam_step(cfg)
    carry0 = slam_core.init_carry(cfg)
    carry1, _ = jax.jit(frame_step)(
        carry0, jnp.stack([left, right]).astype(jnp.uint8),
        jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0))
    carry1 = jax.block_until_ready(carry1)

    img_u8 = jnp.stack([left, right]).astype(jnp.uint8)

    @jax.jit
    def step_loop(s):
        def body(i, c):
            c2, rec = frame_step(
                c, img_u8, i + 1, jax.random.fold_in(jax.random.PRNGKey(0), i))
            return c2
        c = jax.lax.fori_loop(0, R, body, carry1)
        return c.tstate.T_c_w

    out = jax.block_until_ready(step_loop(jnp.zeros(())))
    t0 = time.perf_counter()
    out = jax.block_until_ready(step_loop(jnp.ones(())))
    print(f"{'frame step (track-only path)':48s} "
          f"{(time.perf_counter()-t0)/R*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
