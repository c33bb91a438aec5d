"""Sub-stage timing of the fused frame step (chained dispatch).

CAVEAT: chained dispatches with jit-captured constants pay the ~26 ms
tunnel round trip PER CALL on the axon backend, so these numbers are
dominated by dispatch latency, not device time. Use tools/profile_device.py
(device-side fori_loop repetition, two loop lengths) for true device costs.

Times, via chained dispatch (tunnel-safe): frontend extract, matcher,
PnP (hypothesis fit / scoring / refine split), insert_keyframe-equivalent
scatters, and the BA schedule's phases (classify x2 / full / pose-only).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.ba import pose_only, schedule as ba_schedule, schur_lm
from stereo_visual_slam_tpu.models import frontend as frontend_mod
from stereo_visual_slam_tpu.models import vslam
from stereo_visual_slam_tpu.ops import matcher as matcher_ops
from stereo_visual_slam_tpu.tracking import pnp
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config


def chain_time(step, x0, fetch, n=10, label=""):
    x = step(x0)
    float(fetch(x))
    t = time.perf_counter()
    float(fetch(x0))
    rt = time.perf_counter() - t
    t = time.perf_counter()
    x = x0
    for _ in range(n):
        x = step(x)
    float(fetch(x))
    dt = (time.perf_counter() - t - rt) / n
    print(f"{label:40s} {dt*1e3:8.3f} ms")
    return dt


def main():
    enable_compilation_cache()
    cfg = Config()
    rng = np.random.default_rng(0)
    cam = cfg.camera
    K = jnp.asarray(
        [[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], jnp.float32
    )
    N = cfg.frontend.max_raw_keypoints
    H, W = cfg.padded_hw

    left = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)

    # ---- extract ----
    extract = jax.jit(frontend_mod.make_extractor(cfg))
    feats = extract(left, right)
    jax.block_until_ready(feats)
    @jax.jit
    def ext_step(x):
        f = extract(left + x, right)
        return jnp.sum(f.yx.astype(jnp.float32)) * 1e-20

    chain_time(ext_step, jnp.zeros(()), lambda x: x, n=10, label="extract")

    # ---- matcher ----
    signs_a = jnp.asarray(
        np.where(rng.integers(0, 2, (N, 256)), 1.0, -1.0), jnp.float32)
    signs_b = jnp.asarray(
        np.where(rng.integers(0, 2, (N, 256)), 1.0, -1.0), jnp.float32)
    valid = jnp.ones((N,), bool)
    yx = jnp.asarray(rng.integers(0, 370, (N, 2)), jnp.int32)
    pred = yx.astype(jnp.float32)

    @jax.jit
    def match_step(x):
        m = matcher_ops.match(
            signs_a + x, valid, signs_b, valid, jnp.asarray(1.0, jnp.float32),
            pred_yx=pred, curr_yx=yx,
            search_radius=cfg.matcher.search_radius,
            base_gate=cfg.matcher.base_gate,
            min_dist_factor=cfg.matcher.min_dist_factor,
            margin=cfg.matcher.margin)
        return jnp.sum(m.mask.astype(jnp.float32))
    chain_time(match_step, jnp.zeros(()), lambda x: x, n=10, label="matcher")

    # ---- pnp ----
    pts_w = jnp.asarray(np.stack(
        [rng.uniform(-20, 20, N), rng.uniform(-5, 5, N),
         rng.uniform(10, 60, N)], -1), jnp.float32)
    uv = jnp.asarray(rng.uniform(0, 1000, (N, 2)), jnp.float32)
    pc = cfg.pnp

    @jax.jit
    def pnp_step(x):
        r = pnp.solve_pnp_ransac(
            pts_w + x, uv, valid, K, jnp.eye(4, dtype=jnp.float32),
            jax.random.PRNGKey(0),
            n_hypotheses=pc.n_hypotheses, sample_size=pc.sample_size,
            inlier_px=pc.inlier_px,
            gn_iters_hypothesis=pc.gn_iters_hypothesis,
            gn_iters_refine=pc.gn_iters_refine, huber_px=pc.huber_px)
        return jnp.sum(r.T_c_w)
    chain_time(pnp_step, jnp.zeros(()), lambda x: x, n=10, label="pnp full")

    # ---- full track_step ----
    track_step, _ = vslam.make_tracker(cfg)
    prev = vslam.empty_state(cfg)._replace(
        valid=valid, lm_id=jnp.arange(N, dtype=jnp.int32),
        lm_pos=pts_w, signs=signs_a, yx=yx)

    @jax.jit
    def tstep(x):
        st, info = track_step(
            feats._replace(signs=feats.signs + x), prev,
            jnp.eye(4, dtype=jnp.float32), jnp.asarray(1.0, jnp.float32),
            jax.random.PRNGKey(0))
        return jnp.sum(st.T_c_w)
    chain_time(tstep, jnp.zeros(()), lambda x: x, n=10, label="track_step (match+pnp)")

    # ---- BA schedule phases ----
    Kw, L = cfg.keyframe.window_size, cfg.ba.max_landmarks
    pts = jnp.asarray(np.stack(
        [rng.uniform(-20, 20, L), rng.uniform(-5, 5, L),
         rng.uniform(10, 60, L)], -1), jnp.float32)
    Ts = jnp.tile(jnp.eye(4, dtype=jnp.float32), (Kw, 1, 1))
    uvw = jnp.asarray(rng.uniform(0, 1000, (L, Kw, 2)), jnp.float32)
    ones_l = jnp.ones((L,), jnp.float32)

    def mkprob(T):
        return schur_lm.BAProblem(
            T_c_w=T, points=pts, uv=uvw,
            obs_mask=jnp.ones((L, Kw), jnp.float32), point_mask=ones_l,
            pose_mask=jnp.ones((Kw,), jnp.float32),
            fixed_pose=jnp.zeros((Kw,), jnp.float32).at[0].set(1.0))

    bc = cfg.ba
    common = dict(
        huber_delta=bc.huber_delta, chi2_threshold=bc.chi2_threshold,
        adaptive_rounds=bc.adaptive_rounds,
        target_inlier_ratio=bc.target_inlier_ratio,
        lambda_init=bc.lm_lambda_init, lambda_up=bc.lm_lambda_up,
        lambda_down=bc.lm_lambda_down, rel_tol=bc.rel_tol,
        matmul_precision=bc.matmul_precision)

    chain_time(
        lambda T: schur_lm.lm_optimize(
            mkprob(T), K, iters=bc.classify_iters, **common).T_c_w,
        Ts, lambda T: jnp.sum(T), n=8, label=f"lm classify ({bc.classify_iters} it)")
    chain_time(
        lambda T: schur_lm.lm_optimize(
            mkprob(T), K, iters=bc.full_iters, **common).T_c_w,
        Ts, lambda T: jnp.sum(T), n=8, label=f"lm full ({bc.full_iters} it)")
    chain_time(
        lambda T: pose_only.optimize_pose_only(
            mkprob(T), K, iters=bc.pose_only_iters, **common).T_c_w,
        Ts, lambda T: jnp.sum(T), n=8, label=f"pose-only ({bc.pose_only_iters} it)")

    run_schedule = ba_schedule.make_ba_schedule(bc)
    inp = ba_schedule.ScheduleInput(
        T_c_w=Ts, points=pts, uv=uvw,
        obs_mask=jnp.ones((L, Kw), jnp.float32), inlier=ones_l,
        reliable=ones_l, present=ones_l,
        pose_mask=jnp.ones((Kw,), jnp.float32),
        fixed_pose=jnp.zeros((Kw,), jnp.float32).at[0].set(1.0))
    chain_time(
        lambda T: run_schedule(inp._replace(T_c_w=T), K).T_c_w,
        Ts, lambda T: jnp.sum(T), n=8, label="BA schedule (all 4 passes)")


if __name__ == "__main__":
    main()
