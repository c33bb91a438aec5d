"""Per-phase DEVICE-TIME table of the PRODUCTION chunk program.

Method: every phase runs r and 3r iterations inside one jitted
lax.fori_loop with a data-dependent feedback scalar; the slope between the
two lengths is pure device time per iteration (cancels the axon tunnel's
per-dispatch cost; single-dispatch `block_until_ready` timings lie — see
.claude/skills/verify/SKILL.md).

Phases, at the production config (384x1280 pad, N=2048, 8 levels, L=4096,
Kw=10) and chunk B=8:
  1. batch_extract       — the hoisted B-frame front-end program
  2. feats scan          — tracking+map scan over precomputed features
                           (BA branch not taken: fresh map, window empty)
  3. chunk_step          — 1 + 2 composed (the dispatched program)
  4. BA schedule         — the full 4-pass keyframe schedule at L=4096
  5. extractor sub-stages (batched): pyramid, detect+topk, blur,
     describe, anms, stereo

Prints a table; bench.py's wall number minus (3) is host overhead, and
(4) x keyframe-rate is the BA amortization.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.ba import schedule as ba_schedule
from stereo_visual_slam_tpu.data import synthetic
from stereo_visual_slam_tpu.models import frontend as frontend_mod
from stereo_visual_slam_tpu.models import slam_core
from stereo_visual_slam_tpu.ops import anms as anms_ops
from stereo_visual_slam_tpu.ops import image as im_ops
from stereo_visual_slam_tpu.ops import orb as orb_ops
from stereo_visual_slam_tpu.ops import stereo as stereo_ops
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config

B = 8


def loop_time(body, label, r=6, per_frame=B):
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
    per = f"  ({dt / per_frame * 1e3:6.2f} ms/frame)" if per_frame else ""
    print(f"{label:36s} {dt*1e3:9.2f} ms{per}", flush=True)
    return dt


def feed(*xs):
    return sum(jnp.tanh(jnp.sum(x.astype(jnp.float32))) * 1e-20 for x in xs)


def main():
    enable_compilation_cache()
    cfg = Config()
    fe = cfg.frontend
    cam = cfg.camera
    H, W = cfg.padded_hw
    world = synthetic.make_world(cfg, n_frames=B, n_points=8000, seed=0)
    stacked = np.zeros((B, 2, H, W), np.uint8)
    for i, (f, l, r_) in enumerate(synthetic.frames(world)):
        h, w = l.shape
        stacked[i, 0, :h, :w] = l
        stacked[i, 1, :h, :w] = r_
    images = jax.device_put(jnp.asarray(stacked))
    fids = jnp.arange(B, dtype=jnp.int32)
    act = jnp.ones((B,), bool)
    key = jax.random.PRNGKey(0)

    batch_extract = frontend_mod.make_batch_extractor(cfg)
    chunk_step = slam_core.make_chunk_step(cfg)
    feats_step = slam_core.make_feats_step(cfg)

    feats0 = jax.block_until_ready(batch_extract(images))
    carry0 = slam_core.init_carry(cfg)

    # ---------------- composed production programs ----------------
    def p_chunk(s):
        # thread the loop carry into the DATA (one pixel), so the body is
        # genuinely iteration-dependent and XLA cannot hoist it out of the
        # fori_loop (a `* 0` perturbation folds away)
        imgs = images.at[0, 0, 0, 0].add(s.astype(jnp.uint8))
        c, recs = chunk_step(carry0, imgs, fids, act, key)
        return feed(c.tstate.T_c_w, recs.twist)

    loop_time(p_chunk, f"chunk_step B={B} (no-BA window)")

    def p_extract(s):
        f = batch_extract(images.at[0, 0, 0, 0].add(s.astype(jnp.uint8)))
        return feed(f.signs, f.depth) + s * 1e-30

    loop_time(p_extract, f"batch_extract B={B}")

    def p_scan(s):
        def body(c, xs):
            feat, fid = xs
            c2, rec = feats_step(c, feat, fid, jax.random.fold_in(key, fid))
            return c2, rec.twist

        c, tw = jax.lax.scan(
            body,
            carry0._replace(
                last_frame_id=carry0.last_frame_id + (s < -1).astype(jnp.int32)
            ),
            (feats0, fids),
        )
        return feed(c.tstate.T_c_w, tw)

    loop_time(p_scan, f"feats scan B={B} (no-BA window)")

    # ---------------- BA schedule at production shapes ----------------
    Kw, L = cfg.keyframe.window_size, cfg.ba.max_landmarks
    rng = np.random.default_rng(0)
    K = jnp.asarray(
        [[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], jnp.float32
    )
    ptsL = jnp.asarray(np.stack(
        [rng.uniform(-20, 20, L), rng.uniform(-5, 5, L),
         rng.uniform(10, 60, L)], -1), jnp.float32)
    run_schedule = ba_schedule.make_ba_schedule(cfg.ba)
    inp = ba_schedule.ScheduleInput(
        T_c_w=jnp.tile(jnp.eye(4, dtype=jnp.float32), (Kw, 1, 1)),
        points=ptsL,
        uv=jnp.asarray(rng.uniform(0, 1000, (L, Kw, 2)), jnp.float32),
        obs_mask=jnp.ones((L, Kw), jnp.float32),
        inlier=jnp.ones((L,), jnp.float32),
        reliable=jnp.ones((L,), jnp.float32),
        present=jnp.ones((L,), jnp.float32),
        pose_mask=jnp.ones((Kw,), jnp.float32),
        fixed_pose=jnp.zeros((Kw,), jnp.float32).at[0].set(1.0))

    def p_ba(s):
        res = run_schedule(inp._replace(points=ptsL + s), K)
        return feed(res.T_c_w, res.cost_full)

    loop_time(p_ba, "BA schedule (per keyframe)", per_frame=None)

    # ---------------- extractor sub-stages (batched) ----------------
    left = images[:, 0].astype(jnp.float32)
    levels = frontend_mod._level_geometry(cfg)
    vh, vw = cfg.image_hw
    from stereo_visual_slam_tpu.ops.pallas import fast_kernel

    score_map = functools.partial(
        fast_kernel.fast_nms_score_map, threshold=fe.fast_threshold
    ) if frontend_mod._use_pallas_fast(cfg) else None

    def pyramid(left):
        outs = [left]
        for i, (s, (h_i, w_i), (H_i, W_i), budget) in enumerate(levels):
            if i == 0:
                continue
            outs.append(jax.vmap(
                lambda im: im_ops.pad_to(
                    jax.image.resize(im[:vh, :vw], (h_i, w_i),
                                     method="linear"), (H_i, W_i))
            )(left))
        return outs

    pyr0 = jax.block_until_ready(jax.jit(pyramid)(left))

    def p_pyr(s):
        return feed(*pyramid(left + s))

    loop_time(p_pyr, "  pyramid resize (7 levels)")

    from stereo_visual_slam_tpu.ops import fast as fast_ops

    def p_detect(s):
        # the production path: Pallas score map -> pooled/pruned nms_topk
        out = []
        for i, (sc, (h_i, w_i), (H_i, W_i), budget) in enumerate(levels):
            st = (pyr0[i] + s).reshape(B * H_i, W_i)
            smap = score_map(st).reshape(B, H_i, W_i)
            ts, yx = fast_ops.nms_topk(smap, budget)
            out.append(feed(ts, yx.astype(jnp.float32)))
        return sum(out)

    loop_time(p_detect, "  detect: score maps + nms_topk")

    def p_blur(s):
        return sum(
            feed(im_ops.box_blur((pyr0[i] + s).reshape(-1, pyr0[i].shape[-1]),
                                 fe.blur_box))
            for i in range(len(levels)))

    loop_time(p_blur, "  box blur (8 levels)")

    yxs = []
    for i, (s, (h_i, w_i), (H_i, W_i), budget) in enumerate(levels):
        yxs.append(jnp.asarray(
            np.stack([rng.integers(24, h_i - 24, (B, budget)),
                      rng.integers(24, w_i - 24, (B, budget))], -1),
            jnp.int32))

    def p_desc(s):
        outs = []
        for i, (sc, (h_i, w_i), (H_i, W_i), budget) in enumerate(levels):
            p, sg, th = jax.vmap(
                lambda im, yx: orb_ops.describe(
                    im, yx, bits=fe.descriptor_bits, patch=fe.patch_size,
                    steer=fe.steer_descriptor)
            )(pyr0[i] + s, yxs[i])
            outs.append(feed(sg))
        return sum(outs)

    loop_time(p_desc, "  describe (8 levels)")

    N = fe.max_raw_keypoints
    yxN = jnp.asarray(np.stack([rng.integers(24, 350, (B, N)),
                                rng.integers(24, 1200, (B, N))], -1),
                      jnp.int32)
    scN = jnp.asarray(rng.uniform(0, 50, (B, N)), jnp.float32)

    def p_anms(s):
        return feed(jax.vmap(
            lambda y, sc: anms_ops.anms_mask(
                y, sc, num=fe.n_features,
                robust_coeff=fe.anms_robust_coeff)
        )(yxN, scN + s))

    loop_time(p_anms, "  anms")

    right = images[:, 1].astype(jnp.float32)
    row_off = (jnp.arange(B, dtype=jnp.int32) * H)[:, None]
    yx_st = jnp.stack(
        [yxN[..., 0] + row_off, yxN[..., 1]], axis=-1).reshape(B * N, 2)

    def p_stereo(s):
        st = stereo_ops.match_disparity(
            left.reshape(B * H, W) + s, right.reshape(B * H, W),
            yx_st, jnp.ones((B * N,), bool),
            fx=cam.fx, baseline=cam.baseline,
            max_disparity=fe.max_disparity, patch=fe.stereo_patch,
            min_zncc=fe.min_zncc, min_depth=fe.min_depth,
            max_depth=fe.max_depth, reliable_depth=fe.reliable_depth,
            impl=frontend_mod._stereo_impl(cfg))
        return feed(st.depth, st.score)

    loop_time(p_stereo, "  stereo zncc sweep")


if __name__ == "__main__":
    main()
