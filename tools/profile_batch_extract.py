"""Component-level device timing of the batched extractor (B=chunk frames).

Times partial programs of make_batch_extractor's stages on live frames:
detection (score maps + top_k), blur, describe (patch gather + BRIEF
matmul), ANMS, stereo sweep — each as its own jit so the split is visible.
Serialized dispatches, min of reps; the tunnel dispatch floor (~0.1 ms for
array->array programs) is noise at these scales.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.data import synthetic
from stereo_visual_slam_tpu.models import frontend as frontend_mod
from stereo_visual_slam_tpu.ops import anms as anms_ops
from stereo_visual_slam_tpu.ops import fast as fast_ops
from stereo_visual_slam_tpu.ops import image as im_ops
from stereo_visual_slam_tpu.ops import orb as orb_ops
from stereo_visual_slam_tpu.ops import stereo as stereo_ops
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config


def timed(fn, *args, reps=5):
    fn(*args)  # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    enable_compilation_cache()
    cfg = Config()
    fe = cfg.frontend
    H, W = cfg.padded_hw
    vh, vw = cfg.image_hw
    B = 8
    world = synthetic.make_world(cfg, n_frames=B, n_points=8000, seed=0)
    frames = [(f, l, r) for f, l, r in synthetic.frames(world)]
    stacked = np.zeros((B, 2, H, W), np.uint8)
    for i, (f, l, r) in enumerate(frames):
        h, w = l.shape
        stacked[i, 0, :h, :w] = l
        stacked[i, 1, :h, :w] = r
    images = jax.device_put(stacked)
    levels = frontend_mod._level_geometry(cfg)
    use_pallas = frontend_mod._use_pallas_fast(cfg)
    if use_pallas:
        from stereo_visual_slam_tpu.ops.pallas import fast_kernel

        score_map = functools.partial(
            fast_kernel.fast_nms_score_map, threshold=fe.fast_threshold
        )
    else:
        def score_map(img):
            return fast_ops.nms_3x3(
                fast_ops.fast_score_map(img, fe.fast_threshold)
            )

    left = jnp.asarray(images[:, 0], jnp.float32)

    # ---- per-stage jits ------------------------------------------------
    @jax.jit
    def stage_pyramid(left):
        outs = []
        for i, (s, (h_i, w_i), (H_i, W_i), budget) in enumerate(levels):
            if i == 0:
                outs.append(left)
            else:
                outs.append(jax.vmap(
                    lambda im: im_ops.pad_to(
                        jax.image.resize(im[:vh, :vw], (h_i, w_i),
                                         method="linear"),
                        (H_i, W_i),
                    )
                )(left))
        return outs

    pyr = jax.block_until_ready(stage_pyramid(left))

    @jax.jit
    def stage_detect(pyr):
        out = []
        for i, (s, (h_i, w_i), (H_i, W_i), budget) in enumerate(levels):
            imgs = pyr[i]
            stacked = imgs.reshape(B * H_i, W_i)
            score = score_map(stacked).reshape(B, H_i, W_i)
            top_scores, top_idx = jax.lax.top_k(
                score.reshape(B, H_i * W_i), budget
            )
            out.append((top_scores, top_idx))
        return out

    det = jax.block_until_ready(stage_detect(pyr))

    @jax.jit
    def stage_blur(pyr):
        return [
            im_ops.box_blur(p.reshape(-1, p.shape[-1]), fe.blur_box)
            for p in pyr
        ]

    blurred = jax.block_until_ready(stage_blur(pyr))

    yxs = []
    for i, (s, (h_i, w_i), (H_i, W_i), budget) in enumerate(levels):
        _, top_idx = det[i]
        yxs.append(jnp.stack([top_idx // W_i, top_idx % W_i], -1)
                   .astype(jnp.int32))

    @jax.jit
    def stage_describe(blurred, yxs):
        outs = []
        for i, (s, (h_i, w_i), (H_i, W_i), budget) in enumerate(levels):
            bl = blurred[i].reshape(B, H_i, W_i)
            outs.append(jax.vmap(
                lambda im, yx: orb_ops.describe(
                    im, yx, bits=fe.descriptor_bits, patch=fe.patch_size,
                    steer=fe.steer_descriptor,
                )
            )(bl, yxs[i]))
        return outs

    @jax.jit
    def stage_describe_l0(blurred, yxs):
        bl = blurred[0].reshape(B, levels[0][2][0], levels[0][2][1])
        return jax.vmap(
            lambda im, yx: orb_ops.describe(
                im, yx, bits=fe.descriptor_bits, patch=fe.patch_size,
                steer=fe.steer_descriptor,
            )
        )(bl, yxs[0])

    yx_all = jnp.concatenate(
        [(yxs[i].astype(jnp.float32) * levels[i][0]).astype(jnp.int32)
         for i in range(len(levels))], axis=1)
    score_all = jnp.concatenate([det[i][0] for i in range(len(levels))],
                                axis=1)

    @jax.jit
    def stage_anms(yx_all, score_all):
        return jax.vmap(
            lambda y, sc: anms_ops.anms_mask(
                y, sc, num=fe.n_features, robust_coeff=fe.anms_robust_coeff
            )
        )(yx_all, score_all)

    cam = cfg.camera

    @jax.jit
    def stage_stereo(images, yx_all):
        left = images[:, 0].astype(jnp.float32)
        right = images[:, 1].astype(jnp.float32)
        valid = jnp.ones(yx_all.shape[:2], bool)
        H0, W0 = left.shape[1], left.shape[2]
        N = yx_all.shape[1]
        row_off = (jnp.arange(B, dtype=jnp.int32) * H0)[:, None]
        yx_st = jnp.stack(
            [yx_all[..., 0] + row_off, yx_all[..., 1]], axis=-1
        ).reshape(B * N, 2)
        return stereo_ops.match_disparity(
            left.reshape(B * H0, W0), right.reshape(B * H0, W0),
            yx_st, valid.reshape(B * N),
            fx=cam.fx, baseline=cam.baseline,
            max_disparity=fe.max_disparity, patch=fe.stereo_patch,
            min_zncc=fe.min_zncc, min_depth=fe.min_depth,
            max_depth=fe.max_depth, reliable_depth=fe.reliable_depth,
            impl=frontend_mod._stereo_impl(cfg),
        )

    batch_extract = frontend_mod.make_batch_extractor(cfg)

    stages = [
        ("full batch_extract", lambda: batch_extract(images)),
        ("pyramid resize", lambda: stage_pyramid(left)),
        ("detect (score+topk)", lambda: stage_detect(pyr)),
        ("box blur", lambda: stage_blur(pyr)),
        ("describe all levels", lambda: stage_describe(blurred, yxs)),
        ("describe level0 only", lambda: stage_describe_l0(blurred, yxs)),
        ("anms", lambda: stage_anms(yx_all, score_all)),
        ("stereo sweep", lambda: stage_stereo(images, yx_all)),
    ]
    for name, fn in stages:
        t = timed(lambda: fn())
        print(f"{name:24s}: {t*1e3:8.2f} ms ({t/B*1e3:6.2f} ms/frame)",
              flush=True)


if __name__ == "__main__":
    main()
