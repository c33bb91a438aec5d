"""XLA cost-model breakdown of the batched extractor, stage by stage.

Locates the HBM traffic inside batch_extract (the 25.7 GB/chunk of
BENCH_r04 — VERDICT r05 target: extraction 9.4 -> < 5 ms/frame). Compiles
partial programs (no execution needed) and prints FLOP + bytes for each:
pyramid resize, FAST+NMS score maps, top-k, blur, describe, ANMS, stereo.

Run on the TPU backend: cost numbers are layout/fusion-dependent.
"""

import functools

import jax
import jax.numpy as jnp

from stereo_visual_slam_tpu.models import frontend as frontend_mod
from stereo_visual_slam_tpu.ops import anms as anms_ops
from stereo_visual_slam_tpu.ops import fast as fast_ops
from stereo_visual_slam_tpu.ops import image as im_ops
from stereo_visual_slam_tpu.ops import orb as orb_ops
from stereo_visual_slam_tpu.ops import stereo as stereo_ops
from stereo_visual_slam_tpu.utils import roofline
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config

B = 8


def main():
    enable_compilation_cache()
    cfg = Config()
    fe = cfg.frontend
    cam = cfg.camera
    H, W = cfg.padded_hw
    vh, vw = cfg.image_hw
    levels = frontend_mod._level_geometry(cfg)
    N = fe.max_raw_keypoints
    S = jax.ShapeDtypeStruct
    f32, i32 = jnp.float32, jnp.int32

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

    left_sds = S((B, H, W), f32)

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

    pyr_sds = jax.eval_shape(stage_pyramid, left_sds)

    @jax.jit
    def stage_score(pyr):
        return [
            score_map(p.reshape(B * p.shape[1], p.shape[2]))
            for p in pyr
        ]

    score_sds = jax.eval_shape(stage_score, pyr_sds)

    @jax.jit
    def stage_topk(scores):
        out = []
        for i, (s, (h_i, w_i), (H_i, W_i), budget) in enumerate(levels):
            sc = scores[i].reshape(B, H_i, W_i)
            out.append(fast_ops.nms_topk(sc, budget))
        return out

    @jax.jit
    def stage_blur(pyr):
        return [im_ops.box_blur(p.reshape(-1, p.shape[-1]), fe.blur_box)
                for p in pyr]

    topk_sds = jax.eval_shape(stage_topk, score_sds)
    yx_sds = [S((B, lv[3], 2), i32) for lv in levels]

    use_pp = frontend_mod._use_pallas_patches(cfg)
    if use_pp:
        from stereo_visual_slam_tpu.ops.pallas import patch_kernel

    @jax.jit
    def stage_describe(pyr, yxs):
        outs = []
        for i, (s, (h_i, w_i), (H_i, W_i), budget) in enumerate(levels):
            bl = im_ops.box_blur(
                pyr[i].reshape(B * H_i, W_i), fe.blur_box
            )
            if use_pp:
                row_off = (jnp.arange(B, dtype=i32) * H_i)[:, None]
                yx_st = jnp.stack(
                    [yxs[i][..., 0] + row_off, yxs[i][..., 1]], -1
                ).reshape(B * budget, 2)
                patches = patch_kernel.gather_patches_aligned(
                    bl, yx_st, patch=fe.patch_size, frame_h=H_i
                )
                outs.append(orb_ops.describe_patches(
                    patches, bits=fe.descriptor_bits,
                    steer=fe.steer_descriptor,
                ))
            else:
                outs.append(jax.vmap(lambda im, yx: orb_ops.describe(
                    im, yx, bits=fe.descriptor_bits, patch=fe.patch_size,
                    steer=fe.steer_descriptor,
                ))(bl.reshape(B, H_i, W_i), yxs[i]))
        return outs

    @jax.jit
    def stage_anms(yx, score):
        return jax.vmap(
            lambda y, sc: anms_ops.anms_mask(
                y, sc, num=fe.n_features, robust_coeff=fe.anms_robust_coeff
            )
        )(yx, score)

    @jax.jit
    def stage_stereo(left, right, yx_st, valid):
        return stereo_ops.match_disparity(
            left.reshape(B * H, W), right.reshape(B * H, W), yx_st, valid,
            fx=cam.fx, baseline=cam.baseline,
            max_disparity=fe.max_disparity, patch=fe.stereo_patch,
            min_zncc=fe.min_zncc, min_depth=fe.min_depth,
            max_depth=fe.max_depth, reliable_depth=fe.reliable_depth,
            impl=frontend_mod._stereo_impl(cfg),
        )

    batch_extract = frontend_mod.make_batch_extractor(cfg)
    im_sds = S((B, 2, H, W), jnp.uint8)

    rows = [
        ("batch_extract TOTAL", roofline.cost_of(batch_extract, im_sds)),
        ("pyramid resize (7 levels)", roofline.cost_of(
            stage_pyramid, left_sds)),
        ("FAST+NMS score maps (8 levels)", roofline.cost_of(
            stage_score, pyr_sds)),
        ("pooled top-k (8 levels)", roofline.cost_of(stage_topk, score_sds)),
        ("box blur (8 levels)", roofline.cost_of(stage_blur, pyr_sds)),
        ("blur+describe (8 levels)", roofline.cost_of(
            stage_describe, pyr_sds, yx_sds)),
        ("ANMS", roofline.cost_of(
            stage_anms, S((B, N, 2), i32), S((B, N), f32))),
        ("stereo sweep", roofline.cost_of(
            stage_stereo, left_sds, left_sds, S((B * N, 2), i32),
            S((B * N,), jnp.bool_))),
    ]
    for label, cost in rows:
        print(f"{label}: {cost.flops/1e9:.2f} GFLOP, "
              f"{cost.bytes_accessed/1e9:.3f} GB", flush=True)


if __name__ == "__main__":
    main()
