"""Honest per-op timing of the frontend extractor's stages on TPU.

Each step keeps a real data dependency on the chained scalar (added to the
image) so XLA cannot dead-code-eliminate the op under test.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.ops import anms as anms_ops
from stereo_visual_slam_tpu.ops import fast as fast_ops
from stereo_visual_slam_tpu.ops import image as im_ops
from stereo_visual_slam_tpu.ops import orb as orb_ops
from stereo_visual_slam_tpu.ops import stereo as stereo_ops
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config


def chain_time(step, n=10, label=""):
    x = step(jnp.zeros(()))
    float(x)
    t0 = time.perf_counter()
    float(step(jnp.zeros(())))
    rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    x = jnp.zeros(())
    for _ in range(n):
        x = step(x * 1e-20)
    float(x)
    dt = (time.perf_counter() - t0 - rt) / n
    print(f"{label:36s} {dt*1e3:8.3f} ms")
    return dt


def main():
    enable_compilation_cache()
    cfg = Config()
    fe = cfg.frontend
    cam = cfg.camera
    H, W = cfg.padded_hw
    vh, vw = cfg.image_hw
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    N = fe.max_raw_keypoints

    @jax.jit
    def s_fast(x):
        yx, score = fast_ops.detect(
            left + x, max_kp=N, threshold=fe.fast_threshold,
            border=fe.border_margin, valid_hw=(vh, vw))
        return jnp.sum(score) + jnp.sum(yx)

    chain_time(s_fast, label="fast.detect")

    yx, score = fast_ops.detect(
        left, max_kp=N, threshold=fe.fast_threshold,
        border=fe.border_margin, valid_hw=(vh, vw))
    yx, score = jax.device_get((yx, score))
    yx = jnp.asarray(yx)
    score = jnp.asarray(score)
    valid = score > 0

    @jax.jit
    def s_anms(x):
        m = anms_ops.anms_mask(
            yx, score + x, num=fe.n_features,
            robust_coeff=fe.anms_robust_coeff)
        return jnp.sum(m.astype(jnp.float32))

    chain_time(s_anms, label="anms_mask")

    @jax.jit
    def s_blur(x):
        return jnp.sum(im_ops.box_blur(left + x, fe.blur_box))

    chain_time(s_blur, label="box_blur")

    @jax.jit
    def s_orb(x):
        blurred = im_ops.box_blur(left + x, fe.blur_box)
        packed, signs, _ = orb_ops.describe(
            blurred, yx, bits=fe.descriptor_bits, patch=fe.patch_size)
        return jnp.sum(signs)

    chain_time(s_orb, label="box_blur + orb.describe")

    @jax.jit
    def s_stereo(x):
        st = stereo_ops.match_disparity(
            left + x, right, yx, valid, fx=cam.fx, baseline=cam.baseline,
            max_disparity=fe.max_disparity, patch=fe.stereo_patch,
            min_zncc=fe.min_zncc, min_depth=fe.min_depth,
            max_depth=fe.max_depth, reliable_depth=fe.reliable_depth)
        return jnp.sum(st.depth)

    chain_time(s_stereo, label="stereo.match_disparity")


if __name__ == "__main__":
    main()
