"""Per-level cost breakdown of the pyramid extractor on real hardware.

Times (chained dispatch, tunnel-safe):
  * the full extractor at n_levels = 1, 2, 4, 8
  * each sub-stage (resize, detect, blur, describe, stereo) per level
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.models import frontend as frontend_mod
from stereo_visual_slam_tpu.ops import fast as fast_ops
from stereo_visual_slam_tpu.ops import image as im_ops
from stereo_visual_slam_tpu.ops import orb as orb_ops
from stereo_visual_slam_tpu.ops import stereo as stereo_ops
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config


def chain_time(step, x0, n=10, label=""):
    x = step(x0)
    jax.block_until_ready(x)
    t = time.perf_counter()
    jax.block_until_ready(step(x0))
    rt = time.perf_counter() - t
    t = time.perf_counter()
    x = x0
    for _ in range(n):
        x = step(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t - 0 * rt) / n
    print(f"{label:46s} {dt*1e3:8.3f} ms")
    return dt


def main():
    enable_compilation_cache()
    cfg = Config()
    rng = np.random.default_rng(0)
    H, W = cfg.padded_hw
    left = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)

    for n_levels in (1, 2, 4, 8):
        c = cfg.replace(
            frontend=dataclasses.replace(cfg.frontend, n_levels=n_levels)
        )
        extract = frontend_mod.make_extractor(c)

        @jax.jit
        def ext_step(x, extract=extract):
            f = extract(left + x, right)
            return jnp.tanh(jnp.sum(f.signs) + jnp.sum(f.depth)) * 1e-12

        chain_time(ext_step, jnp.zeros(()), n=10,
                   label=f"extract n_levels={n_levels}")

    # ---- per-stage at full config ----
    levels = frontend_mod._level_geometry(cfg)
    fe = cfg.frontend
    from stereo_visual_slam_tpu.ops.pallas import fast_kernel

    for i, (s, (h_i, w_i), (H_i, W_i), budget) in enumerate(levels):
        if i == 0:
            img = left
        else:
            img = jax.image.resize(
                left[: cfg.image_hw[0], : cfg.image_hw[1]], (h_i, w_i),
                method="linear")
            img = im_ops.pad_to(img, (H_i, W_i))
        img = jax.block_until_ready(img)

        if i > 0:
            @jax.jit
            def resize_step(x, hw=(h_i, w_i), HW=(H_i, W_i)):
                im = jax.image.resize(
                    (left + x)[: cfg.image_hw[0], : cfg.image_hw[1]], hw,
                    method="linear")
                return jnp.tanh(jnp.sum(im_ops.pad_to(im, HW))) * 1e-12
            chain_time(resize_step, jnp.zeros(()), n=10,
                       label=f"  L{i} resize {h_i}x{w_i}")

        @jax.jit
        def detect_step(x, img=img, budget=budget, hw=(h_i, w_i)):
            yx, sc = fast_kernel.detect(
                img + x, max_kp=budget, threshold=fe.fast_threshold,
                border=fe.border_margin, valid_hw=hw)
            return jnp.tanh(jnp.sum(sc) + jnp.sum(yx)) * 1e-12
        chain_time(detect_step, jnp.zeros(()), n=10,
                   label=f"  L{i} detect(pallas) {H_i}x{W_i} k={budget}")

        @jax.jit
        def blur_step(x, img=img):
            return jnp.tanh(jnp.sum(im_ops.box_blur(img + x, fe.blur_box))) * 1e-12
        chain_time(blur_step, jnp.zeros(()), n=10, label=f"  L{i} blur")

        yx = jnp.asarray(
            rng.integers(20, min(h_i, w_i) - 20, (budget, 2)), jnp.int32)

        @jax.jit
        def desc_step(x, img=img, yx=yx):
            p, sgn, th = orb_ops.describe(
                img + x, yx, bits=fe.descriptor_bits, patch=fe.patch_size,
                steer=fe.steer_descriptor)
            return jnp.tanh(jnp.sum(sgn) + jnp.sum(th)) * 1e-12
        chain_time(desc_step, jnp.zeros(()), n=10,
                   label=f"  L{i} describe k={budget}")

    # stereo on merged table
    N = fe.max_raw_keypoints
    yx = jnp.asarray(rng.integers(20, 350, (N, 2)), jnp.int32)
    valid = jnp.ones((N,), bool)

    @jax.jit
    def stereo_step(x):
        st = stereo_ops.match_disparity(
            left + x, right, yx, valid, fx=cfg.camera.fx,
            baseline=cfg.camera.baseline, max_disparity=fe.max_disparity,
            patch=fe.stereo_patch, min_zncc=fe.min_zncc,
            min_depth=fe.min_depth, max_depth=fe.max_depth,
            reliable_depth=fe.reliable_depth)
        return jnp.tanh(jnp.sum(st.depth)) * 1e-12
    chain_time(stereo_step, jnp.zeros(()), n=10, label=f"stereo N={N}")


if __name__ == "__main__":
    main()
