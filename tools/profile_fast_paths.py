"""Compare FAST detection paths on TPU: XLA score map vs Pallas kernel,
and exact lax.top_k vs hierarchical / approx_max_k selection."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.ops import fast as fast_ops
from stereo_visual_slam_tpu.ops.pallas import fast_kernel
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
    print(f"{label:44s} {dt*1e3:8.3f} ms")
    return dt


def main():
    enable_compilation_cache()
    cfg = Config()
    fe = cfg.frontend
    H, W = cfg.padded_hw
    vh, vw = cfg.image_hw
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    N = fe.max_raw_keypoints

    @jax.jit
    def s_scoremap_xla(x):
        s = fast_ops.nms_3x3(fast_ops.fast_score_map(left + x, fe.fast_threshold))
        return jnp.sum(s)

    chain_time(s_scoremap_xla, label="XLA score map + nms (no top_k)")

    @jax.jit
    def s_scoremap_pallas(x):
        s = fast_kernel.fast_nms_score_map(left + x, threshold=fe.fast_threshold)
        return jnp.sum(s)

    chain_time(s_scoremap_pallas, label="Pallas score map + nms (no top_k)")

    @jax.jit
    def s_topk(x):
        flat = (left + x).reshape(-1)
        v, i = jax.lax.top_k(flat, N)
        return jnp.sum(v) + jnp.sum(i)

    chain_time(s_topk, label=f"lax.top_k k={N} over {H*W}")

    @jax.jit
    def s_approx(x):
        flat = (left + x).reshape(-1)
        v, i = jax.lax.approx_max_k(flat, N, recall_target=0.95)
        return jnp.sum(v) + jnp.sum(i)

    chain_time(s_approx, label=f"approx_max_k k={N}")

    # hierarchical: per-row top_k then global top_k over candidates
    R = H  # 384 rows of 1280
    k_row = 16

    @jax.jit
    def s_hier(x):
        img = left + x
        v, i = jax.lax.top_k(img, k_row)           # (H, k_row) per row
        flat_v = v.reshape(-1)
        flat_i = (i + jnp.arange(H)[:, None] * W).reshape(-1)
        v2, i2 = jax.lax.top_k(flat_v, N)
        return jnp.sum(v2) + jnp.sum(flat_i[i2])

    chain_time(s_hier, label=f"hierarchical top_k (row {k_row} -> {N})")

    @jax.jit
    def s_full_pallas_hier(x):
        s = fast_kernel.fast_nms_score_map(left + x, threshold=fe.fast_threshold)
        v, i = jax.lax.top_k(s, k_row)
        flat_v = v.reshape(-1)
        flat_i = (i + jnp.arange(H)[:, None] * W).reshape(-1)
        v2, i2 = jax.lax.top_k(flat_v, N)
        return jnp.sum(v2) + jnp.sum(flat_i[i2])

    chain_time(s_full_pallas_hier, label="pallas score + hier top_k (full detect)")


if __name__ == "__main__":
    main()
