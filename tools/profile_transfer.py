"""Measure tunnel upload bandwidth and device-only chunk-step time."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.models import slam_core
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config


def main():
    enable_compilation_cache()
    cfg = Config()
    H, W = cfg.padded_hw
    B = 8
    img = np.random.default_rng(0).integers(
        0, 255, (B, 2, H, W), dtype=np.uint8
    )

    # ---- upload bandwidth ----
    x = jnp.asarray(img)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    n = 8
    for i in range(n):
        img[0, 0, 0, 0] = i  # defeat any caching
        x = jnp.asarray(img)
        jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / n
    mb = img.nbytes / 1e6
    print(f"upload {mb:.1f} MB chunk: {dt*1e3:.2f} ms  "
          f"({mb/dt:.0f} MB/s, {dt/B*1e3:.2f} ms/frame)")

    # same but float32 (4x bigger) to separate latency from bandwidth
    imgf = img.astype(np.float32)
    xf = jnp.asarray(imgf)
    jax.block_until_ready(xf)
    t0 = time.perf_counter()
    for i in range(n):
        imgf[0, 0, 0, 0] = i
        xf = jnp.asarray(imgf)
        jax.block_until_ready(xf)
    dt = (time.perf_counter() - t0) / n
    mb = imgf.nbytes / 1e6
    print(f"upload {mb:.1f} MB chunk: {dt*1e3:.2f} ms  ({mb/dt:.0f} MB/s)")

    # ---- device-resident chunk step, chained ----
    chunk_step = slam_core.make_chunk_step(cfg)
    carry = slam_core.init_carry(cfg)
    images = jnp.asarray(img)
    fids = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    carry, recs = chunk_step(carry, images, fids, jnp.ones(fids.shape, bool), key)
    jax.block_until_ready(recs)
    t0 = time.perf_counter()
    reps = 6
    for i in range(reps):
        carry, recs = chunk_step(carry, images, fids + i * B, jnp.ones(fids.shape, bool), key)
    jax.block_until_ready(recs)
    float(jnp.sum(recs.twist))
    dt = (time.perf_counter() - t0) / (reps * B)
    print(f"chunk step, images resident: {dt*1e3:.2f} ms/frame")


if __name__ == "__main__":
    main()
