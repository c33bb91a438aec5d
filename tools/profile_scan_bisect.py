"""Bisect the scanned frame step: time scan variants with parts stripped."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.geom import se3
from stereo_visual_slam_tpu.models import frontend as frontend_mod
from stereo_visual_slam_tpu.models import slam_core
from stereo_visual_slam_tpu.models import vslam
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config


def timed(fn, carry, images, fids, key, label, reps=6):
    carry2, recs = fn(carry, images, fids, key)
    float(jnp.sum(recs))  # forced fetch: block_until_ready is a tunnel no-op
    t0 = time.perf_counter()
    c = carry
    for i in range(reps):
        c, recs = fn(c, images, fids + i * images.shape[0], key)
    jax.block_until_ready(recs)
    float(jnp.sum(recs))
    B = images.shape[0]
    dt = (time.perf_counter() - t0) / (reps * B)
    print(f"{label:44s} {dt*1e3:8.2f} ms/frame")


def main():
    enable_compilation_cache()
    cfg = Config()
    H, W = cfg.padded_hw
    B = 8
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (B, 2, H, W), dtype=np.uint8)
    images = jnp.asarray(img)
    fids = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)

    extract = frontend_mod.make_extractor(cfg)
    track_step, _ = vslam.make_tracker(cfg)
    carry0 = slam_core.init_carry(cfg)

    # A: extract only
    @jax.jit
    def scan_extract(carry, images, fids, key):
        def body(c, xs):
            image, fid = xs
            feats = extract(image[0].astype(jnp.float32),
                            image[1].astype(jnp.float32))
            return c, jnp.sum(feats.yx.astype(jnp.float32))
        return jax.lax.scan(body, carry, (images, fids))

    timed(scan_extract, jnp.zeros(()), images, fids, key, "scan: extract only")

    # B: extract + track
    @jax.jit
    def scan_track(carry, images, fids, key):
        def body(c, xs):
            image, fid = xs
            feats = extract(image[0].astype(jnp.float32),
                            image[1].astype(jnp.float32))
            feats = jax.lax.optimization_barrier(feats)
            T_init = se3.compose(c.T_c_l, c.T_c_w)
            k = jax.random.fold_in(key, fid)
            st, info = track_step(
                feats, c, T_init, jnp.asarray(1.0, jnp.float32), k)
            return st, info.twist_norm
        return jax.lax.scan(body, carry, (images, fids))

    timed(scan_track, vslam.empty_state(cfg), images, fids, key,
          "scan: extract + track")

    # C: full slam step
    chunk_step = slam_core.make_chunk_step(cfg)

    @jax.jit
    def scan_full(carry, images, fids, key):
        c, recs = chunk_step(carry, images, fids, jnp.ones(fids.shape, bool), key)
        return c, recs.twist

    timed(scan_full, carry0, images, fids, key, "scan: full slam step")


if __name__ == "__main__":
    main()
