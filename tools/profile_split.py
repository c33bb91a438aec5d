"""Wall-clock phase SPLIT of the production pipeline on real data.

Three steady-state measurements with the chunked driver pattern (pre-
rendered frames, fetch-paced, best of 2 passes):
  1. full production program        -> total
  2. ba.enable_ba=False program     -> extract + tracking scan
  3. batch_extract + tiny reduction -> extraction alone
Differences give BA/keyframe and scan/frame. Each program compiles cold
once (persistent-cached for reruns of THIS script).

Usage: python tools/profile_split.py [n_chunks]
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.data import synthetic
from stereo_visual_slam_tpu.models import frontend as frontend_mod
from stereo_visual_slam_tpu.models import slam_core
from stereo_visual_slam_tpu.pipeline.chunked import ChunkedSlam
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config

B = 8


def run_chunked(cfg, frames, label):
    best = None
    for _ in range(2):
        slam = ChunkedSlam(cfg, chunk=B)
        slam.warmup()
        t0 = time.perf_counter()
        for f, l, r in frames:
            slam.process(f, l, r)
        slam.finish()
        dt = time.perf_counter() - t0
        n_kf = sum(1 for s in slam.stats if s["keyframe"])
        fetches = np.asarray(slam.fetch_times) * 1e3
        if best is None or dt < best[0]:
            best = (dt, n_kf, fetches)
    dt, n_kf, fetches = best
    n = len(frames)
    print(f"{label}: {n} frames ({n_kf} kf) in {dt:.2f}s "
          f"= {dt/n*1e3:.2f} ms/frame | fetch p50 "
          f"{np.percentile(fetches, 50):.1f} p90 "
          f"{np.percentile(fetches, 90):.1f} ms/chunk", flush=True)
    return dt / n * 1e3, n_kf / n


def main():
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    enable_compilation_cache()
    cfg = Config()
    n_frames = B * n_chunks
    world = synthetic.make_world(cfg, n_frames=n_frames, n_points=8000, seed=0)
    frames = [(f, l, r) for f, l, r in synthetic.frames(world)]
    print("rendered", flush=True)

    full_ms, kf_rate = run_chunked(cfg, frames, "full")
    cfg_noba = cfg.replace(ba=dataclasses.replace(cfg.ba, enable_ba=False))
    noba_ms, _ = run_chunked(cfg_noba, frames, "no-BA")
    print(f"-> BA: {(full_ms - noba_ms):.2f} ms/frame at {kf_rate:.0%} kf "
          f"mix = {(full_ms - noba_ms) / max(kf_rate, 1e-9):.1f} ms/keyframe",
          flush=True)

    # extraction alone: the production batch extractor + scalar reduction
    # (forces execution; fetch is one scalar) on the same stacked chunks
    H, W = cfg.padded_hw
    batch_extract = frontend_mod.make_batch_extractor(cfg)

    @jax.jit
    def extract_probe(images):
        f = batch_extract(images)
        return (jnp.sum(f.score) + jnp.sum(f.depth) + jnp.sum(f.packed)
                + jnp.sum(f.signs[:, :, 0]))

    chunks = []
    for ci in range(n_chunks):
        stacked = np.zeros((B, 2, H, W), np.uint8)
        for i, (fid, l, r) in enumerate(frames[ci * B:(ci + 1) * B]):
            h, w = l.shape
            stacked[i, 0, :h, :w] = l
            stacked[i, 1, :h, :w] = r
        chunks.append(jax.device_put(stacked))
    jax.block_until_ready(chunks[-1])
    float(extract_probe(chunks[0]))  # compile
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        acc = 0.0
        for c in chunks:
            acc += float(extract_probe(c))  # scalar fetch paces the loop
        best = min(best, time.perf_counter() - t0)
    ext_ms = best / n_frames * 1e3
    print(f"extract-only: {ext_ms:.2f} ms/frame (fetch-paced, best of 2)",
          flush=True)
    print(f"-> feats scan (tracking+map): {noba_ms - ext_ms:.2f} ms/frame",
          flush=True)


if __name__ == "__main__":
    main()
