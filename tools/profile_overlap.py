"""Does a blocking device_get hold the axon tunnel channel and starve the
pipeline? Compare three single-threaded dispatch patterns over pre-uploaded
chunks (no upload traffic inside the timed loop):

  A. dispatch k; fetch k           (fetch blocks through k's execution)
  B. dispatch k; fetch k-1         (fetch of an already-finished chunk)
  C. dispatch all; fetch all       (max queue depth)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.data import synthetic
from stereo_visual_slam_tpu.models import slam_core
from stereo_visual_slam_tpu.pipeline.chunked import ChunkedSlam
from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache
from stereo_visual_slam_tpu.utils.config import Config

B = 8
NCH = 16


def main():
    enable_compilation_cache()
    cfg = Config()
    world = synthetic.make_world(cfg, n_frames=B * (NCH + 1), n_points=8000,
                                 seed=0)
    frames = [(f, l, r) for f, l, r in synthetic.frames(world)]
    print("rendered", flush=True)

    slam = ChunkedSlam(cfg, chunk=B)
    slam.warmup()
    step, pack, key = slam._packed_step, slam._pack, slam.key
    bufs = [jax.device_put(slam._upload_job(frames[c * B:(c + 1) * B]))
            for c in range(NCH + 1)]
    jax.block_until_ready(bufs[-1])
    print("uploaded", flush=True)

    def run(pattern):
        carry = slam.carry
        t0 = time.perf_counter()
        if pattern == "A":
            for c in range(NCH):
                carry, recs = step(carry, bufs[c], key)
                np.asarray(jax.device_get(pack(recs)))
        elif pattern == "B":
            pending = None
            for c in range(NCH):
                carry, recs = step(carry, bufs[c], key)
                packed = pack(recs)
                if pending is not None:
                    np.asarray(jax.device_get(pending))
                pending = packed
            np.asarray(jax.device_get(pending))
        else:
            outs = []
            for c in range(NCH):
                carry, recs = step(carry, bufs[c], key)
                outs.append(pack(recs))
            for p in outs:
                np.asarray(jax.device_get(p))
        return time.perf_counter() - t0

    for pattern in ("A", "B", "C", "A", "B", "C"):
        dt = run(pattern)
        print(f"pattern {pattern}: {dt:.3f}s = "
              f"{dt/(NCH*B)*1e3:.2f} ms/frame", flush=True)
    slam.close()


if __name__ == "__main__":
    main()
