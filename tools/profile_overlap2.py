"""Isolate upload-traffic interference: the clean trailing-fetch loop
(pattern B of profile_overlap.py) run (1) alone over pre-uploaded buffers
and (2) with a background thread streaming device_put traffic the whole
time. If (2) degrades, H2D transfers contend with execution/fetches on the
tunnel and the driver must schedule uploads away from the exec window."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.data import synthetic
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
    slam = ChunkedSlam(cfg, chunk=B)
    slam.warmup()
    step, pack, key = slam._packed_step, slam._pack, slam.key
    bufs = [jax.device_put(slam._upload_job(frames[c * B:(c + 1) * B]))
            for c in range(NCH)]
    jax.block_until_ready(bufs[-1])
    print("ready", flush=True)

    payload = np.zeros(8 * 2 * 384 * 1280 + 40, np.uint8)

    def run(with_uploads):
        stop = threading.Event()
        n_up = [0]

        def uploader():
            while not stop.is_set():
                jax.block_until_ready(jax.device_put(payload))
                n_up[0] += 1

        th = None
        if with_uploads:
            th = threading.Thread(target=uploader, daemon=True)
            th.start()
        carry = slam.carry
        t0 = time.perf_counter()
        pending = None
        for c in range(NCH):
            carry, recs = step(carry, bufs[c], key)
            packed = pack(recs)
            if pending is not None:
                np.asarray(jax.device_get(pending))
            pending = packed
        np.asarray(jax.device_get(pending))
        dt = time.perf_counter() - t0
        stop.set()
        if th:
            th.join()
        print(f"uploads={'on ' if with_uploads else 'off'}: {dt:.3f}s = "
              f"{dt/(NCH*B)*1e3:.2f} ms/frame "
              f"({n_up[0]} concurrent puts)", flush=True)

    for w in (False, True, False, True):
        run(w)

    # the PRODUCTION driver loop over the same frames, same process — if
    # this is slow while the patterns above are fast, the driver's own
    # choreography (not the tunnel, not uploads) is the gap
    for rep in range(3):
        drv = ChunkedSlam(cfg, chunk=B)
        t0 = time.perf_counter()
        for f, l, r in frames[: NCH * B]:
            drv.process(f, l, r)
        drv.finish()
        dt = time.perf_counter() - t0
        fet = np.asarray(drv.fetch_times) * 1e3
        print(f"driver rep{rep}: {dt:.3f}s = {dt/(NCH*B)*1e3:.2f} ms/frame | "
              f"fetch p50 {np.percentile(fet,50):.0f} "
              f"p90 {np.percentile(fet,90):.0f} ms", flush=True)

    # driver with the upload path BYPASSED (pre-uploaded buffers): isolates
    # the pool-thread assembly+device_put from the dispatch/harvest loop
    import concurrent.futures as _cf

    for rep in range(2):
        drv = ChunkedSlam(cfg, chunk=B)
        it = iter(bufs)

        def fake_submit(fn, *a, _it=it, **k):
            fut = _cf.Future()
            fut.set_result(next(_it))
            return fut

        drv._pool.submit = fake_submit
        t0 = time.perf_counter()
        for f, l, r in frames[: NCH * B]:
            drv.process(f, l, r)
        drv.finish()
        dt = time.perf_counter() - t0
        fet = np.asarray(drv.fetch_times) * 1e3
        print(f"driver-preup rep{rep}: {dt:.3f}s = "
              f"{dt/(NCH*B)*1e3:.2f} ms/frame | fetch p50 "
              f"{np.percentile(fet,50):.0f} p90 "
              f"{np.percentile(fet,90):.0f} ms", flush=True)
    slam.close()


if __name__ == "__main__":
    main()
