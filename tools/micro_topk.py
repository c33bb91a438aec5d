"""Micro-benchmark: top-k strategies for the pooled NMS score map.

Times each candidate with the two-length-fori method at the level-0
production shape (B=8 frames, pooled M=30720, k=533). Decides the
implementation of ops/fast._pruned_topk (VERDICT r05: detect+top_k is the
extraction bottleneck).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.utils.cache import enable_compilation_cache

R, M, K = 8, (384 // 2) * (1280 // 2), 536
C = 1280
NB = 64


def loop_time(body, label, r=8):
    runs = {}
    for n in (r, 3 * r):

        @jax.jit
        def run(s, n=n):
            return jax.lax.fori_loop(0, n, lambda i, c: body(c), s)

        jax.block_until_ready(run(jnp.zeros(())))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.ones(())))
            best = min(best, time.perf_counter() - t0)
        runs[n] = best
    dt = (runs[3 * r] - runs[r]) / (2 * r)
    print(f"{label:44s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def feed(*xs):
    return sum(jnp.tanh(jnp.sum(x.astype(jnp.float32))) * 1e-20 for x in xs)


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    x_np = np.zeros((R, M), np.float32)
    for r_ in range(R):
        idx = rng.choice(M, 900, replace=False)
        x_np[r_, idx] = rng.uniform(1, 200, 900)
    x = jnp.asarray(x_np)

    def p_full(s):
        ts, ti = jax.lax.top_k(x + s * 1e-30, K)
        return feed(ts, ti)

    loop_time(p_full, f"A lax.top_k M={M} k={K}")

    def p_hist(s):
        flat = x + s * 1e-30
        xmax = jnp.max(flat, axis=-1, keepdims=True)
        scale = NB / jnp.maximum(xmax, 1e-20)
        bins = jnp.clip((flat * scale).astype(jnp.int32), 0, NB)
        counts = jnp.sum(
            bins[:, :, None] == jnp.arange(NB + 1)[None, None, :], axis=1
        )
        return feed(counts)

    loop_time(p_hist, "B histogram (compare-reduce, nb=64)")

    def p_cumsum(s):
        mask = (x + s * 1e-30) > 1.0
        cs = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
        return feed(cs[:, -1])

    loop_time(p_cumsum, "C mask + cumsum")

    def p_scatter(s):
        flat = x + s * 1e-30
        mask = flat > 1.0
        rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1
        pos = jnp.where(mask, rank, C)
        rows = jnp.arange(R)[:, None]
        buf = jnp.zeros((R, C + 1), flat.dtype).at[rows, pos].set(
            flat, mode="drop")[:, :C]
        return feed(buf)

    loop_time(p_scatter, "D compact via scatter")

    def p_searchsorted(s):
        flat = x + s * 1e-30
        mask = flat > 1.0
        cs = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
        tgt = jnp.arange(1, C + 1)
        pos = jax.vmap(lambda c: jnp.searchsorted(c, tgt))(cs)
        posc = jnp.minimum(pos, M - 1)
        buf = jnp.take_along_axis(flat, posc, axis=-1)
        live = pos < M
        return feed(jnp.where(live, buf, 0.0))

    loop_time(p_searchsorted, "E compact via searchsorted+gather")

    def p_small_topk(s):
        buf = x[:, :C] + s * 1e-30
        ts, ti = jax.lax.top_k(buf, K)
        return feed(ts, ti)

    loop_time(p_small_topk, f"F lax.top_k C={C} k={K}")

    def p_approx(s):
        ts, ti = jax.lax.approx_max_k(x + s * 1e-30, K)
        return feed(ts, ti)

    loop_time(p_approx, "G approx_max_k (recall .95)")

    def p_sort(s):
        return feed(jnp.sort(x + s * 1e-30, axis=-1)[:, -K:])

    loop_time(p_sort, "H full sort (reference)")

    # ---- where does `detect` actually spend its time? ----
    from stereo_visual_slam_tpu.ops import fast as fast_ops
    from stereo_visual_slam_tpu.ops.pallas import fast_kernel

    H, W = 384, 1280
    img = jnp.asarray(rng.uniform(0, 255, (8 * H, W)).astype(np.float32))

    def p_scoremap(s):
        return feed(fast_kernel.fast_nms_score_map(img + s, threshold=20.0))

    loop_time(p_scoremap, "I pallas score map (3072x1280 stacked)")

    smap = jnp.asarray(
        (x_np.reshape(8, 192, 640).repeat(2, 1).repeat(2, 2)).astype(
            np.float32))

    def p_nms_topk(s):
        ts, yx = fast_ops.nms_topk(smap + s * 1e-30, K)
        return feed(ts, yx)

    loop_time(p_nms_topk, "J nms_topk current (8,384,1280)")

    # ---- all 8 pyramid levels, separated: score maps vs nms_topk ----
    from stereo_visual_slam_tpu.models import frontend as frontend_mod
    from stereo_visual_slam_tpu.utils.config import Config

    cfg = Config()
    levels = frontend_mod._level_geometry(cfg)
    pyr = [
        jnp.asarray(rng.uniform(0, 255, (8 * Hl, Wl)).astype(np.float32))
        for (_, _, (Hl, Wl), _) in levels
    ]

    def p_score_all(s):
        return sum(
            feed(fast_kernel.fast_nms_score_map(p + s, threshold=20.0))
            for p in pyr
        )

    loop_time(p_score_all, "L score maps, ALL 8 levels")

    smaps = [
        jnp.asarray((rng.random((8, Hl, Wl)) < 0.01).astype(np.float32)
                    * rng.uniform(1, 200, (8, Hl, Wl)).astype(np.float32))
        for (_, _, (Hl, Wl), _) in levels
    ]

    def p_topk_all(s):
        out = []
        for i, (_, _, _, budget) in enumerate(levels):
            ts, yx = fast_ops.nms_topk(smaps[i] + s * 1e-30, budget)
            out.append(feed(ts, yx.astype(jnp.float32)))
        return sum(out)

    loop_time(p_topk_all, "M nms_topk, ALL 8 levels (prod budgets)")

    def p_detect_all(s):
        out = []
        for i, (_, _, (Hl, Wl), budget) in enumerate(levels):
            smap = fast_kernel.fast_nms_score_map(
                (pyr[i] + s), threshold=20.0
            ).reshape(8, Hl, Wl)
            ts, yx = fast_ops.nms_topk(smap, budget)
            out.append(feed(ts, yx.astype(jnp.float32)))
        return sum(out)

    loop_time(p_detect_all, "N score+topk composed, ALL 8 levels")

    def p_detect_all_barrier(s):
        out = []
        for i, (_, _, (Hl, Wl), budget) in enumerate(levels):
            smap = fast_kernel.fast_nms_score_map(
                (pyr[i] + s), threshold=20.0
            ).reshape(8, Hl, Wl)
            smap = jax.lax.optimization_barrier(smap)
            ts, yx = fast_ops.nms_topk(smap, budget)
            out.append(feed(ts, yx.astype(jnp.float32)))
        return sum(out)

    loop_time(p_detect_all_barrier, "O composed + barrier, ALL 8 levels")

    def p_detect_l0(s):
        smap = fast_kernel.fast_nms_score_map(
            pyr[0] + s, threshold=20.0
        ).reshape(8, levels[0][2][0], levels[0][2][1])
        ts, yx = fast_ops.nms_topk(smap, levels[0][3])
        return feed(ts, yx.astype(jnp.float32))

    loop_time(p_detect_l0, "P composed, L0 only")

    def topk_rw(score, k):
        """nms_topk variant: reduce_window pooling + gather-based off."""
        B_, H_, W_ = score.shape
        pooled = jax.lax.reduce_window(
            score, -jnp.inf, jax.lax.max, (1, 2, 2), (1, 2, 2), "VALID"
        )
        W2 = W_ // 2
        ts, ti = jax.lax.top_k(pooled.reshape(B_, -1), k)
        y2 = ti // W2
        x2 = ti % W2
        base = (2 * y2) * W_ + 2 * x2
        sflat = score.reshape(B_, H_ * W_)
        ga = jnp.take_along_axis(sflat, base, axis=-1)
        gb = jnp.take_along_axis(sflat, base + 1, axis=-1)
        gc = jnp.take_along_axis(sflat, base + W_, axis=-1)
        sel = jnp.where(ga == ts, 0,
                        jnp.where(gb == ts, 1, jnp.where(gc == ts, 2, 3)))
        y = 2 * y2 + sel // 2
        x = 2 * x2 + (sel & 1)
        return ts, jnp.stack([y, x], axis=-1)

    def p_detect_rw(s):
        out = []
        for i, (_, _, (Hl, Wl), budget) in enumerate(levels):
            smap = fast_kernel.fast_nms_score_map(
                (pyr[i] + s), threshold=20.0
            ).reshape(8, Hl, Wl)
            ts, yx = topk_rw(smap, budget)
            out.append(feed(ts, yx.astype(jnp.float32)))
        return sum(out)

    loop_time(p_detect_rw, "Q composed reduce_window+gather-off, 8 lv")

    def p_topk_rw_alone(s):
        out = []
        for i, (_, _, _, budget) in enumerate(levels):
            ts, yx = topk_rw(smaps[i] + s * 1e-30, budget)
            out.append(feed(ts, yx.astype(jnp.float32)))
        return sum(out)

    loop_time(p_topk_rw_alone, "R rw-topk alone, ALL 8 levels")

    def p_detect_flat(s):
        # no pooling at all: top_k over the raw (B, H*W) view of the
        # pallas output — isolates whether the strided 2x2 pooled reads of
        # the kernel's output buffer are the composition pathology
        out = []
        for i, (_, _, (Hl, Wl), budget) in enumerate(levels):
            smap = fast_kernel.fast_nms_score_map(
                (pyr[i] + s), threshold=20.0
            ).reshape(8, Hl * Wl)
            ts, ti = jax.lax.top_k(smap, budget)
            out.append(feed(ts, ti.astype(jnp.float32)))
        return sum(out)

    loop_time(p_detect_flat, "S composed full-map top_k (no pool), 8 lv")

    def p_pool_topk(s):
        sc = smap + s * 1e-30
        s4 = sc.reshape(8, H // 2, 2, W // 2, 2)
        a = s4[..., 0, :, 0]; b = s4[..., 0, :, 1]
        c_ = s4[..., 1, :, 0]; d = s4[..., 1, :, 1]
        pooled = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c_, d))
        off = jnp.where(a == pooled, 0,
                        jnp.where(b == pooled, 1,
                                  jnp.where(c_ == pooled, 2, 3))
                        ).astype(jnp.int32)
        ts, ti = jax.lax.top_k(pooled.reshape(8, -1), K)
        sel = jnp.take_along_axis(off.reshape(8, -1), ti, axis=-1)
        return feed(ts, sel)

    loop_time(p_pool_topk, "K pool+off+top_k (old nms_topk body)")


if __name__ == "__main__":
    main()
