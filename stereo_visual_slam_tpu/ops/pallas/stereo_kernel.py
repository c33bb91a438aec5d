"""Pallas TPU kernel: per-keypoint epipolar ZNCC sweep.

The XLA formulation of keypoint stereo (ops/stereo.py) spends ~4 ms/frame in
vmapped dynamic-slice gathers materializing (N, p, D+p) strips plus an
(N, D, p, p) window tensor in HBM (measured, tools/profile_hotspots.py).
This kernel fuses the whole sweep: each grid program DMAs, for a group of
G=8 keypoints, one (24, 256) left tile and one (24, 256) right tile from HBM
into VMEM and computes all D ZNCC scores in-register — ~48 KB of HBM traffic
per keypoint instead of ~500 KB of materialized windows, and zero gathers.

Math (identical to ops/stereo.py, which remains the ground truth and the CPU
path): for the zero-mean unit-norm left patch P_n (p x p at (y, x)) and the
right-image window W_c starting at padded column c,

    zncc(c) = sum(P_n * W_c) / ||W_c - mean(W_c)||

(P_n zero-mean makes the cross term window-mean-free). Everything is
vectorized along the 256-lane tile axis:

    acc     = sum_q roll(B, -q) * P_n[:, q]      p shifted FMAs, B = right rows
    corr(c) = sum_p acc(p, c)
    S1, S2  = p-wide box sums of column sums / sums of squares (shifted adds)
    zncc(c) = corr(c) / sqrt(S2 - S1^2 / p^2)

The kernel emits, per keypoint, 128 zncc lanes starting at window column
x+1 (padded right-image coords); lane t holds disparity d = D - 1 - t. The
wrapper flips to the (N, D) layout and ops/stereo.py runs the shared
argmax / sub-pixel / depth-gate logic.

Replaces the reference's dense SGBM + per-keypoint sampling
(visual_odometry.cpp:159-174, types_def.cpp:9-18) on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 8            # keypoints per grid program
TILE_H = 24      # rows per keypoint tile (p=11 needed from an 8-aligned start)
TILE_W = 256     # lanes per keypoint tile (128-aligned start)
OUT_W = 128      # zncc lanes emitted per keypoint


def _kernel(row0_ref, lcol_ref, rcol_ref, oy_ref, olx_ref, rc_ref,
            left_ref, right_ref, out_ref,
            ltile, rtile, lsem, rsem, *, patch):
    p = patch
    gi = pl.program_id(0)

    def dmas(j):
        k = gi * G + j
        r0 = pl.multiple_of(row0_ref[k], 8)
        c_l = pl.multiple_of(lcol_ref[k], 128)
        c_r = pl.multiple_of(rcol_ref[k], 128)
        ldma = pltpu.make_async_copy(
            left_ref.at[pl.ds(r0, TILE_H), pl.ds(c_l, TILE_W)],
            ltile.at[j],
            lsem.at[j],
        )
        rdma = pltpu.make_async_copy(
            right_ref.at[pl.ds(r0, TILE_H), pl.ds(c_r, TILE_W)],
            rtile.at[j],
            rsem.at[j],
        )
        return ldma, rdma

    for j in range(G):
        ldma, rdma = dmas(j)
        ldma.start()
        rdma.start()

    eps = 1e-6
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)

    for j in range(G):
        k = gi * G + j
        oy = oy_ref[k]       # patch top row inside the tile (0..13)
        olx = olx_ref[k]     # patch start lane inside the left tile
        rc = rc_ref[k]       # zncc output start lane (right tile coords)
        ldma, rdma = dmas(j)
        ldma.wait()
        rdma.wait()

        prow = ((row >= oy) & (row < oy + p)).astype(jnp.float32)
        # --- left patch: mask, zero-mean, unit-norm, patch lanes -> lane 0 ---
        pmask = prow * ((lane >= olx) & (lane < olx + p)).astype(jnp.float32)
        lp = ltile[j] * pmask
        lsum = jnp.sum(lp)
        lpm = (lp - lsum * (1.0 / (p * p))) * pmask
        inv_l = jax.lax.rsqrt(jnp.sum(lpm * lpm) + eps)
        lpn = pltpu.roll(lpm * inv_l, shift=(TILE_W - olx) % TILE_W, axis=1)

        band = rtile[j] * prow   # right rows of the patch band

        # --- corr(c) = sum_pq lpn[p, q] * band[p, c + q] + window moments ---
        acc = band * lpn[:, 0][:, None]
        cs = jnp.sum(band, axis=0, keepdims=True)           # (1, W) col sums
        cs2 = jnp.sum(band * band, axis=0, keepdims=True)   # (1, W)
        S1 = cs
        S2 = cs2
        for q in range(1, p):
            acc = acc + pltpu.roll(band, shift=TILE_W - q, axis=1) * lpn[:, q][:, None]
            S1 = S1 + pltpu.roll(cs, shift=TILE_W - q, axis=1)
            S2 = S2 + pltpu.roll(cs2, shift=TILE_W - q, axis=1)
        corr = jnp.sum(acc, axis=0, keepdims=True)          # (1, W)

        var = S2 - S1 * S1 * (1.0 / (p * p))
        zncc = corr * jax.lax.rsqrt(jnp.maximum(var, eps))  # (1, W)

        out_ref[j, :] = pltpu.roll(zncc, shift=(TILE_W - rc) % TILE_W, axis=1)[0, :OUT_W]


def _align(v, q):
    return (v // q) * q


@functools.partial(
    jax.jit, static_argnames=("patch", "max_disparity", "interpret")
)
def zncc_sweep(
    left: jnp.ndarray,
    right: jnp.ndarray,
    yx: jnp.ndarray,
    *,
    patch: int = 11,
    max_disparity: int = 96,
    interpret: bool = False,
) -> jnp.ndarray:
    """All-disparity ZNCC scores for N keypoints via the fused kernel.

    left/right: (H, W) f32 working images (the wrapper pads internally).
    yx: (N, 2) int32 keypoint coords, N divisible by G.
    Returns (N, D) f32: zncc[n, d] for the window centered at (y, x - d) in
    the right image. Entries whose window leaves the image are garbage here;
    the caller masks them (same contract as the XLA path's border handling).
    """
    p = patch
    r = p // 2
    D = max_disparity
    assert D <= OUT_W, (D, OUT_W)
    # corr/S1/S2 use circular rolls over the 256-lane tile: the worst-case
    # read column is rc (<= 127) + D + p - 2 and must not wrap. Likewise
    # TILE_H fits the patch band only while oy (<= 13) + p <= TILE_H.
    assert 128 + D + p - 2 <= TILE_W, (D, p, TILE_W)
    assert p <= TILE_H - 13, (p, TILE_H)
    H, W = left.shape
    N = yx.shape[0]
    assert N % G == 0, (N, G)

    # Both images on one padded canvas: right shifted D+r (so window-start
    # columns x+1..x+D are always in range), left shifted r, zero elsewhere.
    Hp = -(-(H + 2 * r) // 8) * 8
    Wp = max(
        -(-(W + 2 * r) // 128) * 128,
        -(-(W + D + 2 * r) // 128) * 128,
        _align(W, 128) + TILE_W,
    )
    left_p = jax.lax.dynamic_update_slice(
        jnp.zeros((Hp, Wp), jnp.float32), left.astype(jnp.float32), (r, r)
    )
    right_p = jax.lax.dynamic_update_slice(
        jnp.zeros((Hp, Wp), jnp.float32), right.astype(jnp.float32), (r, D + r)
    )

    y = jnp.clip(yx[:, 0], 0, H - 1)
    x = jnp.clip(yx[:, 1], 0, W - 1)

    row0 = jnp.minimum(_align(y, 8), Hp - TILE_H)     # patch top row = y
    lcol0 = jnp.minimum(_align(x, 128), Wp - TILE_W)  # left patch col = x
    rcol0 = jnp.minimum(_align(x + 1, 128), Wp - TILE_W)
    scalars = [
        row0, lcol0, rcol0, y - row0, x - lcol0, x + 1 - rcol0
    ]
    scalars = [v.astype(jnp.int32) for v in scalars]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (G, OUT_W), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((G, TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((G, TILE_H, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((G,)),
            pltpu.SemaphoreType.DMA((G,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, patch=p),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, OUT_W), jnp.float32),
        interpret=interpret,
    )(*scalars, left_p, right_p)

    # lane t = window start x+1+t = disparity D - 1 - t
    return out[:, D - 1 :: -1]
