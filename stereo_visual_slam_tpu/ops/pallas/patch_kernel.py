"""Pallas TPU kernel: per-keypoint patch gather for BRIEF description.

The XLA path (ops/image.gather_patches) turns patch extraction into two
one-hot matmuls; correct and MXU-friendly, but the intermediate `rows`
tensor (N, P, W) is ~75 MB per full-res frame of HBM write+read — the
descriptor stage's real cost is that traffic (docs/PERF.md: the pipeline is
bandwidth-bound). This kernel instead DMAs, per keypoint, one (40, 256)
tile from HBM into VMEM and emits the patch rows lane-aligned — ~40 KB of
traffic per keypoint (~15 MB/frame at N=2048 across pyramid levels),
zero gathers, zero materialized row tensors.

Output layout: (N, 40, 128) f32 with the patch's top-left at [n, 0, 0]
(rows/lanes beyond `patch` are garbage); the wrapper slices to (N, P, P),
which XLA lowers to a cheap relayout. Patch values are the image values in
exact f32 (the one-hot path rounds them through bf16); descriptors are
nonetheless BIT-IDENTICAL between the two paths, because the BRIEF matmul
(orb.describe_patches) casts patches to bf16 — bf16(bf16(x)) == bf16(x).
For bf16-exact inputs (uint8-range integers) the raw patches agree
bit-for-bit too, which the interpret-mode tests assert.

Coordinate contract matches gather_patches: patch top-left is
clip(yx - P//2, 0, HW - P); out-of-range centers clamp to the border.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 8            # keypoints per grid program
TILE_H = 40      # rows DMA'd per keypoint (8-aligned start + patch <= 33)
TILE_W = 256     # lanes DMA'd per keypoint (128-aligned start, ox <= 223)
OUT_H = TILE_H - 7  # output rows: row-shift select leaves 33
OUT_W = 128      # output lanes (>= patch)


def _kernel(row0_ref, col0_ref, oy_ref, ox_ref, img_ref, out_ref,
            tile, sem):
    gi = pl.program_id(0)

    def dma(j):
        k = gi * G + j
        r0 = pl.multiple_of(row0_ref[k], 8)
        c0 = pl.multiple_of(col0_ref[k], 128)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(r0, TILE_H), pl.ds(c0, TILE_W)],
            tile.at[j],
            sem.at[j],
        )

    for j in range(G):
        dma(j).start()
    for j in range(G):
        k = gi * G + j
        dma(j).wait()
        # bring the patch's top-left corner to (0, 0); only the first
        # `patch` rows/lanes of the output are meaningful.
        # rows: oy is in [0, 7] (8-aligned DMA start), so select among the
        # 8 static row shifts (dynamic sublane rotates don't lower well);
        # lanes: dynamic roll, as in the stereo kernel. ox <= TILE_W - patch
        # so the roll never wraps the patch region.
        oy = oy_ref[k]
        shifted = tile[j, 0:TILE_H - 7, :] * (oy == 0).astype(jnp.float32)
        for o in range(1, 8):
            shifted += tile[j, o:TILE_H - 7 + o, :] * (
                oy == o
            ).astype(jnp.float32)
        shifted = pltpu.roll(shifted, shift=(TILE_W - ox_ref[k]) % TILE_W,
                             axis=1)
        out_ref[j] = shifted[:, :OUT_W]


def _align(v, q):
    return (v // q) * q


@functools.partial(jax.jit, static_argnames=("patch", "frame_h", "interpret"))
def gather_patches_aligned(
    img: jnp.ndarray,
    yx: jnp.ndarray,
    *,
    patch: int = 33,
    frame_h: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Patches at integer keypoints via per-keypoint DMA.

    img: (H, W) f32, H % 8 == 0, W % 128 == 0, W >= 256.
    yx: (N, 2) int32; N is padded to a multiple of G internally.
    frame_h: when `img` is B frames stacked vertically (batch extraction),
    the per-frame height — border clamping then happens within each frame,
    so patches never straddle a frame seam and results equal the per-frame
    gather exactly.
    Returns (N, patch, patch) f32 — bit-identical to
    ops/image.gather_patches(img, yx, patch) (per frame when frame_h set).
    """
    P = patch
    r = P // 2
    H, W = img.shape
    assert P <= 33, P
    assert H % 8 == 0 and W % 128 == 0 and W >= 256, (H, W)
    N = yx.shape[0]
    Ng = -(-N // G) * G
    if Ng != N:
        yx = jnp.concatenate(
            [yx, jnp.zeros((Ng - N, 2), yx.dtype)], axis=0
        )

    if frame_h is None:
        y0 = jnp.clip(yx[:, 0] - r, 0, H - P)
    else:
        assert H % frame_h == 0 and frame_h >= P, (H, frame_h, P)
        b = yx[:, 0] // frame_h
        y_local = yx[:, 0] - b * frame_h
        y0 = jnp.clip(y_local - r, 0, frame_h - P) + b * frame_h
    x0 = jnp.clip(yx[:, 1] - r, 0, W - P)
    row0 = jnp.minimum(_align(y0, 8), H - TILE_H)
    col0 = jnp.minimum(_align(x0, 128), W - TILE_W)
    scalars = [
        v.astype(jnp.int32) for v in (row0, col0, y0 - row0, x0 - col0)
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Ng // G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (G, OUT_H, OUT_W), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.MemorySpace.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((G, TILE_H, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((G,)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Ng, OUT_H, OUT_W), jnp.float32),
        interpret=interpret,
    )(*scalars, img.astype(jnp.float32))
    return out[:N, :P, :P]
