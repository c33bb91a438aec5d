"""Pallas TPU kernel: fused FAST-9/16 corner score + 3x3 non-max suppression.

One pass over the image: each grid program DMAs a (TILE_H + 8, TILE_W + 8)
halo tile from HBM into VMEM, evaluates the 16-point Bresenham circle test,
the 9-contiguous arc score, and 3x3 NMS entirely in VMEM, and writes one
(TILE_H, TILE_W) score tile. HBM traffic is exactly one image read + one
score-map write — the XLA reference implementation (ops/fast.py) instead
materializes 16 shifted image copies plus two (25, H, W) stacks.

The numeric definition matches ops/fast.py bit-for-bit (same circle order,
same max-over-arcs min-over-arc score, same raster-order NMS tie-breaking),
which the tests assert; fast.py remains the ground truth and the CPU path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereo_visual_slam_tpu.ops.fast import CIRCLE_OFFSETS, nms_topk

_HALO = 4  # 3 px circle radius + 1 px NMS neighborhood


def _fast_nms_kernel(img_ref, out_ref, tile_ref, sem, *, th, tw, threshold, arc):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # Mosaic DMA slices must be lane-aligned (128); over-copy the halo tile
    # to an aligned width and ignore the extra columns.
    copy_w = tile_ref.shape[1]
    dma = pltpu.make_async_copy(
        img_ref.at[pl.ds(i * th, th + 2 * _HALO), pl.ds(j * tw, copy_w)],
        tile_ref,
        sem,
    )
    dma.start()
    dma.wait()

    # scores are needed on a (th+2, tw+2) region (+1 ring for NMS);
    # center pixels of that region live at tile offsets [3 .. 3+th+2)
    ch, cw = th + 2, tw + 2
    center = tile_ref[3 : 3 + ch, 3 : 3 + cw]

    diffs = [
        tile_ref[3 + dy : 3 + dy + ch, 3 + dx : 3 + dx + cw] - center
        for dy, dx in CIRCLE_OFFSETS
    ]

    # Arc min/max via doubling (min9_k = min over d_k..d_{k+8} circular):
    # 4 levels of pairwise min instead of 8 sequential mins per start —
    # bit-identical (f32 min/max are associative), ~1.9x fewer VPU ops than
    # the naive double loop (tools/micro_topk.py row I motivated this).
    # bright strength_k = min9_k(d) when all arc diffs exceed the threshold,
    # else 0 — and min9_k > threshold IS that condition, so one final
    # `where` replaces the 16 per-arc masked selects. Dark pass symmetric:
    # min9(-d) = -(max9(d)).
    assert arc == 9, "doubling network below is specific to FAST-9/16"

    def arc9(vals, op):
        m2 = [op(vals[i], vals[(i + 1) % 16]) for i in range(16)]
        m4 = [op(m2[i], m2[(i + 2) % 16]) for i in range(16)]
        m8 = [op(m4[i], m4[(i + 4) % 16]) for i in range(16)]
        return [op(m8[i], vals[(i + 8) % 16]) for i in range(16)]

    mins = arc9(diffs, jnp.minimum)
    maxs = arc9(diffs, jnp.maximum)
    best_bright = mins[0]
    worst_dark = maxs[0]
    for k in range(1, 16):
        best_bright = jnp.maximum(best_bright, mins[k])
        worst_dark = jnp.minimum(worst_dark, maxs[k])
    sb = jnp.where(best_bright > threshold, best_bright, 0.0)
    sd = jnp.where(-worst_dark > threshold, -worst_dark, 0.0)
    score = jnp.maximum(sb, sd)

    # 3x3 NMS with raster-order tie-breaking (later neighbors use >=)
    s = score[1 : 1 + th, 1 : 1 + tw]
    keep = jnp.ones_like(s, dtype=jnp.bool_)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh = score[1 + dy : 1 + dy + th, 1 + dx : 1 + dx + tw]
            later = (dy > 0) or (dy == 0 and dx > 0)
            keep = jnp.logical_and(keep, (s >= neigh) if later else (s > neigh))
    out_ref[:] = jnp.where(keep, s, 0.0)


@functools.partial(
    jax.jit, static_argnames=("threshold", "arc", "tile", "interpret")
)
def fast_nms_score_map(
    img: jnp.ndarray,
    *,
    threshold: float = 20.0,
    arc: int = 9,
    tile=(64, 256),
    interpret: bool = False,
) -> jnp.ndarray:
    """NMS'd FAST score map via the fused Pallas kernel. img: (H, W) f32
    with H, W divisible by the tile size."""
    H, W = img.shape
    th, tw = tile
    assert H % th == 0 and W % tw == 0, (H, W, tile)
    # lane-aligned over-copy width (>= tw + 2*HALO, multiple of 128)
    copy_w = -(-(tw + 2 * _HALO) // 128) * 128
    # pad: HALO on top/left; enough columns on the right that every tile's
    # aligned over-copy stays in bounds
    padded = jnp.pad(
        img, ((_HALO, _HALO), (_HALO, copy_w - tw - _HALO))
    )

    kernel = functools.partial(
        _fast_nms_kernel, th=th, tw=tw, threshold=threshold, arc=arc
    )
    return pl.pallas_call(
        kernel,
        grid=(H // th, W // tw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (th, tw), lambda i, j: (i, j), memory_space=pltpu.MemorySpace.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * _HALO, copy_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)


def detect(
    img: jnp.ndarray,
    *,
    max_kp: int,
    threshold: float = 20.0,
    border: int = 20,
    valid_hw=None,
    interpret: bool = False,
):
    """Drop-in replacement for ops.fast.detect using the fused kernel."""
    H, W = img.shape
    score = fast_nms_score_map(
        img, threshold=threshold, interpret=interpret
    )
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    vh, vw = valid_hw if valid_hw is not None else (H, W)
    in_border = (
        (yy >= border) & (yy < vh - border) & (xx >= border) & (xx < vw - border)
    )
    score = jnp.where(in_border, score, 0.0)
    top_scores, yx = nms_topk(score, max_kp)
    return yx, top_scores
