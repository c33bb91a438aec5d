"""Oriented rBRIEF: intensity-centroid orientation + steered 256-bit BRIEF.

Replaces the `detector_->detect` / `descriptor_->compute` calls of the
reference (visual_odometry.cpp:80,85). Design:

  * one patch gather per keypoint (N x 37 x 37) from the box-blurred image,
  * orientation = atan2(m01, m10) of the circular intensity centroid
    (radius 15, same as OpenCV ORB),
  * descriptor = 256 comparisons of pattern point pairs rotated by the patch
    orientation, sampled with nearest-neighbor from the patch,
  * output both as packed uint32 words (8 per keypoint, for storage) and as
    +-1 float "sign descriptors" so Hamming distance becomes one MXU matmul:
    for 256-bit a, b:  hamming(a, b) = (256 - dot(sign_a, sign_b)) / 2.

The test pattern is a fixed-seed Gaussian pair set clipped to radius 15
(classic BRIEF construction — NOT OpenCV's learned table, which we must not
copy); determinism is guaranteed by the hard-coded seed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stereo_visual_slam_tpu.ops import image as im_ops

_PATTERN_SEED = 20240817
_PATTERN_RADIUS = 15.0


@functools.lru_cache()
def brief_pattern(bits: int = 256) -> np.ndarray:
    """(bits, 2, 2) float32: for each bit, two (y, x) offsets from center."""
    rng = np.random.default_rng(_PATTERN_SEED)
    pts = rng.normal(0.0, 31.0 / 5.0, size=(bits, 2, 2))
    r = np.linalg.norm(pts, axis=-1, keepdims=True)
    scale = np.minimum(1.0, _PATTERN_RADIUS / np.maximum(r, 1e-6))
    return (pts * scale).astype(np.float32)


@functools.lru_cache()
def _centroid_weights(patch: int, radius: int):
    """Circular-mask y/x moment weight maps for the intensity centroid.
    Cached as NUMPY (never cache jnp arrays from inside a trace)."""
    r = patch // 2
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    mask = (ys * ys + xs * xs) <= radius * radius
    return (
        (ys * mask).astype(np.float32),
        (xs * mask).astype(np.float32),
    )


def orientations(patches: jnp.ndarray, radius: int = 15) -> jnp.ndarray:
    """Intensity-centroid angle per patch. patches: (N, P, P) -> (N,) rad."""
    P = patches.shape[-1]
    wy_np, wx_np = _centroid_weights(P, radius)
    wy, wx = jnp.asarray(wy_np), jnp.asarray(wx_np)
    m01 = jnp.einsum("npq,pq->n", patches, wy)
    m10 = jnp.einsum("npq,pq->n", patches, wx)
    return jnp.arctan2(m01, m10)


_N_ANGLE_BINS = 30  # 12-degree orientation quantization (same as OpenCV ORB)


def _sample_pairs(patches: jnp.ndarray, theta: jnp.ndarray, bits: int):
    """Rotate the pattern by theta (quantized to 12-degree bins, which makes
    the descriptor exactly reproducible under small orientation jitter) and
    sample both points of each pair with bilinear interpolation.
    Returns (vals_a, vals_b): (N, bits) each."""
    N, P, _ = patches.shape
    r = P // 2
    pat = jnp.asarray(brief_pattern(bits))          # (bits, 2, 2) (y, x)
    tq = (
        jnp.round(theta * (_N_ANGLE_BINS / (2.0 * jnp.pi)))
        * (2.0 * jnp.pi / _N_ANGLE_BINS)
    )
    c, s = jnp.cos(tq), jnp.sin(tq)                 # (N,)
    # rotation of (y, x) offsets by theta: x' = c x - s y ; y' = s x + c y
    py, px = pat[..., 0], pat[..., 1]               # (bits, 2)
    ry = s[:, None, None] * px + c[:, None, None] * py   # (N, bits, 2)
    rx = c[:, None, None] * px - s[:, None, None] * py
    fy = jnp.clip(ry + r, 0.0, P - 1.001)
    fx = jnp.clip(rx + r, 0.0, P - 1.001)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    wy = fy - y0
    wx = fx - x0
    flat = patches.reshape(N, P * P)

    def take(iy, ix):
        idx = (iy * P + ix).reshape(N, -1, 1)
        return jnp.take_along_axis(flat[:, :, None], idx, axis=1).reshape(
            N, bits, 2
        )

    vals = (
        take(y0, x0) * (1 - wy) * (1 - wx)
        + take(y0, x0 + 1) * (1 - wy) * wx
        + take(y0 + 1, x0) * wy * (1 - wx)
        + take(y0 + 1, x0 + 1) * wy * wx
    )
    return vals[..., 0], vals[..., 1]


def pack_bits(bits_bool: jnp.ndarray) -> jnp.ndarray:
    """(N, bits) bool -> (N, bits//32) uint32."""
    N, B = bits_bool.shape
    w = bits_bool.reshape(N, B // 32, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(w << shifts[None, None, :], axis=-1)


@functools.partial(jax.jit, static_argnames=("bits", "patch"))
def describe(
    img_blurred: jnp.ndarray,
    yx: jnp.ndarray,
    *,
    bits: int = 256,
    patch: int = 37,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute oriented BRIEF descriptors at integer keypoints.

    Returns:
      packed: (N, bits // 32) uint32 descriptor words,
      signs:  (N, bits) float32 in {-1, +1} for MXU Hamming matching,
      theta:  (N,) orientations.
    """
    patches = im_ops.gather_patches(img_blurred, yx, patch)
    theta = orientations(patches)
    a, b = _sample_pairs(patches, theta, bits)
    bit = a < b
    return pack_bits(bit), jnp.where(bit, 1.0, -1.0).astype(jnp.float32), theta


def hamming_from_signs(signs_a: jnp.ndarray, signs_b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs Hamming distance via one matmul on the MXU.

    signs in {-1,+1}: dot = bits - 2*hamming  =>  hamming = (bits - dot)/2.
    """
    bits = signs_a.shape[-1]
    dot = jnp.dot(signs_a, signs_b.T, preferred_element_type=jnp.float32)
    return (bits - dot) * 0.5
