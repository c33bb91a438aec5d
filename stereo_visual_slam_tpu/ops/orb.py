"""Oriented rBRIEF: intensity-centroid orientation + steered 256-bit BRIEF.

Replaces the `detector_->detect` / `descriptor_->compute` calls of the
reference (visual_odometry.cpp:80,85).

TPU-native design — everything after the patch extraction is MATMUL:

  * patches (N, 33, 33) come from two one-hot matmuls (ops/image.py),
  * orientation = atan2 of two moment dot-products (patch . weight maps),
  * the orientation is quantized to 30 bins of 12 degrees (as OpenCV ORB
    does); for EACH bin the rotated, bilinearly-weighted sampling of all
    256 point pairs is baked into a constant matrix column of +w at the "b"
    taps and -w at the "a" taps, so

        diffs(N, 30 * 256) = patches(N, 33*33) @ M(33*33, 30 * 256)

    computes every bit of every candidate orientation in ONE MXU matmul
    (~5 GMAC at N=3000 — microseconds); a one-hot bin select then picks each
    keypoint's row. descriptor bit = diff > 0  (i.e. I_a < I_b).

  * output both as packed uint32 words and as +-1 float "sign descriptors"
    so Hamming distance becomes one MXU matmul:
    hamming(a, b) = (256 - dot(sign_a, sign_b)) / 2.

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
_PATTERN_SIGMA = 6.6  # classic BRIEF spread (patch/5): measured 1.5x better
                      # true-match rank-0 rate than concentrated sigma=4
_N_ANGLE_BINS = 30    # 12-degree orientation quantization (OpenCV ORB)
DEFAULT_PATCH = 33    # pattern radius 15 + bilinear margin fits half=16


@functools.lru_cache()
def brief_pattern(bits: int = 256) -> np.ndarray:
    """(bits, 2, 2) float32: for each bit, two (y, x) offsets from center."""
    rng = np.random.default_rng(_PATTERN_SEED)
    pts = rng.normal(0.0, _PATTERN_SIGMA, size=(bits, 2, 2))
    r = np.linalg.norm(pts, axis=-1, keepdims=True)
    scale = np.minimum(1.0, _PATTERN_RADIUS / np.maximum(r, 1e-6))
    return (pts * scale).astype(np.float32)


@functools.lru_cache()
def _centroid_weights(patch: int, radius: int):
    """Circular-mask y/x moment weight maps, flattened (patch^2, 2) numpy."""
    r = patch // 2
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    mask = (ys * ys + xs * xs) <= radius * radius
    wy = (ys * mask).astype(np.float32).reshape(-1)
    wx = (xs * mask).astype(np.float32).reshape(-1)
    return np.stack([wy, wx], axis=-1)  # (P^2, 2)


@functools.lru_cache()
def _steering_matrix(bits: int, patch: int) -> np.ndarray:
    """(patch^2, n_bins * bits) float32 constant.

    Column [r * bits + b] holds +bilinear weights at pattern point B of bit b
    rotated by bin angle r, and -bilinear weights at point A — so the matmul
    against a flattened patch yields I_b - I_a for every (bin, bit)."""
    P = patch
    r0 = P // 2
    pat = brief_pattern(bits)  # (bits, 2, 2) (y, x)
    M = np.zeros((P * P, _N_ANGLE_BINS * bits), np.float32)
    for rbin in range(_N_ANGLE_BINS):
        th = 2.0 * np.pi * rbin / _N_ANGLE_BINS
        c, s = np.cos(th), np.sin(th)
        for b in range(bits):
            for which, sign in ((0, -1.0), (1, +1.0)):  # A gets -, B gets +
                py, px = pat[b, which]
                ry = s * px + c * py
                rx = c * px - s * py
                fy = np.clip(ry + r0, 0.0, P - 1.001)
                fx = np.clip(rx + r0, 0.0, P - 1.001)
                y0, x0 = int(np.floor(fy)), int(np.floor(fx))
                wy, wx = fy - y0, fx - x0
                col = rbin * bits + b
                M[y0 * P + x0, col] += sign * (1 - wy) * (1 - wx)
                M[y0 * P + x0 + 1, col] += sign * (1 - wy) * wx
                M[(y0 + 1) * P + x0, col] += sign * wy * (1 - wx)
                M[(y0 + 1) * P + x0 + 1, col] += sign * wy * wx
    return M


def orientations(patches: jnp.ndarray, radius: int = 15) -> jnp.ndarray:
    """Intensity-centroid angle per patch. patches: (N, P, P) -> (N,) rad."""
    P = patches.shape[-1]
    Wm = jnp.asarray(_centroid_weights(P, radius))     # (P^2, 2)
    m = jnp.dot(
        patches.reshape(patches.shape[0], -1),
        Wm,
        preferred_element_type=jnp.float32,
    )                                                   # (N, 2) = (m01, m10)
    return jnp.arctan2(m[:, 0], m[:, 1])


def pack_bits(bits_bool: jnp.ndarray) -> jnp.ndarray:
    """(N, bits) bool -> (N, bits//32) uint32."""
    N, B = bits_bool.shape
    w = bits_bool.reshape(N, B // 32, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(w << shifts[None, None, :], axis=-1)


@functools.partial(jax.jit, static_argnames=("bits", "patch", "steer"))
def describe(
    img_blurred: jnp.ndarray,
    yx: jnp.ndarray,
    *,
    bits: int = 256,
    patch: int = DEFAULT_PATCH,
    steer: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute (optionally orientation-steered) BRIEF descriptors at integer
    keypoints.

    steer=False computes UPRIGHT BRIEF — a documented deviation from the
    reference's steered rBRIEF (cv::ORB, visual_odometry.cpp:22,85): on
    forward-motion rigs with no camera roll (KITTI), the intensity-centroid
    angle is noise-driven on weak-texture corners and steering by it
    DEcorrelates true matches (measured: upright doubles the true-match
    rank-0 rate on the synthetic benchmark) while costing a 30x larger
    descriptor matmul. The steered path stays available (and tested) for
    roll-prone rigs.

    Returns:
      packed: (N, bits // 32) uint32 descriptor words,
      signs:  (N, bits) float32 in {-1, +1} for MXU Hamming matching,
      theta:  (N,) quantized orientations (radians; zeros when steer=False).
    """
    patches = im_ops.gather_patches(img_blurred, yx, patch)   # (N, P, P)
    return describe_patches(patches, bits=bits, steer=steer)


@functools.partial(jax.jit, static_argnames=("bits", "steer"))
def describe_patches(
    patches: jnp.ndarray,
    *,
    bits: int = 256,
    steer: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """BRIEF description of pre-gathered (N, P, P) patches — the post-gather
    half of `describe`, shared by the XLA one-hot gather path and the Pallas
    per-keypoint DMA gather (ops/pallas/patch_kernel.py). Both gathers
    produce bit-identical patches, so the descriptors agree exactly."""
    N = patches.shape[0]
    patch = patches.shape[-1]
    flat = patches.reshape(N, -1)

    # Materialize only the columns actually used: the full 30-bin matrix is
    # a 33 MB constant, and embedding it per describe call bloated the
    # lowered chunk program to ~0.5 GB of HLO text (minutes of host-side
    # tracing + remote-compile hashing). The upright path needs bin 0 only.
    if steer:
        M = jnp.asarray(_steering_matrix(bits, patch))         # (P^2, 30*bits)
    else:
        M = jnp.asarray(_steering_matrix(bits, patch)[:, :bits])
    if steer:
        theta = orientations(patches)
        bin_f = jnp.round(theta * (_N_ANGLE_BINS / (2.0 * jnp.pi)))
        bin_idx = jnp.mod(bin_f.astype(jnp.int32), _N_ANGLE_BINS)  # (N,)

        diffs = jnp.dot(
            flat.astype(jnp.bfloat16),
            M.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).reshape(N, _N_ANGLE_BINS, bits)

        onehot = (
            jnp.arange(_N_ANGLE_BINS, dtype=jnp.int32)[None, :]
            == bin_idx[:, None]
        ).astype(jnp.float32)                                  # (N, 30)
        sel = jnp.einsum("nrb,nr->nb", diffs, onehot)          # (N, bits)
        theta_q = bin_idx.astype(jnp.float32) * (2.0 * jnp.pi / _N_ANGLE_BINS)
    else:
        sel = jnp.dot(
            flat.astype(jnp.bfloat16),
            M.astype(jnp.bfloat16),                            # bin-0 columns
            preferred_element_type=jnp.float32,
        )
        theta_q = jnp.zeros((N,), jnp.float32)

    bit = sel > 0.0
    return pack_bits(bit), jnp.where(bit, 1.0, -1.0).astype(jnp.float32), theta_q


def hamming_from_signs(signs_a: jnp.ndarray, signs_b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs Hamming distance via one matmul on the MXU.

    signs in {-1,+1}: dot = bits - 2*hamming  =>  hamming = (bits - dot)/2.
    Inputs are cast to bf16 (exact for +-1); accumulation is f32, so the
    distances are exact integers.
    """
    bits = signs_a.shape[-1]
    dot = jnp.dot(
        signs_a.astype(jnp.bfloat16),
        signs_b.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    return (bits - dot) * 0.5
