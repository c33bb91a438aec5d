"""Image utilities: padding, box blur, patch gather.

All fixed-shape, jit-friendly. Images are float32 (H, W) in [0, 255].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pad_to(img: jnp.ndarray, hw) -> jnp.ndarray:
    """Pad (h, w) image with zeros to the static padded shape."""
    h, w = img.shape[-2:]
    H, W = hw
    return jnp.pad(img, [(0, H - h), (0, W - w)])


def box_blur(img: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    """Separable k x k box blur via cumulative sums (O(1) per pixel,
    bandwidth-bound — XLA fuses the two passes). Matches the integral-image
    smoothing BRIEF uses before sampling."""
    r = k // 2

    def blur_axis(x, axis):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (r + 1, r)
        xp = jnp.pad(x, pad, mode="edge")
        c = jnp.cumsum(xp, axis=axis)
        n = x.shape[axis]
        lo = jax.lax.slice_in_dim(c, 0, n, axis=axis)
        hi = jax.lax.slice_in_dim(c, k, k + n, axis=axis)
        return (hi - lo) / k

    return blur_axis(blur_axis(img, 0), 1)


@functools.partial(jax.jit, static_argnums=(2,))
def gather_patches(img: jnp.ndarray, yx: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Extract `patch` x `patch` windows centered at integer coords yx (N, 2).

    Out-of-range centers are clamped (callers mask by validity anyway).
    Returns (N, patch, patch).
    """
    r = patch // 2
    H, W = img.shape
    y0 = jnp.clip(yx[:, 0] - r, 0, H - patch)
    x0 = jnp.clip(yx[:, 1] - r, 0, W - patch)

    def slice_one(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (patch, patch))

    return jax.vmap(slice_one)(y0, x0)


def gather_values(img: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """img[(y, x)] for integer coords (N, 2), clamped."""
    H, W = img.shape
    y = jnp.clip(yx[:, 0], 0, H - 1)
    x = jnp.clip(yx[:, 1], 0, W - 1)
    return img[y, x]
