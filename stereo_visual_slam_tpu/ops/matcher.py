"""Brute-force Hamming matcher with cross-check and the reference's gate.

Reference: cv::BFMatcher(NORM_HAMMING, crosscheck=true) + distance threshold
d <= max(2 * min_d, 30 * frame_gap) (visual_odometry.cpp:219-251).

TPU design: descriptors are kept as +-1 float vectors so the full N x M
distance matrix is ONE 256-deep matmul on the MXU (see
orb.hamming_from_signs); cross-check is a row-argmin / col-argmin mutual
test; the gate is applied with masked reductions. All shapes static.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereo_visual_slam_tpu.ops.orb import hamming_from_signs

_BIG = 1e9


class MatchResult(NamedTuple):
    idx_last: jnp.ndarray   # (M,) int32 — index into "last" features per match
    idx_curr: jnp.ndarray   # (M,) int32 — index into "current" features
    dist: jnp.ndarray       # (M,) f32 Hamming distance
    mask: jnp.ndarray       # (M,) bool valid-match mask


@functools.partial(jax.jit, static_argnames=())
def match(
    signs_last: jnp.ndarray,
    valid_last: jnp.ndarray,
    signs_curr: jnp.ndarray,
    valid_curr: jnp.ndarray,
    frame_gap: jnp.ndarray,
    *,
    base_gate: float = 30.0,
    min_dist_factor: float = 2.0,
) -> MatchResult:
    """Cross-checked Hamming matching between two padded descriptor sets.

    Returns one match slot per "last" feature (M = N_last), masked.
    """
    D = hamming_from_signs(signs_last, signs_curr)  # (N_last, N_curr)
    D = jnp.where(valid_last[:, None] & valid_curr[None, :], D, _BIG)

    best_j = jnp.argmin(D, axis=1)                     # (N_last,)
    best_d = jnp.take_along_axis(D, best_j[:, None], axis=1)[:, 0]
    best_i = jnp.argmin(D, axis=0)                     # (N_curr,)
    # mutual nearest: argmin over column best_j equals the row index
    n_last = D.shape[0]
    rows = jnp.arange(n_last, dtype=best_i.dtype)
    mutual = best_i[best_j] == rows
    ok = mutual & (best_d < _BIG)

    # reference gate: d <= max(2 * min_d_over_matches, 30 * frame_gap)
    min_d = jnp.min(jnp.where(ok, best_d, _BIG))
    gate = jnp.maximum(min_dist_factor * min_d, base_gate * frame_gap)
    ok = ok & (best_d <= gate)

    return MatchResult(
        idx_last=rows.astype(jnp.int32),
        idx_curr=best_j.astype(jnp.int32),
        dist=best_d,
        mask=ok,
    )
