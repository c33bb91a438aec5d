"""Reprojection residual + analytic Jacobians — the numeric hot kernel of BA.

Reproduces the g2o edge math of the reference (SURVEY.md §3.5):

  EdgeProjection::computeError   (optimization.cpp:41-50):
      e = u - pi(K * (T * P))            (2-vector, pixel units)
  EdgeProjection::linearizeOplus (optimization.cpp:52-73):
      de/dxi : 2x6 analytic Jacobian for a LEFT perturbation T <- exp(d) T,
      de/dP  : 2x3 = (de/dXc) * R.

Sign convention: we return r = pi(K T P) - u (so GN minimizes ||r||^2 and
steps use -J^T r; equivalent to the reference up to the global sign).

All functions broadcast over leading batch dimensions and are float32-safe
(depth clamped away from zero; a `depth_ok` mask flags points behind or too
close to the camera so callers can zero their contributions).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_MIN_Z = 1e-3


def project(Xc: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> pixels (..., 2)."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z = jnp.maximum(Xc[..., 2], _MIN_Z)
    u = fx * Xc[..., 0] / z + cx
    v = fy * Xc[..., 1] / z + cy
    return jnp.stack([u, v], axis=-1)


def _proj_jacobian(Xc: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """d(pixel)/d(Xc): (..., 2, 3)."""
    fx, fy = K[0, 0], K[1, 1]
    X, Y = Xc[..., 0], Xc[..., 1]
    Z = jnp.maximum(Xc[..., 2], _MIN_Z)
    iz = 1.0 / Z
    iz2 = iz * iz
    zero = jnp.zeros_like(X)
    row0 = jnp.stack([fx * iz, zero, -fx * X * iz2], axis=-1)
    row1 = jnp.stack([zero, fy * iz, -fy * Y * iz2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def residual_and_jacobians(
    T_c_w: jnp.ndarray,
    pts_w: jnp.ndarray,
    uv: jnp.ndarray,
    K: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full edge linearization.

    Args (broadcastable): T_c_w (..., 4, 4), pts_w (..., 3), uv (..., 2).
    Returns:
      r        (..., 2)    residual  pi(K T P) - u
      J_pose   (..., 2, 6) wrt left-perturbation twist [v, w]
      J_point  (..., 2, 3) wrt world point
      depth_ok (..., )     f32 1.0 where Xc.z > _MIN_Z
    """
    R = T_c_w[..., :3, :3]
    t = T_c_w[..., :3, 3]
    Xc = jnp.einsum("...ij,...j->...i", R, pts_w) + t
    depth_ok = (Xc[..., 2] > _MIN_Z).astype(pts_w.dtype)

    r = project(Xc, K) - uv
    Jproj = _proj_jacobian(Xc, K)                       # (..., 2, 3)

    # d(Xc)/d(twist) for LEFT perturbation exp([v,w]) T:  [I, -hat(Xc)]
    X, Y = Xc[..., 0], Xc[..., 1]
    Z = Xc[..., 2]
    zero = jnp.zeros_like(X)
    one = jnp.ones_like(X)
    # hat(Xc)
    hx = jnp.stack(
        [
            jnp.stack([zero, -Z, Y], axis=-1),
            jnp.stack([Z, zero, -X], axis=-1),
            jnp.stack([-Y, X, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pts_w.dtype), hx.shape)
    dXc_dxi = jnp.concatenate([eye, -hx], axis=-1)      # (..., 3, 6)

    J_pose = Jproj @ dXc_dxi                            # (..., 2, 6)
    J_point = Jproj @ R                                 # (..., 2, 3)
    return r, J_pose, J_point, depth_ok


def reprojection_residual_jac(
    T_c_w: jnp.ndarray, pts_w: jnp.ndarray, uv: jnp.ndarray, K: jnp.ndarray
):
    """Pose-only variant (PoseOnlyEdgeProjection, optimization.cpp:75-101)."""
    r, J_pose, _, depth_ok = residual_and_jacobians(T_c_w, pts_w, uv, K)
    return r, J_pose, depth_ok


def huber_weight(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight for g2o's RobustKernelHuber with delta on chi2's sqrt:
    the reference sets delta = 5.991 on e = ||r||^2... in g2o the kernel is
    quadratic while e <= delta^2, i.e. while ||r|| <= delta. IRLS weight
    w = min(1, delta / ||r||) reproduces the same influence curve."""
    n = jnp.linalg.norm(r, axis=-1)
    return jnp.minimum(1.0, delta / jnp.maximum(n, 1e-9))
