"""Synthetic stereo sequence generator with exact ground truth.

No KITTI dataset ships in this environment, so correctness and benchmarks run
on synthetic sequences rendered to the same geometry as KITTI odometry
(1241x376, fx=718.856, baseline 0.573 m).

World model — "billboard sprites": a field of 3D points, each carrying a
fixed random texture patch. A frame is rendered by projecting every visible
point into the left/right cameras and alpha-pasting its patch at the
projection with bilinear sub-pixel placement over a low-frequency background.
Properties that make this a faithful testbed:

  * every landmark has a distinctive local appearance -> ORB descriptors are
    matchable frame-to-frame exactly like real corners;
  * the left/right views of a patch differ by the true disparity of its
    center -> stereo ZNCC recovers metric depth;
  * ground-truth camera poses are known exactly -> trajectory error is
    measurable to machine precision.

Rendering is plain numpy on the host (it stands in for the dataset reader,
which in the reference is disk IO, visual_odometry.cpp:37-68).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Tuple

import numpy as np

from stereo_visual_slam_tpu.utils.config import Config


@dataclasses.dataclass
class SyntheticWorld:
    points: np.ndarray          # (M, 3) world coords
    patches: np.ndarray         # (M, P, P) float32 textures
    poses_T_c_w: np.ndarray     # (F, 4, 4) ground-truth world->camera
    config: Config


def _se3_from_yaw_pos(yaw: float, pos: np.ndarray) -> np.ndarray:
    """T_w_c for a camera at `pos` yawed by `yaw` about world Y (camera
    convention: x right, y down, z forward)."""
    c, s = np.cos(yaw), np.sin(yaw)
    R_w_c = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float64)
    T = np.eye(4)
    T[:3, :3] = R_w_c
    T[:3, 3] = pos
    return T


def make_world(
    config: Config,
    n_frames: int = 100,
    n_points: int = 4000,
    patch: int = 13,
    speed: float = 1.0,
    yaw_rate: float = 0.004,
    seed: int = 0,
) -> SyntheticWorld:
    """Build a world and a smooth forward trajectory with gentle turning.

    speed: metres per frame (KITTI @ 10 Hz ~ 1 m/frame at 36 km/h).
    yaw_rate: radians per frame of sinusoidal steering.
    """
    rng = np.random.default_rng(seed)

    # Trajectory: integrate heading.
    poses_T_w_c = []
    pos = np.zeros(3)
    yaw = 0.0
    for f in range(n_frames):
        poses_T_w_c.append(_se3_from_yaw_pos(yaw, pos.copy()))
        yaw += yaw_rate * np.sin(2 * np.pi * f / max(n_frames, 1) * 2.0)
        heading = np.array([np.sin(yaw), 0.0, np.cos(yaw)])
        pos = pos + speed * heading
    poses_T_w_c = np.stack(poses_T_w_c)
    path_len = speed * n_frames

    # Points on SURFACES of a corridor around the path (camera y is DOWN,
    # mounted 1.65 m above ground like the KITTI rig): a ground plane and two
    # walls. Surface structure matters: neighboring points share depth, so
    # stereo windows straddling sprite boundaries stay depth-consistent, as
    # in real scenes. The sky is left dark and featureless.
    n_ground = n_points // 2
    n_wall = (n_points - n_ground) // 2
    z = rng.uniform(2.0, path_len + 80.0, n_points)
    x = np.empty(n_points)
    y = np.empty(n_points)
    # ground: y = +1.65 (below camera), x spread across the road
    x[:n_ground] = rng.uniform(-14.0, 14.0, n_ground)
    y[:n_ground] = 1.65 + rng.uniform(-0.05, 0.05, n_ground)
    # left/right walls at x = -+12, heights from road up to 5.5 m
    x[n_ground : n_ground + n_wall] = -12.0 + rng.uniform(-0.3, 0.3, n_wall)
    y[n_ground : n_ground + n_wall] = rng.uniform(-4.0, 1.65, n_wall)
    x[n_ground + n_wall :] = 12.0 + rng.uniform(-0.3, 0.3, len(x) - n_ground - n_wall)
    y[n_ground + n_wall :] = rng.uniform(-4.0, 1.65, len(x) - n_ground - n_wall)
    pts = np.stack([x, y, z], axis=-1)
    # Bend the corridor along the trajectory: shift x by the path's x at z.
    traj_x = poses_T_w_c[:, 0, 3]
    traj_z = poses_T_w_c[:, 2, 3]
    order = np.argsort(traj_z)
    pts[:, 0] += np.interp(z, traj_z[order], traj_x[order])

    patches = rng.uniform(40.0, 255.0, (n_points, patch, patch)).astype(np.float32)
    # light smoothing so sub-pixel shifts look natural
    k = np.array([0.25, 0.5, 0.25])
    patches = np.apply_along_axis(
        lambda v: np.convolve(v, k, mode="same"), 1, patches
    )
    patches = np.apply_along_axis(
        lambda v: np.convolve(v, k, mode="same"), 2, patches
    )

    T_c_w = np.array([np.linalg.inv(T) for T in poses_T_w_c])
    return SyntheticWorld(pts, patches.astype(np.float32), T_c_w, config)


def _paste(img: np.ndarray, patch: np.ndarray, v: float, u: float):
    """Opaque paste of `patch` centered at float coords (v, u), shifted to
    sub-pixel position by bilinear resampling. Replaces (does not blend with)
    what is underneath — callers draw far-to-near (painter's algorithm) so
    each pixel shows exactly one surface with a well-defined depth."""
    P = patch.shape[0]
    r = P // 2
    vi, ui = int(np.floor(v)), int(np.floor(u))
    fv, fu = v - vi, u - ui
    # bilinearly shift the patch by (fv, fu); result is (P-1, P-1) fully
    # covered by patch support (no border bleed)
    shifted = (
        patch[:-1, :-1] * (1 - fv) * (1 - fu)
        + patch[:-1, 1:] * (1 - fv) * fu
        + patch[1:, :-1] * fv * (1 - fu)
        + patch[1:, 1:] * fv * fu
    )
    Q = P - 1
    H, W = img.shape
    y0 = vi - r + 1
    x0 = ui - r + 1
    ys, xs = max(y0, 0), max(x0, 0)
    ye, xe = min(y0 + Q, H), min(x0 + Q, W)
    if ye <= ys or xe <= xs:
        return
    img[ys:ye, xs:xe] = shifted[ys - y0 : ye - y0, xs - x0 : xe - x0]


def _background(h: int, w: int, rng: np.random.Generator) -> np.ndarray:
    """Dark, low-contrast sky (contrast well under the FAST threshold, so it
    contributes no corners and no false stereo structure)."""
    return rng.uniform(8.0, 16.0, (h, w)).astype(np.float32)


def render_frame(
    world: SyntheticWorld, frame_idx: int, seed: int = 1234
) -> Tuple[np.ndarray, np.ndarray]:
    """Render (left, right) grayscale f32 images for a frame."""
    cfg = world.config
    cam = cfg.camera
    h, w = cfg.image_hw
    T_c_w = world.poses_T_c_w[frame_idx]
    Xc = world.points @ T_c_w[:3, :3].T + T_c_w[:3, 3]

    vis = (Xc[:, 2] > 2.0) & (Xc[:, 2] < 180.0)
    rng = np.random.default_rng(seed)  # deterministic background per world
    bg = _background(h, w, rng)
    left = bg.copy()
    right = bg.copy()

    idx = np.nonzero(vis)[0]
    z = Xc[idx, 2]
    # painter's algorithm: draw far sprites first so near ones occlude them
    order = np.argsort(-z)
    idx = idx[order]
    z = z[order]
    u = cam.fx * Xc[idx, 0] / z + cam.cx
    v = cam.fy * Xc[idx, 1] / z + cam.cy
    disp = cam.fx * cam.baseline / z
    margin = 8
    for k in range(len(idx)):
        if -margin < u[k] < w + margin and -margin < v[k] < h + margin:
            _paste(left, world.patches[idx[k]], v[k], u[k])
        ur = u[k] - disp[k]
        if -margin < ur < w + margin and -margin < v[k] < h + margin:
            _paste(right, world.patches[idx[k]], v[k], ur)

    return np.clip(left, 0, 255), np.clip(right, 0, 255)


def frames(world: SyntheticWorld) -> Iterator[Tuple[int, np.ndarray, np.ndarray]]:
    for f in range(world.poses_T_c_w.shape[0]):
        left, right = render_frame(world, f)
        yield f, left, right
