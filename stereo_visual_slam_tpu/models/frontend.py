"""Per-frame feature extraction: one jitted function, fixed shapes.

Fuses the reference's per-frame front-end sequence — feature_detection
(visual_odometry.cpp:70-94), ANMS (:96-157), descriptor compute (:85),
disparity (:159-174) and 3D gating (:176-217) — into a single XLA program:
padded image in, padded feature table out. No host round-trips inside.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from stereo_visual_slam_tpu.ops import anms as anms_ops
from stereo_visual_slam_tpu.ops import fast as fast_ops
from stereo_visual_slam_tpu.ops import image as im_ops
from stereo_visual_slam_tpu.ops import orb as orb_ops
from stereo_visual_slam_tpu.ops import stereo as stereo_ops
from stereo_visual_slam_tpu.utils.config import Config


class FrameFeatures(NamedTuple):
    """Fixed-size feature table for one stereo frame.

    N = config max_raw_keypoints: descriptors and stereo depth are computed
    for ALL raw FAST corners (the matcher searches everything — detection
    repeatability over the raw set is ~80% vs ~52% for an ANMS subset, and
    the extra compute is noise for the MXU). `spawn_mask` marks the
    ANMS-selected uniform subset (config n_features strong) used to spawn
    NEW features at keyframes, preserving the reference's ANMS-500 behavior
    (visual_odometry.cpp:82)."""

    yx: jnp.ndarray          # (N, 2) int32 keypoint coords (row, col)
    score: jnp.ndarray       # (N,) FAST response
    valid: jnp.ndarray       # (N,) bool — detected keypoint
    spawn_mask: jnp.ndarray  # (N,) bool — ANMS-selected subset
    signs: jnp.ndarray       # (N, 256) {-1,+1} descriptor for MXU matching
    packed: jnp.ndarray      # (N, 8) uint32 packed descriptor
    disparity: jnp.ndarray   # (N,) f32
    depth: jnp.ndarray       # (N,) f32 camera-frame z
    depth_valid: jnp.ndarray  # (N,) bool — 10 m < z < 400 m and good match
    reliable: jnp.ndarray    # (N,) bool — z < 40 m
    pts_cam: jnp.ndarray     # (N, 3) camera-frame 3D (valid where depth_valid)


def make_extractor(config: Config):
    """Build the jitted extractor closed over static config."""
    fe = config.frontend
    cam = config.camera
    H, W = config.padded_hw
    vh, vw = config.image_hw

    @jax.jit
    def extract(left: jnp.ndarray, right: jnp.ndarray) -> FrameFeatures:
        """left/right: (H, W) padded f32 grayscale."""
        yx, score = fast_ops.detect(
            left,
            max_kp=fe.max_raw_keypoints,
            threshold=fe.fast_threshold,
            border=fe.border_margin,
            valid_hw=(vh, vw),
        )
        valid = score > 0.0
        spawn_mask = anms_ops.anms_mask(
            yx, score, num=fe.n_features, robust_coeff=fe.anms_robust_coeff
        )
        blurred = im_ops.box_blur(left, fe.blur_box)
        packed, signs, _theta = orb_ops.describe(
            blurred, yx, bits=fe.descriptor_bits, patch=fe.patch_size
        )
        st = stereo_ops.match_disparity(
            left,
            right,
            yx,
            valid,
            fx=cam.fx,
            baseline=cam.baseline,
            max_disparity=fe.max_disparity,
            patch=fe.stereo_patch,
            min_zncc=fe.min_zncc,
            min_depth=fe.min_depth,
            max_depth=fe.max_depth,
            reliable_depth=fe.reliable_depth,
        )
        pts_cam = stereo_ops.backproject(
            yx, st.depth, fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy
        )
        return FrameFeatures(
            yx=yx,
            score=score,
            valid=valid,
            spawn_mask=spawn_mask,
            signs=signs,
            packed=packed,
            disparity=st.disparity,
            depth=st.depth,
            depth_valid=st.valid,
            reliable=st.reliable,
            pts_cam=pts_cam,
        )

    return extract


@functools.partial(jax.jit, static_argnames=("hw",))
def prepare_image(img: jnp.ndarray, hw) -> jnp.ndarray:
    """Pad a raw (h, w) image to the static padded shape, f32."""
    return im_ops.pad_to(img.astype(jnp.float32), hw)
