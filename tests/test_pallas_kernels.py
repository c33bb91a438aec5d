"""Pallas kernels vs XLA reference implementations (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_visual_slam_tpu.ops import fast as fast_ref
from stereo_visual_slam_tpu.ops.pallas import fast_kernel


@pytest.fixture(scope="module")
def test_image():
    rng = np.random.default_rng(0)
    img = rng.uniform(10, 30, (128, 256)).astype(np.float32)
    # sprinkle corners
    for (y, x) in [(20, 40), (60, 100), (90, 200), (30, 180), (100, 60)]:
        img[y - 2 : y + 3, x - 2 : x + 3] = rng.uniform(180, 255, (5, 5))
    return jnp.asarray(img)


def test_fast_kernel_matches_reference(test_image):
    ref = fast_ref.nms_3x3(fast_ref.fast_score_map(test_image, 20.0))
    ker = fast_kernel.fast_nms_score_map(
        test_image, threshold=20.0, tile=(64, 128), interpret=True
    )
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=1e-5)


def test_fast_kernel_detect_matches(test_image):
    yx_ref, s_ref = fast_ref.detect(
        test_image, max_kp=64, threshold=20.0, border=8
    )
    yx_ker, s_ker = fast_kernel.detect(
        test_image, max_kp=64, threshold=20.0, border=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(s_ker), np.asarray(s_ref), atol=1e-5)
    # same keypoint set (order may differ among equal scores)
    ref_set = {tuple(p) for p, s in zip(np.asarray(yx_ref), np.asarray(s_ref)) if s > 0}
    ker_set = {tuple(p) for p, s in zip(np.asarray(yx_ker), np.asarray(s_ker)) if s > 0}
    assert ref_set == ker_set


def test_fast_kernel_tile_boundaries():
    """Corners on tile boundaries must be identical to the reference
    (halo DMA correctness)."""
    rng = np.random.default_rng(1)
    img = rng.uniform(10, 30, (128, 256)).astype(np.float32)
    # corners exactly at / near the (64, 128) tile edges
    for (y, x) in [(63, 127), (64, 128), (62, 126), (65, 130), (64, 10), (10, 128)]:
        img[y - 2 : y + 3, x - 2 : x + 3] = 220.0
    img_j = jnp.asarray(img)
    ref = fast_ref.nms_3x3(fast_ref.fast_score_map(img_j, 20.0))
    ker = fast_kernel.fast_nms_score_map(
        img_j, threshold=20.0, tile=(64, 128), interpret=True
    )
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=1e-5)


# ---------------------------------------------------------------------------
# stereo ZNCC sweep kernel (ops/pallas/stereo_kernel.py)
# ---------------------------------------------------------------------------

from stereo_visual_slam_tpu.ops import stereo as stereo_ref
from stereo_visual_slam_tpu.ops.pallas import stereo_kernel


@pytest.fixture(scope="module")
def stereo_pair():
    rng = np.random.default_rng(2)
    H, W = 96, 384
    left = rng.uniform(0, 255, (H, W)).astype(np.float32)
    # structured disparity: right = left shifted by 17 px
    right = np.roll(left, -17, axis=1)
    return jnp.asarray(left), jnp.asarray(right)


def test_stereo_kernel_matches_xla(stereo_pair):
    left, right = stereo_pair
    rng = np.random.default_rng(3)
    N, D, p = 16, 32, 11
    yx = jnp.asarray(
        np.stack(
            [rng.integers(8, 88, N), rng.integers(40, 370, N)], axis=-1
        ),
        jnp.int32,
    )
    z_ref = stereo_ref.zncc_sweep_xla(
        left, right, yx, patch=p, max_disparity=D
    )
    z_ker = stereo_kernel.zncc_sweep(
        left, right, yx, patch=p, max_disparity=D, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(z_ker), np.asarray(z_ref), atol=2e-5
    )


def test_stereo_kernel_full_path_gates(stereo_pair):
    """match_disparity(impl='pallas') must agree with the XLA path on
    disparity, depth and every gate at a realistic disparity."""
    left, right = stereo_pair
    rng = np.random.default_rng(4)
    N = 16
    yx = jnp.asarray(
        np.stack(
            [rng.integers(8, 88, N), rng.integers(40, 370, N)], axis=-1
        ),
        jnp.int32,
    )
    valid = jnp.ones((N,), bool)
    kw = dict(
        fx=718.856, baseline=0.573, max_disparity=32, patch=11,
        min_zncc=0.6, min_depth=10.0, max_depth=400.0, reliable_depth=40.0,
    )
    a = stereo_ref.match_disparity(left, right, yx, valid, impl="xla", **kw)
    b = stereo_ref.match_disparity(
        left, right, yx, valid, impl="pallas", interpret=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_array_equal(
        np.asarray(a.reliable), np.asarray(b.reliable)
    )
    np.testing.assert_allclose(
        np.asarray(a.disparity), np.asarray(b.disparity), atol=1e-3
    )


def test_stereo_kernel_edge_keypoints(stereo_pair):
    """Keypoints at image borders (DMA clamp paths) stay finite and match."""
    left, right = stereo_pair
    H, W = left.shape
    yx = jnp.asarray(
        [
            [0, 0], [0, W - 1], [H - 1, 0], [H - 1, W - 1],
            [5, 33], [H - 6, W - 34], [50, 127], [50, 128],
        ],
        jnp.int32,
    )
    z_ref = stereo_ref.zncc_sweep_xla(
        left, right, yx, patch=11, max_disparity=32
    )
    z_ker = stereo_kernel.zncc_sweep(
        left, right, yx, patch=11, max_disparity=32, interpret=True
    )
    assert np.isfinite(np.asarray(z_ker)).all()
    np.testing.assert_allclose(
        np.asarray(z_ker), np.asarray(z_ref), atol=2e-5
    )


# ---------------------------------------------------------------------------
# patch gather kernel (ops/pallas/patch_kernel.py)


@pytest.fixture(scope="module")
def patch_image():
    # integer-valued (bf16-exact): the XLA one-hot gather rounds pixels to
    # bf16, the DMA kernel copies f32 exactly — uint8-range integers make
    # both identical (the production contract; see gather_patches docstring)
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.integers(0, 256, (128, 256)).astype(np.float32))


def test_patch_kernel_matches_gather(patch_image):
    from stereo_visual_slam_tpu.ops import image as im_ops
    from stereo_visual_slam_tpu.ops.pallas import patch_kernel

    rng = np.random.default_rng(3)
    # interior, border-clamping, and corner cases; N not a multiple of G
    yx = np.concatenate([
        np.stack([rng.integers(0, 128, 17), rng.integers(0, 256, 17)], -1),
        np.array([[0, 0], [127, 255], [5, 250], [120, 3]]),
    ]).astype(np.int32)
    ref = im_ops.gather_patches(patch_image, jnp.asarray(yx), 33)
    ker = patch_kernel.gather_patches_aligned(
        patch_image, jnp.asarray(yx), patch=33, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ker), np.asarray(ref))


def test_patch_kernel_stacked_frames_clamp_per_frame(patch_image):
    """frame_h: patches near frame seams clamp within their own frame,
    matching the per-frame gather exactly."""
    from stereo_visual_slam_tpu.ops import image as im_ops
    from stereo_visual_slam_tpu.ops.pallas import patch_kernel

    rng = np.random.default_rng(4)
    B, H, W = 3, 64, 256
    stacked = jnp.asarray(
        rng.integers(0, 256, (B * H, W)).astype(np.float32)
    )
    frames = stacked.reshape(B, H, W)
    yx_local = np.stack(
        [rng.integers(0, H, 24), rng.integers(0, W, 24)], -1
    ).astype(np.int32)
    # force seam-adjacent rows into the set
    yx_local[:6, 0] = np.array([0, 1, 15, H - 1, H - 2, H - 16])
    b_of = np.arange(24) % B
    yx_st = np.stack([yx_local[:, 0] + b_of * H, yx_local[:, 1]], -1)

    ker = patch_kernel.gather_patches_aligned(
        stacked, jnp.asarray(yx_st), patch=33, frame_h=H, interpret=True
    )
    for i in range(24):
        ref = im_ops.gather_patches(
            frames[b_of[i]], jnp.asarray(yx_local[i : i + 1]), 33
        )
        np.testing.assert_array_equal(np.asarray(ker[i]), np.asarray(ref[0]))


def test_describe_patches_equals_describe(patch_image):
    """The split describe (gather + describe_patches) is bit-identical to
    the fused describe for both gather paths."""
    from stereo_visual_slam_tpu.ops import orb as orb_ops
    from stereo_visual_slam_tpu.ops.pallas import patch_kernel

    rng = np.random.default_rng(5)
    yx = jnp.asarray(np.stack(
        [rng.integers(0, 128, 16), rng.integers(0, 256, 16)], -1
    ).astype(np.int32))
    for steer in (False, True):
        p_ref, s_ref, th_ref = orb_ops.describe(
            patch_image, yx, bits=256, patch=33, steer=steer
        )
        patches = patch_kernel.gather_patches_aligned(
            patch_image, yx, patch=33, interpret=True
        )
        p_k, s_k, th_k = orb_ops.describe_patches(
            patches, bits=256, steer=steer
        )
        np.testing.assert_array_equal(np.asarray(p_k), np.asarray(p_ref))
        np.testing.assert_array_equal(np.asarray(s_k), np.asarray(s_ref))
        np.testing.assert_array_equal(np.asarray(th_k), np.asarray(th_ref))
