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
