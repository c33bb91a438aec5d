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
