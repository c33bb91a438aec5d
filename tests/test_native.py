"""Tests for the native host runtime (native/src/slamio.cpp via ctypes).

Covers: PNG/PGM grayscale decode vs PIL, the multithreaded prefetching
stereo loader (in-order delivery, content correctness), and the native
KITTI trajectory writer vs the pure-Python writer (same rows, reference
format of map.cpp:188-195).
"""

import os

import numpy as np
import pytest

from stereo_visual_slam_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native slamio library not available"
)


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr, mode="L").save(path)


def _write_pgm(path, arr):
    h, w = arr.shape
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n255\n".encode())
        f.write(arr.tobytes())


def test_png_decode_matches_pil(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    p = str(tmp_path / "img.png")
    _write_png(p, arr)
    out = native.read_image_gray(p)
    np.testing.assert_array_equal(out, arr)


def test_pgm_decode(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, size=(12, 19), dtype=np.uint8)
    p = str(tmp_path / "img.pgm")
    _write_pgm(p, arr)
    out = native.read_image_gray(p)
    np.testing.assert_array_equal(out, arr)


def test_probe_and_bad_file(tmp_path):
    arr = np.zeros((5, 9), dtype=np.uint8)
    p = str(tmp_path / "a.png")
    _write_png(p, arr)
    assert native.probe_image(p) == (5, 9)
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"not an image")
    with pytest.raises(IOError):
        native.probe_image(bad)


def _make_sequence(tmp_path, n, h=24, w=32):
    left_dir = tmp_path / "image_0"
    right_dir = tmp_path / "image_1"
    left_dir.mkdir()
    right_dir.mkdir()
    rng = np.random.default_rng(7)
    frames = []
    for i in range(n):
        l = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        r = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        _write_png(str(left_dir / f"{i:06d}.png"), l)
        _write_png(str(right_dir / f"{i:06d}.png"), r)
        frames.append((l, r))
    return str(left_dir), str(right_dir), frames


def test_prefetcher_in_order_and_correct(tmp_path):
    n = 25
    left_dir, right_dir, frames = _make_sequence(tmp_path, n)
    got = []
    with native.StereoPrefetcher(
        left_dir, right_dir, count=n, hw=(24, 32), depth=4, workers=3
    ) as pf:
        for idx, l, r in pf:
            got.append(idx)
            np.testing.assert_array_equal(l, frames[idx][0])
            np.testing.assert_array_equal(r, frames[idx][1])
    assert got == list(range(n))


def test_prefetcher_early_close(tmp_path):
    n = 16
    left_dir, right_dir, _ = _make_sequence(tmp_path, n)
    pf = native.StereoPrefetcher(
        left_dir, right_dir, count=n, hw=(24, 32), depth=4, workers=2
    )
    it = iter(pf)
    next(it)
    next(it)
    pf.close()  # must join workers without deadlock


def test_kitti_sequence_uses_native(tmp_path):
    from stereo_visual_slam_tpu.data import kitti

    n = 5
    _make_sequence(tmp_path, n)
    seq = kitti.open_sequence(str(tmp_path))
    assert seq.n_frames == n
    out = list(seq.frames())
    assert [i for i, _, _ in out] == list(range(n))
    l0, _ = seq.frame(0)
    np.testing.assert_array_equal(out[0][1], l0)


def test_traj_writer_matches_python(tmp_path):
    from stereo_visual_slam_tpu.pipeline import trajectory

    rng = np.random.default_rng(3)
    poses = []
    for _ in range(6):
        # random rigid transform
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        T = np.eye(4)
        T[:3, :3] = Q
        T[:3, 3] = rng.normal(scale=5.0, size=3)
        poses.append(T)

    py_path = str(tmp_path / "py.txt")
    na_path = str(tmp_path / "native.txt")
    pyw = trajectory.TrajectoryWriter(py_path)
    with native.NativeTrajectoryWriter(na_path) as nw:
        for i, T in enumerate(poses):
            pyw.write(i * 3, T)
            nw.write(i * 3, T)
        nw.flush()

    py_rows = trajectory.read_trajectory(py_path)
    na_rows = trajectory.read_trajectory(na_path)
    assert set(py_rows) == set(na_rows)
    for k in py_rows:
        np.testing.assert_allclose(na_rows[k], py_rows[k], rtol=0, atol=1e-7)


def test_traj_writer_append(tmp_path):
    p = str(tmp_path / "t.txt")
    T = np.eye(4)
    with native.NativeTrajectoryWriter(p) as w:
        w.write(0, T)
    with native.NativeTrajectoryWriter(p, append=True) as w:
        w.write(1, T)
    with open(p) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 2
    assert lines[0].startswith("0 ") and lines[1].startswith("1 ")
