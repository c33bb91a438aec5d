"""ctypes bindings for the native host runtime (native/src/slamio.cpp).

The reference's runtime is native C++ (OpenCV imread at
visual_odometry.cpp:37-68; trajectory writer at map.cpp:168-204). Our TPU
build keeps compute in JAX and implements the host runtime natively too:
libslamio provides grayscale PNG/PGM decode, a multithreaded prefetching
stereo-frame loader (bounded ring, in-order delivery), and the KITTI
trajectory writer.

This module loads the shared library, building it with `make` on first use
if needed. Everything degrades gracefully: `available()` is False when no
toolchain/library exists and callers fall back to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libslamio.so")

_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_u8p = ctypes.POINTER(ctypes.c_uint8)
_i32p = ctypes.POINTER(ctypes.c_int)


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(
                    ["make", "-s"],
                    cwd=_NATIVE_DIR,
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _load_failed = True
            return None

        lib.sio_version.restype = ctypes.c_int
        lib.sio_probe_image.argtypes = [ctypes.c_char_p, _i32p, _i32p]
        lib.sio_probe_image.restype = ctypes.c_int
        lib.sio_read_image_gray.argtypes = [
            ctypes.c_char_p, _u8p, _i32p, _i32p, ctypes.c_int, ctypes.c_int,
        ]
        lib.sio_read_image_gray.restype = ctypes.c_int
        lib.sio_prefetch_open.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.sio_prefetch_open.restype = ctypes.c_void_p
        lib.sio_prefetch_next.argtypes = [ctypes.c_void_p, _u8p, _u8p]
        lib.sio_prefetch_next.restype = ctypes.c_int
        lib.sio_prefetch_close.argtypes = [ctypes.c_void_p]
        lib.sio_traj_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.sio_traj_open.restype = ctypes.c_void_p
        lib.sio_traj_write.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.POINTER(ctypes.c_double),
        ]
        lib.sio_traj_write.restype = ctypes.c_int
        lib.sio_traj_flush.argtypes = [ctypes.c_void_p]
        lib.sio_traj_flush.restype = ctypes.c_int
        lib.sio_traj_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _try_load() is not None


def probe_image(path: str) -> Tuple[int, int]:
    lib = _try_load()
    if lib is None:
        raise RuntimeError("native slamio unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.sio_probe_image(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        raise IOError(f"cannot decode image: {path}")
    return h.value, w.value


def read_image_gray(path: str) -> np.ndarray:
    """Decode a grayscale PNG/PGM via the native library."""
    lib = _try_load()
    if lib is None:
        raise RuntimeError("native slamio unavailable")
    h, w = probe_image(path)
    buf = np.empty((h, w), dtype=np.uint8)
    hh = ctypes.c_int()
    ww = ctypes.c_int()
    rc = lib.sio_read_image_gray(
        path.encode(), buf.ctypes.data_as(_u8p), ctypes.byref(hh),
        ctypes.byref(ww), h, w,
    )
    if rc != 0:
        raise IOError(f"decode failed ({rc}): {path}")
    return buf


class StereoPrefetcher:
    """In-order stereo frame stream decoded by a native worker pool.

    Iterating yields (frame_index, left_u8[h,w], right_u8[h,w]). Decoding of
    frame i+1..i+depth overlaps the consumer's device compute on frame i —
    the async-IO replacement for the reference's synchronous imread inside
    the hot loop (run_vslam.cpp:40-44).
    """

    def __init__(
        self,
        left_dir: str,
        right_dir: str,
        count: int,
        hw: Tuple[int, int],
        start: int = 0,
        ext: str = ".png",
        depth: int = 8,
        workers: int = 4,
    ):
        lib = _try_load()
        if lib is None:
            raise RuntimeError("native slamio unavailable")
        self._lib = lib
        self._h, self._w = int(hw[0]), int(hw[1])
        self._count = int(count)
        self._handle = lib.sio_prefetch_open(
            left_dir.encode(), right_dir.encode(), ext.encode(),
            int(start), self._count, self._h, self._w, int(depth), int(workers),
        )
        if not self._handle:
            raise RuntimeError("sio_prefetch_open failed")

    def __iter__(self):
        left = np.empty((self._h, self._w), dtype=np.uint8)
        right = np.empty((self._h, self._w), dtype=np.uint8)
        while True:
            rc = self._lib.sio_prefetch_next(
                self._handle, left.ctypes.data_as(_u8p),
                right.ctypes.data_as(_u8p),
            )
            if rc == -1:
                return
            if rc == -2:
                raise IOError("frame decode failed in prefetcher")
            yield rc, left.copy(), right.copy()

    def close(self):
        if self._handle:
            self._lib.sio_prefetch_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeTrajectoryWriter:
    """KITTI trajectory writer backed by libslamio; row format identical to
    pipeline.trajectory.TrajectoryWriter (and to the reference's
    Map::write_pose, map.cpp:188-195)."""

    def __init__(self, path: str, append: bool = False):
        lib = _try_load()
        if lib is None:
            raise RuntimeError("native slamio unavailable")
        self._lib = lib
        self._handle = lib.sio_traj_open(path.encode(), 1 if append else 0)
        if not self._handle:
            raise IOError(f"cannot open {path}")
        self.path = path

    def write(self, frame_id: int, T_c_w: np.ndarray):
        T = np.ascontiguousarray(T_c_w, dtype=np.float64)
        rc = self._lib.sio_traj_write(
            self._handle, int(frame_id),
            T.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc != 0:
            raise IOError("trajectory write failed")

    def flush(self):
        self._lib.sio_traj_flush(self._handle)

    def close(self):
        if self._handle:
            self._lib.sio_traj_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
