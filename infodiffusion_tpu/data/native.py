"""ctypes bridge to the native C++ image loader (native/image_loader.cpp).

Builds the shared library on first use (g++ against system libjpeg /
libpng) and exposes ``NativeImageBatcher`` — a thread-pooled batch
decoder with the dataset transforms fused in. ``ImageFolderDataset``
uses it automatically when the toolchain is present; PIL remains the
fallback (and the parity oracle: decode differs only by resampling
kernel rounding, tested within tolerance in tests/test_native_loader.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_lib() -> Optional[str]:
    root = _repo_root()
    src = os.path.join(root, "native", "image_loader.cpp")
    if not os.path.exists(src):
        return None
    out_dir = os.path.join(root, "native", "build")
    os.makedirs(out_dir, exist_ok=True)
    so = os.path.join(out_dir, "libimage_loader.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    # compile to a per-process temp name and rename into place: rename
    # is atomic, so a concurrent process never CDLLs (or mtime-passes)
    # a partially written .so — it either rebuilds its own or loads a
    # complete one
    tmp = f"{so}.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
        "-o", tmp, "-ljpeg", "-lpng", "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so)
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None
    return so


def _get_lib():
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        if os.environ.get("INFODIFF_DISABLE_NATIVE"):
            _LIB_FAILED = True
            return None
        so = _build_lib()
        if so is None:
            _LIB_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _LIB_FAILED = True
            return None
        lib.idl_create.restype = ctypes.c_void_p
        lib.idl_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.idl_destroy.argtypes = [ctypes.c_void_p]
        lib.idl_decode_batch.restype = ctypes.c_int
        lib.idl_decode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.idl_write_png_batch.restype = ctypes.c_int
        lib.idl_write_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _get_lib() is not None


class NativeImageBatcher:
    """Holds a native loader handle over a fixed file list."""

    def __init__(self, files: List[str], size: int, center_crop: bool,
                 d2c: bool, threads: int = 0):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native image loader unavailable")
        self._lib = lib
        self.size = size
        self._n = len(files)
        arr = (ctypes.c_char_p * len(files))(
            *[f.encode() for f in files]
        )
        self._handle = lib.idl_create(
            arr, len(files), size, int(center_crop), int(d2c), threads
        )

    def decode_with_failures(
        self, idx: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """([b, S, S, 3] uint8, positions of failed slots). Failed slots
        are zero-filled; the caller decides whether to retry them (e.g.
        through PIL, which handles color spaces libjpeg rejects) or
        raise."""
        idx = np.ascontiguousarray(idx, dtype=np.int32)
        b = len(idx)
        out = np.empty((b, self.size, self.size, 3), np.uint8)
        failed = np.zeros(b, np.uint8)
        self._lib.idl_decode_batch(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            b,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            failed.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        return out, np.flatnonzero(failed)

    def decode(self, idx: np.ndarray) -> np.ndarray:
        out, failed = self.decode_with_failures(idx)
        if len(failed):
            raise IOError(
                f"native loader: {len(failed)}/{len(out)} images failed "
                "to decode"
            )
        return out

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.idl_destroy(self._handle)
        except Exception:
            pass


def write_png_batch(paths, batch_u8, threads: int = 0) -> bool:
    """Write [B, H, W, C] uint8 (C in {1, 3}) to PNG files with the
    native thread pool; returns False when unavailable (caller falls
    back to PIL)."""
    lib = _get_lib()
    if lib is None:
        return False
    batch_u8 = np.ascontiguousarray(batch_u8, dtype=np.uint8)
    b, h, w, c = batch_u8.shape
    if c not in (1, 3) or len(paths) != b:
        return False
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    fails = lib.idl_write_png_batch(
        arr, batch_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        b, h, w, c, threads,
    )
    if fails:
        raise IOError(f"native png writer: {fails}/{b} failed")
    return True
