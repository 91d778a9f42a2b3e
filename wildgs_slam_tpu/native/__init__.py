"""ctypes bindings for the native runtime library (wildgs_native.cpp).

Builds the shared library on first import if needed (g++ + libpng/libjpeg).
All entry points degrade gracefully: callers fall back to cv2/numpy when the
native library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libwildgs_native.so")
_SRC = os.path.join(_DIR, "wildgs_native.cpp")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO, "-lpng", "-ljpeg", "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.wn_loader_create.restype = ctypes.c_void_p
        lib.wn_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_int]
        lib.wn_loader_get.restype = ctypes.c_int
        lib.wn_loader_get.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_float)]
        lib.wn_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.wn_write_ply.restype = ctypes.c_int
        lib.wn_write_ply.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.c_int, ctypes.POINTER(ctypes.c_char_p)]
        lib.wn_read_image.restype = ctypes.c_int
        lib.wn_read_image.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                      ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_float)]
        lib.wn_read_depth16.restype = ctypes.c_int
        lib.wn_read_depth16.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_float,
                                        ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


class FrameLoader:
    """Prefetching frame loader: worker threads decode+resize frames ahead
    of the SLAM loop."""

    def __init__(self, paths, out_w, out_h, n_threads=2, is_depth=False,
                 depth_scale=1.0, lookahead=4):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self.lib = lib
        self.out_w, self.out_h = out_w, out_h
        self.channels = 1 if is_depth else 3
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._paths_keepalive = arr
        self.handle = lib.wn_loader_create(
            arr, len(paths), out_w, out_h, n_threads, int(is_depth),
            float(depth_scale), lookahead)
        self.n = len(paths)

    def get(self, idx) -> np.ndarray:
        out = np.empty((self.out_h, self.out_w, self.channels), np.float32)
        ok = self.lib.wn_loader_get(
            self.handle, int(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if not ok:
            raise IOError(f"frame {idx} failed to load")
        return out[..., 0] if self.channels == 1 else out

    def __del__(self):
        try:
            if getattr(self, "handle", None):
                self.lib.wn_loader_destroy(self.handle)
        except Exception:
            pass


def write_ply_native(path: str, data: np.ndarray, prop_names) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, np.float32)
    names = (ctypes.c_char_p * len(prop_names))(
        *[n.encode() for n in prop_names])
    return bool(lib.wn_write_ply(
        path.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        data.shape[0], data.shape[1], names))


def read_image_native(path: str, out_w: int, out_h: int):
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((out_h, out_w, 3), np.float32)
    ok = lib.wn_read_image(path.encode(), out_w, out_h,
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if ok else None
