"""ctypes binding for the native prefetching .klg loader
(native/dataloader.cpp); falls back to the pure-python reader (io/klg.py)
when the shared library is not built."""

from __future__ import annotations

import ctypes
import os
from typing import Iterator

import numpy as np

from .klg import KLGFrame

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libhrbfio.so"),
    "libhrbfio.so",
]


def _load_lib():
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(os.path.abspath(p))
        except OSError:
            continue
        lib.klg_open.restype = ctypes.c_void_p
        lib.klg_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_float]
        lib.klg_num_frames.restype = ctypes.c_int
        lib.klg_num_frames.argtypes = [ctypes.c_void_p]
        lib.klg_next.restype = ctypes.c_int
        lib.klg_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.klg_close.argtypes = [ctypes.c_void_p]
        return lib
    return None


_LIB = None


def available() -> bool:
    global _LIB
    if _LIB is None:
        _LIB = _load_lib()
    return _LIB is not None


def frames(path: str, width: int = 640, height: int = 480,
           depth_scale: float = 1.0 / 1000.0) -> Iterator[KLGFrame]:
    """Stream frames through the native double-buffered decoder."""
    if not available():
        from . import klg as pyklg

        yield from pyklg.frames(path, width, height, depth_scale)
        return

    h = _LIB.klg_open(path.encode(), width, height, depth_scale)
    if not h:
        raise IOError(f"cannot open {path}")
    try:
        depth = np.empty((height, width), np.float32)
        rgb = np.empty((height, width, 3), np.float32)
        ts = ctypes.c_int64()
        while _LIB.klg_next(
            h,
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(ts),
        ):
            yield KLGFrame(int(ts.value), depth.copy(), rgb.copy())
    finally:
        _LIB.klg_close(h)
