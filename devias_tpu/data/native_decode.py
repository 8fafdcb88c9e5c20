"""ctypes binding for the C++ FFmpeg decode core (native/decode_core).

Build: `make -C native` (produces native/libdevias_decode.so). When the
library is absent the pipeline falls back to OpenCV decoding.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_SEARCHED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "native", "libdevias_decode.so"),
        os.path.join(os.path.dirname(__file__), "libdevias_decode.so"),
        os.environ.get("DEVIAS_DECODE_LIB", ""),
    ]
    for c in candidates:
        if c and os.path.isfile(c):
            return c
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB or None
    _SEARCHED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.devias_open.argtypes = [ctypes.c_char_p]
    lib.devias_open.restype = ctypes.c_void_p
    lib.devias_num_frames.argtypes = [ctypes.c_void_p]
    lib.devias_num_frames.restype = ctypes.c_int64
    lib.devias_frame_size.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)
    ]
    lib.devias_frame_size.restype = ctypes.c_int32
    lib.devias_get_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.devias_get_batch.restype = ctypes.c_int32
    lib.devias_close.argtypes = [ctypes.c_void_p]
    lib.devias_close.restype = None
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def open(path: str):
    lib = _load()
    h = lib.devias_open(path.encode())
    if not h:
        raise RuntimeError(f"native decode open failed: {path}")
    return h


def num_frames(handle) -> int:
    return int(_load().devias_num_frames(handle))


def frame_size(handle):
    lib = _load()
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    if lib.devias_frame_size(handle, ctypes.byref(h), ctypes.byref(w)) != 0:
        raise RuntimeError("native frame_size failed")
    return int(h.value), int(w.value)


def get_batch(handle, indices: np.ndarray) -> np.ndarray:
    lib = _load()
    h, w = frame_size(handle)
    idx = np.ascontiguousarray(indices, np.int64)
    out = np.empty((len(idx), h, w, 3), np.uint8)
    rc = lib.devias_get_batch(
        handle,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise RuntimeError(f"native get_batch failed rc={rc}")
    return out


def close(handle) -> None:
    _load().devias_close(handle)
