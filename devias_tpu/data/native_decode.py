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
_HAS_INDEX_CACHE = False


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
    global _HAS_INDEX_CACHE
    try:  # older committed .so may predate the cached-open symbols
        lib.devias_open_cached.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        lib.devias_open_cached.restype = ctypes.c_void_p
        lib.devias_export_index.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _HAS_INDEX_CACHE = True
    except AttributeError:
        _HAS_INDEX_CACHE = False
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# frame-index cache: training reopens every file each epoch (the reference
# re-instantiates decord VideoReaders per __getitem__, ref kinetics.py:313),
# and build_index demuxes the WHOLE file per open. The (pts, keyframe)
# index is immutable for an unchanged file, so cache it keyed on
# (path, mtime_ns, size) and inject it on reopen (devias_open_cached).
# Bounded LRU: ~12 bytes/frame, 8192 entries ≈ 30 MB for 300-frame clips.
# ---------------------------------------------------------------------------

_INDEX_CACHE: "dict[tuple, tuple[np.ndarray, np.ndarray]]" = {}
_INDEX_LOCK = __import__("threading").Lock()
_INDEX_CACHE_MAX = 8192


def _cache_key(path: str):
    st = os.stat(path)
    return (path, st.st_mtime_ns, st.st_size)


def open(path: str):
    lib = _load()
    use_cache = _HAS_INDEX_CACHE and not os.environ.get(
        "DEVIAS_NO_DECODE_INDEX_CACHE"
    )
    key = None
    if use_cache:
        try:
            key = _cache_key(path)
        except OSError:
            key = None
        if key is not None:
            with _INDEX_LOCK:
                hit = _INDEX_CACHE.get(key)
            if hit is not None:
                pts, kf = hit
                h = lib.devias_open_cached(
                    path.encode(),
                    pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    kf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    len(pts),
                )
                if h:
                    return h
                # cached-open failure (e.g. file vanished/changed): fall
                # through to the scanning open and refresh the entry
    h = lib.devias_open(path.encode())
    if not h:
        raise RuntimeError(f"native decode open failed: {path}")
    if key is not None:
        n = int(lib.devias_num_frames(h))
        pts = np.empty(n, np.int64)
        kf = np.empty(n, np.int32)
        lib.devias_export_index(
            h,
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            kf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        with _INDEX_LOCK:
            if len(_INDEX_CACHE) >= _INDEX_CACHE_MAX:
                _INDEX_CACHE.pop(next(iter(_INDEX_CACHE)))
            _INDEX_CACHE[key] = (pts, kf)
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
