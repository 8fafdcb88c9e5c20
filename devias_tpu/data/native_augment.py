"""ctypes binding for the C++ host-augmentation core (native/augment_core).

Build: `make -C native` (produces native/libdevias_augment.so). When the
library is absent, data/fast_augment.py keeps its numpy/cv2 path — the
native core only changes speed (and brings the geometric ops CLOSER to
the PIL oracle: PIL Image.transform's a=-1.0 cubic kernel + its
fill-iff-source-out-of-range edge rule, vs cv2's a=-0.75 + fill-taps),
never semantics
(tests/test_native_augment.py pins native == python exactly for the
integer ops and within blend rounding for Color).

ref being replaced: the per-frame PIL loop at dataset/kinetics.py:239-298
via utils/transform/rand_augment.py (the repo's python fast path already
vectorized it; this moves the remaining per-clip hot ops to C++ —
VERDICT r3 item 3).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_SEARCHED = False
_HAS_SHARPNESS = False

_u8p = ctypes.POINTER(ctypes.c_uint8)
_u32p = ctypes.POINTER(ctypes.c_uint32)
_i32p = ctypes.POINTER(ctypes.c_int32)
_f64p = ctypes.POINTER(ctypes.c_double)


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "native", "libdevias_augment.so"),
        os.path.join(os.path.dirname(__file__), "libdevias_augment.so"),
        os.environ.get("DEVIAS_AUGMENT_LIB", ""),
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
    if os.environ.get("DEVIAS_NO_NATIVE_AUGMENT"):
        return None
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.devias_gray601.argtypes = [_u8p, _u8p, ctypes.c_int64]
    lib.devias_gray_mean.argtypes = [_u8p, ctypes.c_int64, ctypes.c_int64, _f64p]
    lib.devias_hist.argtypes = [_u8p, ctypes.c_int64, ctypes.c_int64, _u32p]
    lib.devias_lut.argtypes = [_u8p, _u8p, _u8p, ctypes.c_int64, ctypes.c_int64]
    lib.devias_color.argtypes = [_u8p, _u8p, ctypes.c_int64, ctypes.c_double]
    global _HAS_SHARPNESS
    try:  # older committed .so may predate the symbol
        lib.devias_sharpness.argtypes = [
            _u8p, _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double,
        ]
        _HAS_SHARPNESS = True
    except AttributeError:
        _HAS_SHARPNESS = False
    for f in (lib.devias_warp_x, lib.devias_warp_y):
        f.argtypes = [
            _u8p, _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_uint8, _i32p,
        ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _p(a: np.ndarray, typ):
    return a.ctypes.data_as(typ)


def _c(clip: np.ndarray) -> np.ndarray:
    assert clip.dtype == np.uint8 and clip.ndim == 4 and clip.shape[-1] == 3
    return np.ascontiguousarray(clip)


def gray601(clip: np.ndarray) -> np.ndarray:
    """[T,H,W,3] uint8 -> [T,H,W] truncating ITU-R 601-2 luma."""
    lib = _load()
    clip = _c(clip)
    out = np.empty(clip.shape[:-1], np.uint8)
    lib.devias_gray601(_p(clip, _u8p), _p(out, _u8p), clip.size // 3)
    return out


def gray_mean_per_frame(clip: np.ndarray) -> np.ndarray:
    lib = _load()
    clip = _c(clip)
    t = clip.shape[0]
    means = np.empty(t, np.float64)
    lib.devias_gray_mean(_p(clip, _u8p), t, clip[0].size // 3, _p(means, _f64p))
    return means


def hist_per_frame(clip: np.ndarray) -> np.ndarray:
    """-> [T, 3, 256] uint32 per-frame per-channel histograms."""
    lib = _load()
    clip = _c(clip)
    t = clip.shape[0]
    hist = np.empty((t, 3, 256), np.uint32)
    lib.devias_hist(_p(clip, _u8p), t, clip[0].size // 3, _p(hist, _u32p))
    return hist


def lut_per_frame(clip: np.ndarray, luts: np.ndarray) -> np.ndarray:
    """luts [T, 3, 256] uint8 applied per frame per channel."""
    lib = _load()
    clip = _c(clip)
    luts = np.ascontiguousarray(luts, np.uint8)
    out = np.empty_like(clip)
    lib.devias_lut(
        _p(clip, _u8p), _p(luts, _u8p), _p(out, _u8p),
        clip.shape[0], clip[0].size // 3,
    )
    return out


def has_sharpness() -> bool:
    return _load() is not None and _HAS_SHARPNESS


def sharpness_blend(clip: np.ndarray, f: float) -> np.ndarray:
    """Fused PIL Sharpness: blend(SMOOTH(clip), clip, f), exact Pillow
    semantics (truncating blend, floor(conv/13 + 0.5) filter, untouched
    1-px border)."""
    lib = _load()
    clip = _c(clip)
    t, h, w, _ = clip.shape
    out = np.empty_like(clip)
    lib.devias_sharpness(_p(clip, _u8p), _p(out, _u8p), t, h, w, float(f))
    return out


def color_blend(clip: np.ndarray, f: float) -> np.ndarray:
    """Fused PIL Color: blend(gray3(clip), clip, f)."""
    lib = _load()
    clip = _c(clip)
    out = np.empty_like(clip)
    lib.devias_color(_p(clip, _u8p), _p(out, _u8p), clip.size // 3, float(f))
    return out


def _interp_array(t: int, interp_flags) -> np.ndarray:
    """1 = cubic, 0 = linear, per frame."""
    return np.ascontiguousarray(np.asarray(interp_flags, np.int32))


def warp_x(clip: np.ndarray, shear: float, tx: float, fill: int,
           interp_flags) -> np.ndarray:
    """Inverse-map src_x = x + shear*y + tx (src_y = y)."""
    lib = _load()
    clip = _c(clip)
    t, h, w, _ = clip.shape
    out = np.empty_like(clip)
    lib.devias_warp_x(
        _p(clip, _u8p), _p(out, _u8p), t, h, w,
        float(shear), float(tx), fill, _p(_interp_array(t, interp_flags), _i32p),
    )
    return out


def warp_y(clip: np.ndarray, shear: float, ty: float, fill: int,
           interp_flags) -> np.ndarray:
    """Inverse-map src_y = y + shear*x + ty (src_x = x)."""
    lib = _load()
    clip = _c(clip)
    t, h, w, _ = clip.shape
    out = np.empty_like(clip)
    lib.devias_warp_y(
        _p(clip, _u8p), _p(out, _u8p), t, h, w,
        float(shear), float(ty), fill, _p(_interp_array(t, interp_flags), _i32p),
    )
    return out
