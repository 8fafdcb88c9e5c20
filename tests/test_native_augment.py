"""Native host-augmentation core (native/augment_core.cpp) parity vs the
python/cv2 fast path, and the dispatch plumbing.

The native core must never change semantics: integer ops (AutoContrast,
Equalize, Contrast LUTs) are EXACTLY the python math; Color differs only
in blend rounding (<=1 level, same bound the python path has vs PIL); the
1-D warps replace cv2's a=-0.75 bicubic with PIL Image.transform's a=-1.0
kernel and PIL's fill-iff-source-out-of-range edge rule — their
PIL-closeness is asserted directly (tighter than the cv2 path's own
tolerance test in test_randaugment_oracle.py).

Skipped wholesale when the library isn't built (`make -C native`).
"""

import os
import random

import numpy as np
import pytest

from devias_tpu.data import fast_augment as FA
from devias_tpu.data import native_augment as NA

pytestmark = pytest.mark.skipif(
    not NA.available(), reason="libdevias_augment.so not built"
)


@pytest.fixture
def clip():
    rng = np.random.default_rng(0)
    return np.ascontiguousarray(
        rng.integers(0, 255, size=(6, 96, 128, 3)).astype(np.uint8)
    )


def _python_path(fn, *args, **kw):
    """Run the same op with the native core disabled."""
    os.environ["DEVIAS_NO_NATIVE_AUGMENT"] = "1"
    NA._SEARCHED, NA._LIB = False, None
    try:
        return fn(*args, **kw)
    finally:
        del os.environ["DEVIAS_NO_NATIVE_AUGMENT"]
        NA._SEARCHED, NA._LIB = False, None


def test_gray601_matches_numpy(clip):
    ours = NA.gray601(clip)
    c = clip.astype(np.uint32)
    ref = ((c[..., 0] * 299 + c[..., 1] * 587 + c[..., 2] * 114) // 1000).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("name,arg", [
    ("AutoContrast", None), ("Equalize", None),
    ("Contrast", 1.63), ("Contrast", 0.4),
])
def test_integer_ops_exact(clip, name, arg):
    nat = FA.apply_fast_op(clip, name, arg)
    py = _python_path(FA.apply_fast_op, clip, name, arg)
    np.testing.assert_array_equal(nat, py, err_msg=name)


def test_integer_ops_exact_degenerate():
    """Constant frames hit the identity-LUT branches of autocontrast and
    equalize (hi <= lo / step == 0)."""
    flat = np.full((2, 16, 16, 3), 7, np.uint8)
    for name in ("AutoContrast", "Equalize"):
        nat = FA.apply_fast_op(flat, name, None)
        py = _python_path(FA.apply_fast_op, flat, name, None)
        np.testing.assert_array_equal(nat, py, err_msg=name)


def test_color_within_blend_rounding(clip):
    for f in (0.3, 0.7, 1.4):
        nat = FA.apply_fast_op(clip, "Color", f)
        py = _python_path(FA.apply_fast_op, clip, "Color", f)
        d = np.abs(nat.astype(int) - py.astype(int))
        assert d.max() <= 1, (f, d.max())


def test_sharpness_exact_vs_pil(clip):
    """The fused native Sharpness matches Pillow EXACTLY (the cv2 fast
    path is only within q99<=2: addWeighted rounds where PIL truncates).
    Covers interpolation (f<1), identity, and extrapolation (f>1) blends,
    plus a tiny frame where the whole image is untouched border."""
    from PIL import Image, ImageEnhance

    if not NA.has_sharpness():
        pytest.skip("libdevias_augment.so predates devias_sharpness")
    for f in (0.0, 0.4, 1.0, 1.05, 1.6, 1.9):
        nat = NA.sharpness_blend(clip, f)
        pil = np.stack([
            np.asarray(ImageEnhance.Sharpness(Image.fromarray(fr)).enhance(f))
            for fr in clip
        ])
        np.testing.assert_array_equal(nat, pil, err_msg=str(f))
    tiny = np.ascontiguousarray(clip[:2, :2, :5])
    nat = NA.sharpness_blend(tiny, 1.6)
    np.testing.assert_array_equal(nat, tiny)


@pytest.mark.parametrize("name,arg", [
    ("ShearX", 0.2), ("ShearY", -0.2),
    ("TranslateXRel", 0.15), ("TranslateYRel", -0.15),
])
@pytest.mark.parametrize("interp", ["bicubic", "bilinear"])
def test_warps_track_pil(name, arg, interp):
    """The native 1-D warps vs the per-frame PIL oracle on a smooth image
    (same setup as the cv2-path tolerance test, but tighter: native uses
    PIL's own a=-1.0 kernel and edge rule)."""
    from PIL import Image

    from devias_tpu.data import transforms as T

    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    smooth = np.stack(
        [128 + 100 * np.sin(xx / 9 + c) * np.cos(yy / 7 - c) for c in range(3)],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)
    sclip = np.ascontiguousarray(np.tile(smooth, (4, 1, 1, 1)))

    nat = FA.apply_fast_op(sclip, name, arg, interpolation=interp)
    resample = Image.BICUBIC if interp == "bicubic" else Image.BILINEAR
    pil = np.stack([
        np.asarray(T._apply_op(Image.fromarray(sclip[t]), name, arg, resample))
        for t in range(4)
    ])
    d = np.abs(nat[:, 8:-8, 8:-8].astype(int) - pil[:, 8:-8, 8:-8].astype(int))
    assert np.quantile(d, 0.99) <= 6, (name, interp, np.quantile(d, 0.99))
    assert d.mean() <= 1.0, (name, interp, d.mean())


def test_warp_fill_and_bounds():
    """Large translate: vacated region is the grey fill, no OOB reads."""
    clip = np.full((2, 32, 48, 3), 200, np.uint8)
    out = FA.apply_fast_op(clip, "TranslateXRel", 0.5, interpolation="bicubic")
    assert out.shape == clip.shape
    # src_x = x + 24: right half pulls from in-range, left edge... the
    # columns whose source is past the image are pure fill
    assert (out[:, :, -8:] == 128).all()
    out = FA.apply_fast_op(clip, "TranslateYRel", -0.5, interpolation="bilinear")
    assert (out[:, :8] == 128).all()


def test_random_interp_stream_parity(clip):
    """'random' interpolation consumes the SAME rng draws as the cv2 path
    (one choice per frame), keeping aug streams reproducible across the
    native/python dispatch."""
    r1, r2 = random.Random(5), random.Random(5)
    FA.apply_fast_op(clip, "ShearX", 0.2, interpolation="random", rng=r1)
    _python_path(
        FA.apply_fast_op, clip, "ShearX", 0.2, interpolation="random", rng=r2
    )
    assert r1.getstate() == r2.getstate()
