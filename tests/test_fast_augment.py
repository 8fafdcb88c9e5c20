"""Fast (numpy/cv2) RandAugment ops vs the PIL oracle, per op."""

import numpy as np
import pytest
from PIL import Image

from devias_tpu.data import fast_augment as fa
from devias_tpu.data import transforms as T


@pytest.fixture
def clip():
    rng = np.random.default_rng(0)
    # smooth-ish content (noise is the worst case for interpolation diffs)
    base = rng.integers(0, 256, size=(30, 40, 3), dtype=np.uint8)
    import cv2

    base = cv2.resize(base, (80, 60), interpolation=cv2.INTER_LINEAR)
    return np.stack([base, 255 - base])


def _pil_apply(clip, name, arg):
    out = np.empty_like(clip)
    for t in range(clip.shape[0]):
        out[t] = np.asarray(T._apply_op(Image.fromarray(clip[t]), name, arg))
    return out


POINT_OPS = [
    ("AutoContrast", None),
    ("Equalize", None),
    ("Invert", None),
    ("Posterize", 2),
    ("Solarize", 100),
    ("SolarizeAdd", 60),
    ("Brightness", 1.4),
    ("Brightness", 0.6),
    ("Color", 1.5),
    ("Contrast", 0.7),
]


@pytest.mark.parametrize("name,arg", POINT_OPS)
def test_point_ops_match_pil(clip, name, arg):
    fast = fa.apply_fast_op(clip, name, arg)
    ref = _pil_apply(clip, name, arg)
    # LUT/blend ops: exact up to 1-level rounding
    diff = np.abs(fast.astype(int) - ref.astype(int))
    assert diff.max() <= 1, (name, diff.max())


def test_sharpness_close_to_pil(clip):
    fast = fa.apply_fast_op(clip, "Sharpness", 1.6)
    ref = _pil_apply(clip, "Sharpness", 1.6)
    diff = np.abs(fast.astype(int) - ref.astype(int))
    assert np.quantile(diff, 0.99) <= 2, np.quantile(diff, 0.99)


GEO_OPS = [
    ("ShearX", 0.2),
    ("ShearY", -0.15),
    ("TranslateXRel", 0.2),
    ("TranslateYRel", -0.1),
    ("Rotate", 20.0),
]


@pytest.mark.parametrize("name,arg", GEO_OPS)
def test_geometric_ops_close_to_pil(clip, name, arg):
    fast = fa.apply_fast_op(clip, name, arg)
    ref = _pil_apply(clip, name, arg)
    # interpolation differences concentrate on edges; compare robustly
    diff = np.abs(fast.astype(int) - ref.astype(int))
    assert np.mean(diff) < 6, (name, np.mean(diff))
    assert np.quantile(diff, 0.9) <= 12, (name, np.quantile(diff, 0.9))


def test_full_fast_chain_shapes():
    rng = np.random.default_rng(1)
    clip = rng.integers(0, 256, size=(8, 120, 160, 3), dtype=np.uint8)
    out = T.train_augment(clip, crop_size=64, fast=True)
    assert out.shape == (8, 64, 64, 3) and out.dtype == np.float32
    out_slow = T.train_augment(clip, crop_size=64, fast=False)
    assert out_slow.shape == out.shape


def test_normalize_fused_matches_reference_formula():
    rng = np.random.default_rng(2)
    clip = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    got = T.normalize_clip(clip)
    want = (clip.astype(np.float32) / 255.0 - T.IMAGENET_MEAN) / T.IMAGENET_STD
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
