"""Golden RandomErasing (cube mode) parity vs the reference implementation
(ref utils/transform/random_erasing.py:109-150): with an identical pinned
random stream, the erased REGION must match exactly, and the fill must be
fresh gaussian noise per frame (not one box broadcast over time).
"""

import random
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.append("/root/repo/tests")
from _ref_oracle import load_reference

from devias_tpu.data.transforms import random_erase_clip

T, H, W, C = 4, 48, 40, 3


def test_erase_region_matches_reference():
    load_reference()
    from utils.transform.random_erasing import RandomErasing

    clip = np.zeros((T, H, W, C), np.float32)

    # reference: [T, C, H, W] frames tensor, cube=True default
    re = RandomErasing(
        probability=1.0, mode="pixel", max_count=1, num_splits=0,
        device="cpu", cube=True,
    )
    x = torch.zeros((T, C, H, W))
    random.seed(123)
    x = re(x)
    ref_mask = (x.abs().sum(dim=1) != 0).numpy()  # [T, H, W]

    random.seed(123)
    out = random_erase_clip(clip, prob=1.0, rng=random)
    our_mask = np.abs(out).sum(axis=-1) != 0

    assert ref_mask.any(), "reference erased nothing — bad pin"
    np.testing.assert_array_equal(our_mask, ref_mask)

    # fresh noise per frame (the reference's _get_pixels per frame):
    ys, xs = np.where(our_mask[0])
    y0, y1 = ys.min(), ys.max() + 1
    x0, x1 = xs.min(), xs.max() + 1
    assert not np.allclose(out[0, y0:y1, x0:x1], out[1, y0:y1, x0:x1])


def test_erase_prob_zero_identity():
    clip = np.ones((T, H, W, C), np.float32)
    out = random_erase_clip(clip, prob=0.0, rng=random.Random(0))
    np.testing.assert_array_equal(out, clip)
