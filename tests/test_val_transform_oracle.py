"""Golden parity of the DETERMINISTIC validation/test preprocessing chain
vs the reference (ref dataset/kinetics.py:80-86: Resize(short-side,
bilinear) -> CenterCrop -> ClipToTensor -> Normalize). This chain decides
evaluation parity — any resize-rounding or normalization difference shifts
every reported accuracy.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.append("/root/repo/tests")
from _ref_oracle import load_reference

from devias_tpu.data.transforms import val_transform


# (100, 240): truncated long side (537.6 -> 537, not 538)
# (100, 239): odd crop margin (535 - 224 = 311 -> round-half-even offset 156)
@pytest.mark.parametrize(
    "hw", [(128, 160), (160, 128), (224, 224), (100, 240), (100, 239)]
)
def test_val_chain_matches_reference(hw):
    load_reference()
    from utils.transform import video_transforms, volume_transforms

    H, W = hw
    rng = np.random.default_rng(0)
    clip = rng.integers(0, 256, size=(4, H, W, 3), dtype=np.uint8)

    ref_t = video_transforms.Compose([
        video_transforms.Resize(224, interpolation="bilinear"),
        video_transforms.CenterCrop(size=(224, 224)),
        volume_transforms.ClipToTensor(),
        video_transforms.Normalize(mean=[0.485, 0.456, 0.406],
                                   std=[0.229, 0.224, 0.225]),
    ])
    ref = ref_t([clip[t] for t in range(clip.shape[0])])  # [C, T, H, W]
    ref = ref.permute(1, 2, 3, 0).numpy()  # [T, H, W, C]

    ours = val_transform(clip, short_side=224, crop_size=224, host_normalize=True)

    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    diff = np.abs(ours - ref)
    # identical up to the resize backend's rounding (cv2 vs PIL bilinear
    # agree to ~1/255 on uint8 inputs)
    assert diff.max() <= 6.0 / 255.0 / 0.225, diff.max()
    assert np.mean(diff > 1e-6) < 0.9  # sanity: mostly tiny, not systematic
    np.testing.assert_allclose(ours.mean(), ref.mean(), atol=2e-3)
