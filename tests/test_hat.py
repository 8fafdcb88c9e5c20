"""HAT action-swap compositor tests against synthetic on-disk assets
(frame dirs + person masks + inpainted backgrounds + actionswap pickle,
the layout ref dataset/hat_decode.py expects)."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from devias_tpu.data.datasets import DataConfig
from devias_tpu.data.hat import HATDataset, composite_clip, load_hat_annotation


@pytest.fixture(scope="module")
def hat_assets(tmp_path_factory):
    """Kinetics-HAT layout: original/videos/<vid>/NNNNNN.jpg,
    seg/videos/<vid>/NNNNNN.png, inpaint/videos/<vid>/NNNNNN.jpg."""
    root = tmp_path_factory.mktemp("hat")
    data = root / "data"
    n_frames = 12
    H, W = 64, 80

    def write_video(name, color, person_box=None, bg=False):
        fdir = data / ("inpaint/videos" if bg else "original/videos") / name
        mdir = data / "seg/videos" / name
        fdir.mkdir(parents=True, exist_ok=True)
        mdir.mkdir(parents=True, exist_ok=True)
        for i in range(n_frames):
            frame = np.full((H, W, 3), color, np.uint8)
            mask = np.zeros((H, W), np.uint8)
            if person_box:
                y, x = person_box
                frame[y : y + 16, x : x + 12] = 255  # the "person"
                mask[y : y + 16, x : x + 12] = 255
            Image.fromarray(frame).save(fdir / f"{i+1:06d}.jpg", quality=95)
            Image.fromarray(mask).save(mdir / f"{i+1:06d}.png")

    # fg video: dark scene, person at (10, 20); bg video: bright inpainted
    # scene whose person mask is at (30, 40)
    write_video("fgvid.mp4", 30, person_box=(10, 20))
    write_video("bgvid.mp4", 200, person_box=(30, 40), bg=True)
    # bg video also needs seg masks at the same name (written above)

    anno_dir = root / "anno" / "hat"
    anno_dir.mkdir(parents=True)
    with open(root / "anno" / "labels.csv", "w") as f:
        f.write("0,classA\n1,classB\n")
    anno = {"classB/fgvid.mp4": ("x/bgvid.mp4", n_frames)}
    with open(anno_dir / "actionswap_far_1.pickle", "wb") as f:
        pickle.dump(anno, f)
    return {
        "anno": str(anno_dir / "actionswap_far_1.pickle"),
        "data": str(data),
        "n_frames": n_frames,
    }


def test_load_annotation(hat_assets):
    recs = load_hat_annotation(hat_assets["anno"], hat_assets["data"], "Kinetics-HAT")
    assert len(recs) == 1
    assert recs[0].label == 1  # classB
    assert recs[0].bg_len == hat_assets["n_frames"]
    assert os.path.isdir(recs[0].fg_frames)


def test_composite_pastes_person_onto_background(hat_assets):
    recs = load_hat_annotation(hat_assets["anno"], hat_assets["data"], "Kinetics-HAT")
    idx = np.asarray([0, 2, 4], np.int64)
    clip = composite_clip(recs[0], idx, "Kinetics-HAT", hat_assets["n_frames"])
    assert clip.shape == (3, 64, 80, 3)
    # background pixels come from the bright inpainted video
    assert clip[:, 0, 0].mean() > 150
    # the pasted person (white block) exists somewhere, displaced toward the
    # bg person's location (CoM alignment moves it from (10,20) to ~(30,40))
    white = (clip[0] > 240).all(axis=-1)
    ys, xs = np.nonzero(white)
    assert len(ys) > 50
    assert ys.mean() > 20 and xs.mean() > 30


def test_hat_dataset_modes(hat_assets):
    cfg = DataConfig(
        data_set="Kinetics-HAT",
        anno_path=hat_assets["anno"],
        data_prefix=hat_assets["data"],
        num_frames=4, sampling_rate=2, input_size=32, short_side_size=32,
        test_num_segment=2, test_num_crop=3,
    )
    for mode, expect_len in (("train", 1), ("validation", 1), ("test", 6)):
        ds = HATDataset(cfg, mode)
        assert len(ds) == expect_len
        s = ds[0]
        assert s["videos"].shape == (4, 32, 32, 3)
        assert int(s["labels"]) == 1
        if mode == "test":
            assert "chunk" in s and "split" in s


def test_hat_through_build_dataset(hat_assets):
    from devias_tpu.data import build_dataset

    cfg = DataConfig(
        data_set="Kinetics-HAT",
        anno_path=hat_assets["anno"],
        data_prefix=hat_assets["data"],
        nb_classes=2,
        num_frames=4, sampling_rate=2, input_size=32, short_side_size=32,
        test_num_segment=2, test_num_crop=1,
    )
    ds, nb = build_dataset(False, True, cfg)
    assert nb == 2 and len(ds) == 2


def test_composite_matches_reference_compositor(hat_assets):
    """Import-oracle: the reference's own VideoHATDataset.loadvideo_frame
    (ref dataset/hat_decode.py:302-380) over the SAME on-disk assets must
    produce pixel-identical composites (same-size fg/bg assets make its
    short-side Resize an identity, isolating the sampling + CoM alignment +
    threshold + paste logic)."""
    import sys
    import types

    sys.path.append(os.path.dirname(__file__))
    from _ref_oracle import load_reference

    load_reference()
    from dataset import hat_decode as ref_hat

    recs = load_hat_annotation(hat_assets["anno"], hat_assets["data"], "Kinetics-HAT")
    rec = recs[0]
    n = hat_assets["n_frames"]
    clip_len, rate = 4, 2

    self = types.SimpleNamespace(clip_len=clip_len, frame_sample_rate=rate, num_segment=1)
    draws = []
    orig_randint = np.random.randint

    def recording(*a, **k):
        v = orig_randint(*a, **k)
        draws.append(int(v))
        return v

    np.random.seed(21)
    np.random.randint = recording
    try:
        ref_clip = ref_hat.VideoHATDataset.loadvideo_frame(
            self, rec.fg_frames, n, rec.bg_len, rec.fg_masks, rec.bg_inpaint,
            dataset="HAT-frame",
        )
    finally:
        np.random.randint = orig_randint

    from devias_tpu.data.samplers import train_window_indices

    class _Replay:
        def __init__(self, d):
            self.d = list(d)

        def integers(self, lo, hi=None, size=None):
            return self.d.pop(0)

    idx = train_window_indices(n, clip_len, rate, rng=_Replay(draws))
    ours = composite_clip(rec, idx, "Kinetics-HAT", n)
    assert ref_clip.shape == ours.shape
    np.testing.assert_array_equal(ours, ref_clip)
