"""Frame-sampling index parity vs the ACTUAL reference dataset code.

The sampling indices decide which pixels every train step and every
evaluation view sees — a one-frame drift silently changes all accuracies.
This oracle calls the reference's own `VideoClsDataset.loadvideo_decord`
(ref dataset/kinetics.py:300-352) on a duck-typed `self` with a fake
VideoReader that records the requested indices, records its np.random
draws, and replays the identical draws through the repo samplers — the
index arrays must match EXACTLY (including the degenerate short-video
branches and the test-mode stride padding).

SSv2 TSN indices are pinned the same way against dataset/ssv2.py:238-259.
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _ref_oracle import load_reference  # noqa: E402
from devias_tpu.data.samplers import (  # noqa: E402
    test_stride_indices as stride_indices,
    train_window_indices,
    tsn_test_indices,
    tsn_train_indices,
)

load_reference()

from dataset import kinetics as ref_kinetics  # noqa: E402


class _FakeVR:
    """Stands in for decord.VideoReader inside loadvideo_decord: fixed
    length, records the get_batch index list."""

    length = 0
    last_indices = None

    def __init__(self, fname, num_threads=1, ctx=None, width=None, height=None):
        pass

    def __len__(self):
        return _FakeVR.length

    def seek(self, i):
        pass

    def get_batch(self, indices):
        _FakeVR.last_indices = np.asarray(list(indices), np.int64)

        class _B:
            def asnumpy(self_b):
                return np.zeros((len(indices), 4, 4, 3), np.uint8)

        return _B()


class _ReplayRng:
    """Feeds the reference's recorded np.random.randint draws to the repo
    sampler's rng.integers calls."""

    def __init__(self, draws):
        self.draws = list(draws)

    def integers(self, low, high=None, size=None):
        return self.draws.pop(0)


def _ref_train_indices(num_video_frames, clip_len, rate, num_segment, seed):
    self = types.SimpleNamespace(
        mode="train", clip_len=clip_len, frame_sample_rate=rate,
        num_segment=num_segment, keep_aspect_ratio=True,
    )
    _FakeVR.length = num_video_frames
    draws = []
    orig_randint = np.random.randint

    def recording_randint(*a, **k):
        v = orig_randint(*a, **k)
        draws.append(int(v))
        return v

    orig_vr, orig_exists, orig_size = (
        ref_kinetics.VideoReader, ref_kinetics.os.path.exists,
        ref_kinetics.os.path.getsize,
    )
    orig_cpu = ref_kinetics.cpu
    ref_kinetics.cpu = lambda i: None
    ref_kinetics.VideoReader = _FakeVR
    ref_kinetics.os.path.exists = lambda p: True
    ref_kinetics.os.path.getsize = lambda p: 1 << 20
    np.random.seed(seed)
    np.random.randint = recording_randint
    try:
        buf = ref_kinetics.VideoClsDataset.loadvideo_decord(self, "fake.mp4")
        assert len(buf) > 0
    finally:
        np.random.randint = orig_randint
        ref_kinetics.VideoReader = orig_vr
        ref_kinetics.cpu = orig_cpu
        ref_kinetics.os.path.exists = orig_exists
        ref_kinetics.os.path.getsize = orig_size
    return _FakeVR.last_indices, draws


@pytest.mark.parametrize(
    "frames,clip_len,rate,num_segment",
    [
        (300, 16, 4, 1),   # long video, random window
        (70, 16, 4, 1),    # seg_len just above converted_len
        (40, 16, 4, 1),    # short: linspace+pad branch
        (3, 16, 4, 1),     # degenerate: seg_len < rate (empty linspace)
        (250, 16, 4, 2),   # two temporal segments
    ],
)
def test_train_window_indices_match_reference(frames, clip_len, rate, num_segment):
    ref_idx, draws = _ref_train_indices(frames, clip_len, rate, num_segment, seed=11)
    ours = train_window_indices(
        frames, clip_len, rate, num_segment=num_segment, rng=_ReplayRng(draws)
    )
    np.testing.assert_array_equal(ours, ref_idx)


@pytest.mark.parametrize("frames", [200, 63, 10])
def test_test_stride_indices_match_reference(frames):
    self = types.SimpleNamespace(
        mode="test", clip_len=16, frame_sample_rate=4,
        num_segment=1, keep_aspect_ratio=True,
    )
    _FakeVR.length = frames
    orig_vr = ref_kinetics.VideoReader
    orig_cpu = ref_kinetics.cpu
    orig_exists = ref_kinetics.os.path.exists
    orig_size = ref_kinetics.os.path.getsize
    ref_kinetics.cpu = lambda i: None
    ref_kinetics.VideoReader = _FakeVR
    ref_kinetics.os.path.exists = lambda p: True
    ref_kinetics.os.path.getsize = lambda p: 1 << 20
    try:
        ref_kinetics.VideoClsDataset.loadvideo_decord(self, "fake.mp4")
    finally:
        ref_kinetics.VideoReader = orig_vr
        ref_kinetics.cpu = orig_cpu
        ref_kinetics.os.path.exists = orig_exists
        ref_kinetics.os.path.getsize = orig_size
    ours = stride_indices(frames, 16, 4)
    np.testing.assert_array_equal(ours, _FakeVR.last_indices)


def _ref_ssv2_indices(mode, frames, num_segment, test_num_segment=2, seed=3):
    from dataset import ssv2 as ref_ssv2

    self = types.SimpleNamespace(
        mode=mode, num_segment=num_segment, test_num_segment=test_num_segment,
        keep_aspect_ratio=True,
    )
    _FakeVR.length = frames
    draws = []
    orig_randint = np.random.randint

    def recording_randint(*a, **k):
        v = orig_randint(*a, **k)
        draws.append(v)
        return v

    saved = (ref_ssv2.VideoReader, ref_ssv2.cpu,
             ref_ssv2.os.path.exists, ref_ssv2.os.path.getsize)
    ref_ssv2.VideoReader = _FakeVR
    ref_ssv2.cpu = lambda i: None
    ref_ssv2.os.path.exists = lambda p: True
    ref_ssv2.os.path.getsize = lambda p: 1 << 20
    np.random.seed(seed)
    np.random.randint = recording_randint
    try:
        ref_ssv2.SSVideoClsDataset.loadvideo_decord(self, "fake.mp4")
    finally:
        np.random.randint = orig_randint
        (ref_ssv2.VideoReader, ref_ssv2.cpu, ref_ssv2.os.path.exists,
         ref_ssv2.os.path.getsize) = saved
    return _FakeVR.last_indices, draws


@pytest.mark.parametrize("frames", [100, 37, 16, 9])
def test_tsn_train_indices_match_reference(frames):
    ref_idx, draws = _ref_ssv2_indices("train", frames, num_segment=16)
    ours = tsn_train_indices(frames, 16, rng=_ReplayRng(draws))
    np.testing.assert_array_equal(ours, ref_idx)


@pytest.mark.parametrize("frames", [100, 37, 16])
def test_tsn_test_indices_match_reference(frames):
    ref_idx, _ = _ref_ssv2_indices("test", frames, num_segment=16)
    ours = tsn_test_indices(frames, 16, test_num_segment=2)
    np.testing.assert_array_equal(ours, ref_idx)


@pytest.mark.parametrize(
    "frames,start,end,duration",
    [
        (400, 5.0, 60.0, 100.0),   # normal segment, avg>0 branch
        (100, 10.0, 14.0, 100.0),  # length < num_segment: arange % length quirk
        (100, 50.0, 50.5, 100.0),  # degenerate: length clamped to 1
        (200, 0.0, 250.0, 100.0),  # end beyond duration -> ratio capped at 1
    ],
)
def test_activitynet_indices_match_reference(frames, start, end, duration):
    from dataset import activitynet as ref_anet
    from devias_tpu.data.samplers import activitynet_indices

    cls = None
    for name in dir(ref_anet):
        obj = getattr(ref_anet, name)
        if isinstance(obj, type) and hasattr(obj, "loadvideo_decord"):
            cls = obj
            break
    assert cls is not None, "no dataset class with loadvideo_decord in reference"

    self = types.SimpleNamespace(num_segment=16, keep_aspect_ratio=True,
                                 data_path="")
    _FakeVR.length = frames
    _FakeVR.last_indices = None
    draws = []
    orig_randint = np.random.randint

    def recording(*a, **k):
        v = orig_randint(*a, **k)
        draws.append(v)
        return v

    saved = (ref_anet.VideoReader, ref_anet.cpu,
             ref_anet.os.path.exists, ref_anet.os.path.getsize)
    ref_anet.VideoReader = _FakeVR
    ref_anet.cpu = lambda i: None
    ref_anet.os.path.exists = lambda p: True
    ref_anet.os.path.getsize = lambda p: 1 << 20
    start_ratio = round(float(start) / float(duration), 5)
    end_ratio = min(round(float(end) / float(duration), 5), 1.0)
    np.random.seed(7)
    np.random.randint = recording
    try:
        cls.loadvideo_decord(self, "fake.mp4", start_ratio, end_ratio)
    finally:
        np.random.randint = orig_randint
        (ref_anet.VideoReader, ref_anet.cpu, ref_anet.os.path.exists,
         ref_anet.os.path.getsize) = saved

    ours = activitynet_indices(frames, start, end, duration, 16, rng=_ReplayRng(draws))
    np.testing.assert_array_equal(ours, _FakeVR.last_indices)


@pytest.mark.parametrize(
    "base,final,epochs,niter,warmup_epochs,warmup_steps,start",
    [
        (1e-3, 1e-5, 5, 20, 1, -1, 0.0),    # epoch-derived warmup
        (1e-3, 1e-5, 5, 20, 1, 7, 0.0),     # warmup_steps override
        (1e-3, 1e-6, 3, 50, 0, -1, 0.0),    # no warmup
        (0.05, 0.02, 4, 25, 0, -1, 0.0),    # wd-style schedule
        (5e-4, 1e-6, 2, 10, 1, 3, 1e-6),    # nonzero warmup start
    ],
)
def test_cosine_schedule_matches_reference_array(
    base, final, epochs, niter, warmup_epochs, warmup_steps, start
):
    """Direct array equality vs the reference cosine_scheduler (ref
    utils/utils.py:422-439) — the trajectory goldens pin it through the
    engines for one config; this sweeps the flag combinations."""
    from utils import utils as ref_utils

    from devias_tpu.core.schedules import cosine_schedule

    ref = ref_utils.cosine_scheduler(
        base, final, epochs, niter, warmup_epochs=warmup_epochs,
        start_warmup_value=start, warmup_steps=warmup_steps,
    )
    total = epochs * niter
    warm = warmup_steps if warmup_steps > 0 else warmup_epochs * niter
    if warmup_epochs <= 0:
        warm = 0
    fn = cosine_schedule(base, final, total, warmup_steps=warm, warmup_start=start)
    ours = np.asarray([float(fn(s)) for s in range(total)])
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)
