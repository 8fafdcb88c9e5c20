"""Native C++ FFmpeg decode core tests (skipped when the .so isn't built;
`make -C native` builds it)."""

import os

import numpy as np
import pytest

from devias_tpu.data import native_decode as nd

pytestmark = pytest.mark.skipif(not nd.available(), reason="libdevias_decode.so not built")


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48))
    frames = []
    for i in range(40):
        f = np.full((48, 64, 3), (i * 6) % 250, np.uint8)
        frames.append(f)
        w.write(f)
    w.release()
    return path, frames


def test_open_count_close(video):
    path, frames = video
    h = nd.open(path)
    assert nd.num_frames(h) == 40
    assert nd.frame_size(h) == (48, 64)
    nd.close(h)


def test_get_batch_content_and_order(video):
    path, frames = video
    h = nd.open(path)
    idx = np.asarray([7, 0, 39, 7, 21], np.int64)
    out = nd.get_batch(h, idx)
    assert out.shape == (5, 48, 64, 3)
    for j, i in enumerate(idx):
        got = int(out[j, 24, 32].mean())
        want = int(frames[int(i)][24, 32].mean())
        assert abs(got - want) < 14, (i, got, want)  # lossy codec tolerance
    nd.close(h)


def test_out_of_range_indices_clamped(video):
    path, _ = video
    h = nd.open(path)
    out = nd.get_batch(h, np.asarray([1000, -5], np.int64))
    assert out.shape == (2, 48, 64, 3)
    nd.close(h)


def test_open_missing_file():
    with pytest.raises(RuntimeError):
        nd.open("/nonexistent/file.mp4")


def test_pipeline_prefers_native(video):
    from devias_tpu.data.video_reader import NativeVideoReader, open_video

    path, _ = video
    r = open_video(path)
    assert isinstance(r, NativeVideoReader)
    assert len(r) == 40
    r.close()


def test_index_cache_roundtrip(video):
    """Second open of an unchanged file takes the cached-index path
    (devias_open_cached) and decodes identical frames."""
    path, _ = video
    if not nd._HAS_INDEX_CACHE:
        pytest.skip("libdevias_decode.so predates devias_open_cached")
    nd._INDEX_CACHE.clear()
    idx = np.asarray([3, 17, 0, 39], np.int64)
    h1 = nd.open(path)          # scanning open, populates the cache
    ref = nd.get_batch(h1, idx)
    nd.close(h1)
    key = nd._cache_key(path)
    assert key in nd._INDEX_CACHE
    pts, kf = nd._INDEX_CACHE[key]
    assert len(pts) == 40 and kf[0] == 1  # first frame is a keyframe
    h2 = nd.open(path)          # cached open (no packet scan)
    got = nd.get_batch(h2, idx)
    nd.close(h2)
    np.testing.assert_array_equal(got, ref)


def test_index_cache_stale_file_refreshes(video, tmp_path):
    """A changed file (different mtime/size) misses the cache and decodes
    correctly via a fresh scan."""
    import shutil
    import cv2

    path, _ = video
    if not nd._HAS_INDEX_CACHE:
        pytest.skip("libdevias_decode.so predates devias_open_cached")
    p2 = str(tmp_path / "clip2.mp4")
    shutil.copy(path, p2)
    h = nd.open(p2)
    assert nd.num_frames(h) == 40
    nd.close(h)
    # rewrite with fewer frames: new (mtime, size) key -> fresh scan
    w = cv2.VideoWriter(p2, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48))
    for i in range(10):
        w.write(np.full((48, 64, 3), (i * 6) % 250, np.uint8))
    w.release()
    h = nd.open(p2)
    assert nd.num_frames(h) == 10
    nd.close(h)
