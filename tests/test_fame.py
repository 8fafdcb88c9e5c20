"""FAME augmentation tests (ref: utils/transform/fame.py, fame_hvu.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from devias_tpu.aug import FAMEConfig, fame_augment, fame_augment_hvu
from devias_tpu.aug.fame import (
    _gaussian_blur,
    _minmax_norm,
    _rgb_to_hsv,
    compute_fame_masks,
)


def _batch(rng, B=2, T=8, HW=64):
    v = rng.normal(size=(B, T, HW, HW, 3)).astype(np.float32)
    return jnp.asarray(v)


def test_fame_shapes_and_mask_budget():
    rng = np.random.default_rng(0)
    videos = _batch(rng)
    labels = jnp.arange(2)
    cfg = FAMEConfig(beta=0.5, prob_aug=0.5, patch_size=16, exact_topk=True)
    out_videos, out_labels, (fg, fg_pf) = fame_augment(
        jax.random.PRNGKey(0), videos, labels, cfg
    )
    assert out_videos.shape == videos.shape
    assert fg.shape == (2, (64 // 16) ** 2)
    assert fg_pf.shape == (2, 4 * (64 // 16) ** 2)
    # binarized mask covers exactly beta of the pixels -> pooled mean = beta
    np.testing.assert_allclose(np.asarray(fg).mean(axis=1), 0.5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fg_pf).mean(axis=1), 0.5, atol=1e-5)
    assert fg.min() >= 0 and fg.max() <= 1


def test_fame_mix_preserves_foreground():
    """Foreground pixels must come from the original clip, background from
    the donor (ref fame.py:122-123)."""
    rng = np.random.default_rng(1)
    videos = _batch(rng)
    cfg = FAMEConfig(beta=0.3, prob_aug=1.0, exact_topk=True)
    key = jax.random.PRNGKey(3)
    mean = jnp.zeros(3)
    std = jnp.ones(3)
    mask, _ = compute_fame_masks(videos, cfg)
    out_videos, _, _ = fame_augment(key, videos, jnp.arange(2), cfg, mean, std)
    perm = jax.random.permutation(jax.random.split(key)[0], 2)
    m = np.asarray(mask)[:, None, :, :, None]
    want = np.asarray(videos)[np.asarray(perm)] * (1 - m) + np.asarray(videos) * m
    np.testing.assert_allclose(np.asarray(out_videos), want, atol=1e-5)


def test_fame_prob_zero_is_identity_on_videos():
    rng = np.random.default_rng(2)
    videos = _batch(rng)
    cfg = FAMEConfig(prob_aug=0.0)
    out_videos, _, (fg, _) = fame_augment(jax.random.PRNGKey(0), videos, jnp.arange(2), cfg)
    np.testing.assert_allclose(np.asarray(out_videos), np.asarray(videos))
    # masks are still produced for supervision (ref keeps masks for all)
    assert float(fg.sum()) > 0


def test_fame_hvu_scene_label_swap():
    rng = np.random.default_rng(3)
    videos = _batch(rng, B=4)
    action = jnp.arange(4)
    scene = jnp.asarray([10, 11, 12, 13])
    cfg = FAMEConfig(prob_aug=0.9)
    key = jax.random.PRNGKey(1)
    _, a_out, s_out, _ = fame_augment_hvu(key, videos, action, scene, cfg)
    np.testing.assert_array_equal(np.asarray(a_out), np.asarray(action))
    # every output scene label is either own or donor's
    s = np.asarray(s_out)
    assert set(s.tolist()) <= set(scene.tolist())
    # quirk: prob_aug >= 1 does NOT swap labels
    _, _, s_noswap, _ = fame_augment_hvu(key, videos, action, scene, FAMEConfig(prob_aug=1.0))
    np.testing.assert_array_equal(np.asarray(s_noswap), np.asarray(scene))


def test_gaussian_blur_matches_scipy_reflect():
    from scipy.ndimage import correlate1d

    rng = np.random.default_rng(4)
    img = rng.normal(size=(2, 32, 32)).astype(np.float32)
    size, sigma = 11, 11 / 3
    out = np.asarray(_gaussian_blur(jnp.asarray(img), size, sigma))
    x = np.arange(size) - (size - 1) / 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = (k / k.sum()).astype(np.float32)
    ref = correlate1d(img, k, axis=1, mode="mirror")
    ref = correlate1d(ref, k, axis=2, mode="mirror")
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_rgb_to_hsv_matches_opencv():
    import cv2

    rng = np.random.default_rng(5)
    img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    h, s, v = _rgb_to_hsv(jnp.asarray(img[None]))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)  # H in [0,360)
    np.testing.assert_allclose(np.asarray(h[0]) * 360, ref[..., 0], atol=0.5)
    np.testing.assert_allclose(np.asarray(s[0]), ref[..., 1], atol=1e-3)
    np.testing.assert_allclose(np.asarray(v[0]), ref[..., 2], atol=1e-5)


def test_minmax_norm_range():
    rng = np.random.default_rng(6)
    m = jnp.asarray(rng.normal(size=(3, 8, 8)).astype(np.float32))
    out = np.asarray(_minmax_norm(m))
    assert out.min() >= 0 and out.max() <= 1
    np.testing.assert_allclose(out.reshape(3, -1).max(1), 1, atol=1e-5)


def test_fame_under_jit():
    rng = np.random.default_rng(7)
    videos = _batch(rng)
    cfg = FAMEConfig()
    f = jax.jit(lambda k, v, l: fame_augment(k, v, l, cfg))
    out_videos, _, (fg, fg_pf) = f(jax.random.PRNGKey(0), videos, jnp.arange(2))
    assert out_videos.shape == videos.shape
    assert np.isfinite(np.asarray(fg)).all()


def test_fast_quantile_mask_close_to_exact():
    """The histogram-quantile fast path must select (almost) the same
    pixels as the exact top-k path."""
    rng = np.random.default_rng(10)
    videos = _batch(rng, B=2, T=8, HW=64)
    exact, _ = compute_fame_masks(videos, FAMEConfig(beta=0.4, exact_topk=True))
    fast, _ = compute_fame_masks(videos, FAMEConfig(beta=0.4, exact_topk=False))
    exact, fast = np.asarray(exact), np.asarray(fast)
    # areas within 2% of budget, overlap (IoU) high
    assert abs(fast.mean() - 0.4) < 0.02
    inter = (exact * fast).sum()
    union = ((exact + fast) > 0).sum()
    assert inter / union > 0.9, inter / union


def test_fast_mask_area_budget():
    rng = np.random.default_rng(11)
    videos = _batch(rng, B=3, T=8, HW=64)
    for beta in (0.25, 0.5):
        mask, per = compute_fame_masks(videos, FAMEConfig(beta=beta))
        assert abs(float(np.asarray(mask).mean()) - beta) < 0.02
        assert abs(float(np.asarray(per).mean()) - beta) < 0.02
