"""FAME parity vs the actual reference implementation
(ref: utils/transform/fame.py, run with the kornia shim from _ref_oracle —
h in [0, 2*pi], the convention of every kornia the reference could have
installed).

Asserts, at full per-tubelet resolution (the default config):
  * clip-level binary mixing mask: IoU vs reference > 0.999
  * per-tubelet masks: IoU > 0.999
  * pooled distill targets (fg_mask [B,196], fg_masks_per_frames [B,1568]):
    max |delta| <= 0.005 (one 16x16-cell pixel flip from fp ties)
and quantifies the documented tubelet_mask_downsample=4 fast mode as an
approximation (boundary cells shift), which is why it is NOT the default.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _ref_oracle import load_reference  # noqa: E402

load_reference()

from utils.transform import fame as ref_fame  # noqa: E402

from devias_tpu.aug.fame import (  # noqa: E402
    FAMEConfig,
    IMAGENET_MEAN,
    IMAGENET_STD,
    compute_fame_masks,
)


def synth_video(B=2, T=16, H=224, W=224, seed=0):
    """Moving colored blobs over textured static backgrounds — exercises
    saliency, the color histogram refinement, and the static-background
    tie mass."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    vids = np.zeros((B, T, H, W, 3), np.float32)
    for b in range(B):
        bg = rng.uniform(0.2, 0.8, size=(3,)).astype(np.float32)
        tex = rng.normal(0, 0.05, size=(H, W, 1)).astype(np.float32)
        base = np.clip(bg + tex, 0, 1)
        cx0, cy0 = rng.uniform(60, 160, 2)
        vx, vy = rng.uniform(-4, 4, 2)
        col = rng.uniform(0, 1, size=(3,)).astype(np.float32)
        for t in range(T):
            cx, cy = cx0 + vx * t, cy0 + vy * t
            blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 30.0**2)))[..., None]
            vids[b, t] = np.clip(
                base * (1 - blob) + col * blob + rng.normal(0, 0.01, size=(H, W, 3)), 0, 1
            )
    return vids


def _iou(a, b):
    a = a > 0.5
    b = b > 0.5
    return (a & b).sum() / max((a | b).sum(), 1)


@pytest.fixture(scope="module")
def oracle():
    vids = synth_video()
    B, T, H, W, _ = vids.shape
    mean = np.array(IMAGENET_MEAN, np.float32)
    std = np.array(IMAGENET_STD, np.float32)

    fm = ref_fame.FAME(beta=0.5, prob_aug=1.0)
    denorm_t = torch.from_numpy(vids.transpose(0, 4, 1, 2, 3))
    with torch.no_grad():
        ref_mask = fm.getmask(denorm_t).numpy()
        ref_per = torch.stack(fm.getmask_per_frame(denorm_t)).permute(1, 0, 2, 3).numpy()
    import torch.nn.functional as TF

    ref_fg = TF.avg_pool2d(torch.from_numpy(ref_mask), 16, 16).reshape(B, -1).numpy()
    ref_pf = TF.avg_pool2d(torch.from_numpy(ref_per), 16, 16).reshape(B, -1).numpy()
    return vids, ref_mask, ref_per, ref_fg, ref_pf


def _ours(vids, ds, exact=True):
    B, T, H, W, _ = vids.shape
    cfg = FAMEConfig(beta=0.5, prob_aug=1.0, tubelet_mask_downsample=ds, exact_topk=exact)
    mask, per = jax.jit(lambda v: compute_fame_masks(v, cfg))(jnp.asarray(vids))
    mask, per = np.asarray(mask), np.asarray(per)
    fg = mask.reshape(B, 14, 16, 14, 16).mean(axis=(2, 4)).reshape(B, -1)
    pool = per.shape[-1] // 14
    pf = per.reshape(B, T // 2, 14, pool, 14, pool).mean(axis=(3, 5)).reshape(B, -1)
    return mask, per, fg, pf


def test_fame_full_res_parity(oracle):
    vids, ref_mask, ref_per, ref_fg, ref_pf = oracle
    mask, per, fg, pf = _ours(vids, ds=1, exact=True)
    assert _iou(mask, ref_mask) > 0.999
    assert _iou(per, ref_per) > 0.999
    assert np.abs(fg - ref_fg).max() <= 0.005
    assert np.abs(pf - ref_pf).max() <= 0.005


def test_fame_fast_path_parity(oracle):
    """The default TPU fast path (bisection thresholds + one-hot-matmul
    histograms): same pixels up to value ties; pooled distill targets within
    0.04 on isolated boundary cells, ~1e-4 mean."""
    vids, ref_mask, ref_per, ref_fg, ref_pf = oracle
    mask, per, fg, pf = _ours(vids, ds=1, exact=False)
    assert _iou(mask, ref_mask) > 0.999
    assert _iou(per, ref_per) > 0.999
    for mine, ref in ((fg, ref_fg), (pf, ref_pf)):
        d = np.abs(mine - ref)
        assert d.max() <= 0.05
        assert d.mean() <= 1e-3


def test_fame_downsample_is_approximate(oracle):
    """The ds=4 fast mode: clip mask identical (always full res), per-tubelet
    pooled targets shift at mask boundaries — documented approximation."""
    vids, ref_mask, _, ref_fg, ref_pf = oracle
    mask, _, fg, pf = _ours(vids, ds=4)
    assert _iou(mask, ref_mask) > 0.999
    assert np.abs(fg - ref_fg).max() <= 0.005
    delta = np.abs(pf - ref_pf)
    # loose sanity bound — this mode is NOT parity; mean boundary shift only
    assert delta.mean() < 0.15
