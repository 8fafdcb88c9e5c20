"""Golden Mixup/CutMix parity vs the reference implementation
(ref utils/transform/mixup.py, timm batch mode — the only mode the
reference CLIs expose), with randomness pinned identically on both sides.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

sys.path.append("/root/repo/tests")
from _ref_oracle import load_reference

from devias_tpu.aug.mixup import MixupConfig, mixup_cutmix

B, T, H, W = 4, 2, 32, 32
K = 7


def _ref_mixup(videos_np, labels_np, lam, use_cutmix, cy, cx, cfg, monkeypatch):
    load_reference()
    import utils.transform.mixup as refmix

    # _params_per_batch: rand() < mix_prob (apply), rand() < switch_prob
    u_seq = iter([0.0, 0.0 if use_cutmix else 1.0])
    monkeypatch.setattr(refmix.np.random, "rand", lambda *a: next(u_seq))
    monkeypatch.setattr(refmix.np.random, "beta", lambda *a, **k: lam)
    # rand_bbox draws cy then cx
    ri_seq = iter([np.array(cy), np.array(cx)])
    monkeypatch.setattr(
        refmix.np.random, "randint", lambda lo, hi, size=None: next(ri_seq)
    )

    m = refmix.Mixup(
        mixup_alpha=cfg.mixup_alpha, cutmix_alpha=cfg.cutmix_alpha,
        prob=1.0, switch_prob=cfg.switch_prob, mode="batch",
        label_smoothing=cfg.label_smoothing, num_classes=K,
    )
    x = torch.from_numpy(videos_np).permute(0, 4, 1, 2, 3).clone()  # B,C,T,H,W
    y = torch.from_numpy(labels_np)
    xm, ym = m(x, y)
    return xm.permute(0, 2, 3, 4, 1).numpy(), ym.numpy()


@pytest.mark.parametrize("use_cutmix,lam", [(False, 0.37), (True, 0.62)])
def test_mixup_batch_mode_matches_reference(monkeypatch, use_cutmix, lam):
    rng = np.random.default_rng(0)
    videos = rng.normal(size=(B, T, H, W, 3)).astype(np.float32)
    labels = (np.arange(B) % K).astype(np.int64)
    cy, cx = 20, 9
    cfg = MixupConfig(
        mixup_alpha=0.8, cutmix_alpha=1.0, prob=1.0, switch_prob=0.5,
        label_smoothing=0.1, num_classes=K,
    )

    ref_x, ref_y = _ref_mixup(videos, labels, lam, use_cutmix, cy, cx, cfg, monkeypatch)

    # pin our randomness to the same decisions: uniform draws are
    # (use_mixing < prob, switch < switch_prob), then beta, then the
    # cutmix box center randints (cy, cx)
    import devias_tpu.aug.mixup as ours

    u_seq = iter([0.0, 0.0 if use_cutmix else 1.0])
    monkeypatch.setattr(
        ours.jax.random, "uniform", lambda k, *a, **kw: jnp.float32(next(u_seq))
    )
    monkeypatch.setattr(
        ours.jax.random, "beta", lambda k, a, b, *aa, **kw: jnp.float32(lam)
    )
    ri_seq = iter([jnp.int32(cy), jnp.int32(cx)])
    monkeypatch.setattr(
        ours.jax.random, "randint", lambda k, shape, lo, hi: next(ri_seq)
    )

    out_x, out_y = mixup_cutmix(
        jax.random.PRNGKey(0), jnp.asarray(videos), jnp.asarray(labels), cfg
    )

    np.testing.assert_allclose(np.asarray(out_x), ref_x, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_y), ref_y, rtol=1e-5, atol=1e-6)


def _pin_ref_elem(monkeypatch, refmix, switch_u, lam_c, lam_m, prob_u, cy, cx,
                  use_cutmix, lam):
    """Pin the reference's np.random for _params_per_elem + per-element
    rand_bbox (drawn in loop order, only for mixing cutmix elements)."""
    n = len(switch_u)
    rand_seq = iter([np.asarray(switch_u), np.asarray(prob_u)])
    monkeypatch.setattr(refmix.np.random, "rand", lambda *a: next(rand_seq))
    beta_seq = {"c": np.asarray(lam_c), "m": np.asarray(lam_m)}
    monkeypatch.setattr(
        refmix.np.random, "beta",
        lambda a, b, size=None: beta_seq["c"] if a == CUTMIX_A else beta_seq["m"],
    )
    ints = []
    for i in range(n):
        if lam[i] != 1.0 and use_cutmix[i]:
            ints += [np.array(cy[i]), np.array(cx[i])]
    ri_seq = iter(ints)
    monkeypatch.setattr(
        refmix.np.random, "randint", lambda lo, hi, size=None: next(ri_seq)
    )


MIXUP_A, CUTMIX_A = 0.8, 1.0


@pytest.mark.parametrize("mode", ["elem", "pair"])
def test_mixup_elem_pair_mode_matches_reference(monkeypatch, mode):
    load_reference()
    import utils.transform.mixup as refmix

    B_ = B  # 4
    n = B_ if mode == "elem" else B_ // 2
    rng = np.random.default_rng(3)
    videos = rng.normal(size=(B_, T, H, W, 3)).astype(np.float32)
    labels = (np.arange(B_) % K).astype(np.int64)

    # pinned decisions: element 0 cutmix, element 1 mixup, element 2 (elem
    # only) not mixing, element 3 (elem only) cutmix again
    switch_u = np.array([0.1, 0.9, 0.2, 0.3][:n])         # < 0.5 -> cutmix
    prob_u = np.array([0.0, 0.0, 0.99, 0.0][:n])          # < prob(0.9) -> mix
    lam_c = np.array([0.62, 0.5, 0.44, 0.71][:n])
    lam_m = np.array([0.9, 0.37, 0.55, 0.2][:n])
    cy = np.array([20, 5, 11, 25][:n])
    cx = np.array([9, 30, 3, 14][:n])
    use_cutmix = switch_u < 0.5
    lam = np.where(prob_u < 0.9, np.where(use_cutmix, lam_c, lam_m), 1.0)

    cfg = MixupConfig(
        mixup_alpha=MIXUP_A, cutmix_alpha=CUTMIX_A, prob=0.9, switch_prob=0.5,
        label_smoothing=0.1, num_classes=K, mode=mode,
    )

    _pin_ref_elem(monkeypatch, refmix, switch_u, lam_c, lam_m, prob_u, cy, cx,
                  use_cutmix, lam)
    m = refmix.Mixup(
        mixup_alpha=MIXUP_A, cutmix_alpha=CUTMIX_A, prob=0.9, switch_prob=0.5,
        mode=mode, label_smoothing=0.1, num_classes=K,
    )
    x = torch.from_numpy(videos).permute(0, 4, 1, 2, 3).clone()
    y = torch.from_numpy(labels)
    xm, ym = m(x, y)
    ref_x, ref_y = xm.permute(0, 2, 3, 4, 1).numpy(), ym.numpy()

    # pin ours: uniform call order = (switch, prob); beta = (cutmix, mixup);
    # randint = (cy, cx)
    import devias_tpu.aug.mixup as ours

    u_seq = iter([jnp.asarray(switch_u, jnp.float32), jnp.asarray(prob_u, jnp.float32)])
    monkeypatch.setattr(
        ours.jax.random, "uniform", lambda k, shape=(), **kw: next(u_seq)
    )
    monkeypatch.setattr(
        ours.jax.random, "beta",
        lambda k, a, b, shape=(), **kw: jnp.asarray(
            lam_c if a == CUTMIX_A else lam_m, jnp.float32
        ),
    )
    ri_seq = iter([jnp.asarray(cy, jnp.int32), jnp.asarray(cx, jnp.int32)])
    monkeypatch.setattr(
        ours.jax.random, "randint", lambda k, shape, lo, hi: next(ri_seq)
    )

    out_x, out_y = mixup_cutmix(
        jax.random.PRNGKey(0), jnp.asarray(videos), jnp.asarray(labels), cfg
    )
    np.testing.assert_allclose(np.asarray(out_x), ref_x, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_y), ref_y, rtol=1e-5, atol=1e-6)
