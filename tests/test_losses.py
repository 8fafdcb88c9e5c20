"""Loss parity tests against torch/scipy oracles expressing the documented
reference semantics (ref: utils/loss/train_loss.py, hvu_train_loss.py,
run_multi_task_finetuning.py:31-78)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF
from scipy.optimize import linear_sum_assignment

from devias_tpu.losses import (
    SlotLossConfig,
    devias_slot_loss,
    hvu_slot_loss,
    multi_task_loss,
    match_action_scene_slots,
    cross_entropy,
    label_smoothing_cross_entropy,
    soft_target_cross_entropy,
)


def _student(rng, B=4, S=2, A=7, Sc=5, N=24, heads=4, D=16):
    return {
        "slots_head": jnp.asarray(rng.normal(size=(B, S, A + Sc)), jnp.float32),
        "slots": jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32),
        "mask_predictions": jnp.asarray(rng.uniform(size=(B, S, 196)), jnp.float32),
        "attn": jnp.asarray(rng.uniform(size=(B, heads, S, N)), jnp.float32),
    }


def test_matching_equals_scipy_hungarian():
    rng = np.random.default_rng(0)
    for S in (2, 3, 5):
        ca = rng.normal(size=(16, S)).astype(np.float32)
        cs = rng.normal(size=(16, S)).astype(np.float32)
        a_idx, s_idx = match_action_scene_slots(jnp.asarray(ca), jnp.asarray(cs))
        for b in range(16):
            cost = np.stack([ca[b], cs[b]], axis=1)  # S x 2
            rows, cols = linear_sum_assignment(cost)
            ref = {c: r for r, c in zip(rows, cols)}
            assert int(a_idx[b]) == ref[0], (b, S)
            assert int(s_idx[b]) == ref[1], (b, S)


def _oracle_devias_loss(student, teacher, target, fg_mask, fg_pf, cfg):
    """Torch/scipy oracle for the matching branch of the DEVIAS loss
    (semantics from utils/loss/train_loss.py:85-187)."""
    sh = torch.from_numpy(np.asarray(student["slots_head"], np.float32))
    slots = torch.from_numpy(np.asarray(student["slots"], np.float32))
    mp = torch.from_numpy(np.asarray(student["mask_predictions"], np.float32))
    attn = torch.from_numpy(np.asarray(student["attn"], np.float32)).mean(dim=1)
    teacher = torch.from_numpy(np.asarray(teacher, np.float32))
    target = torch.from_numpy(np.asarray(target))
    fg_mask = torch.from_numpy(np.asarray(fg_mask, np.float32))
    fg_pf = torch.from_numpy(np.asarray(fg_pf, np.float32))
    B, S, C = sh.shape
    A = cfg.num_action_classes

    scene_target = teacher.argmax(dim=1) + A
    pad = torch.full((B, A), float(teacher.min()) - 1.0)
    teacher_pad = torch.cat([pad, teacher], dim=1)

    probs = sh.softmax(-1)
    action_l = scene_l = mask_p = mask_d = 0.0
    for b in range(B):
        cost = torch.stack(
            [-probs[b, :, target[b]], -probs[b, :, scene_target[b]]], dim=1
        )
        rows, cols = linear_sum_assignment(cost.numpy())
        for r, c in zip(rows, cols):
            if c == 0:
                action_l = action_l + TF.cross_entropy(sh[b, r], target[b])
                mask_d = mask_d + TF.mse_loss(attn[b, r], fg_pf[b]) * cfg.mask_distill_loss_weight
                mask_p = mask_p + TF.binary_cross_entropy_with_logits(
                    mp[b, r], fg_mask[b]
                ) * cfg.mask_prediction_loss_weight
            else:
                scene_l = scene_l + TF.kl_div(
                    TF.log_softmax(sh[b, r], dim=-1),
                    TF.log_softmax(teacher_pad[b], dim=-1),
                    reduction="batchmean",
                    log_target=True,
                ) * cfg.scene_loss_weight
    action_l, scene_l, mask_p, mask_d = (x / B for x in (action_l, scene_l, mask_p, mask_d))

    ns = TF.normalize(slots, p=2, dim=2)
    cos = torch.bmm(ns, ns.transpose(1, 2)) * (1 - torch.eye(S))
    cos_l = (cos.sum(dim=(1, 2)) / (S * (S - 1))).mean()
    total = action_l + scene_l + cos_l + mask_p + mask_d
    return dict(
        total=float(total),
        action_loss=float(action_l),
        scene_loss=float(scene_l),
        cosine_loss=float(cos_l),
        mask_prediction_loss=float(mask_p),
        mask_distill_loss=float(mask_d),
    )


def test_devias_slot_loss_matches_oracle():
    rng = np.random.default_rng(1)
    B, A, Sc = 4, 7, 5
    for S in (2, 3):
        student = _student(rng, B=B, S=S, A=A, Sc=Sc)
        teacher = rng.normal(size=(B, Sc)).astype(np.float32)
        target = rng.integers(0, A, size=B)
        fg_mask = rng.uniform(size=(B, 196)).astype(np.float32)
        fg_pf = rng.uniform(size=(B, 24)).astype(np.float32)
        cfg = SlotLossConfig(num_action_classes=A, num_scene_classes=Sc)
        total, logits, parts = devias_slot_loss(
            student, jnp.asarray(teacher), jnp.asarray(target),
            jnp.asarray(fg_mask), jnp.asarray(fg_pf), cfg,
        )
        ref = _oracle_devias_loss(student, teacher, target, fg_mask, fg_pf, cfg)
        np.testing.assert_allclose(float(total), ref["total"], rtol=2e-4)
        for k in parts:
            np.testing.assert_allclose(float(parts[k]), ref[k], rtol=2e-4, atol=1e-6, err_msg=k)


def test_devias_loss_scene_ce_branch():
    rng = np.random.default_rng(5)
    B, A, Sc, S = 3, 7, 5, 2
    student = _student(rng, B=B, S=S, A=A, Sc=Sc)
    teacher = rng.normal(size=(B, Sc)).astype(np.float32)
    target = rng.integers(0, A, size=B)
    fg_mask = rng.uniform(size=(B, 196)).astype(np.float32)
    fg_pf = rng.uniform(size=(B, 24)).astype(np.float32)
    cfg = SlotLossConfig(num_action_classes=A, num_scene_classes=Sc, scene_criterion="CE")
    total, _, parts = devias_slot_loss(
        student, jnp.asarray(teacher), jnp.asarray(target),
        jnp.asarray(fg_mask), jnp.asarray(fg_pf), cfg,
    )
    assert np.isfinite(float(total))
    assert float(parts["scene_loss"]) > 0


def test_hard_select_branch_matches_oracle():
    rng = np.random.default_rng(2)
    B, A, Sc, S = 4, 7, 5, 2
    student = _student(rng, B=B, S=S, A=A, Sc=Sc)
    teacher = rng.normal(size=(B, Sc)).astype(np.float32)
    target = rng.integers(0, A, size=B)
    fg_mask = rng.uniform(size=(B, 196)).astype(np.float32)
    fg_pf = rng.uniform(size=(B, 24)).astype(np.float32)
    cfg = SlotLossConfig(
        num_action_classes=A, num_scene_classes=Sc, slot_matching_method="hard_select",
        mask_distill_loss_weight=3.0, mask_prediction_loss_weight=1.0,
    )
    total, logits, parts = devias_slot_loss(
        student, jnp.asarray(teacher), jnp.asarray(target),
        jnp.asarray(fg_mask), jnp.asarray(fg_pf), cfg,
    )
    # oracle (ref train_loss.py:28-82): fixed roles, 2-D KL batchmean x4
    sh = torch.from_numpy(np.asarray(student["slots_head"]))
    pad = torch.full((B, A), float(np.min(teacher)) - 1.0)
    tp = torch.cat([pad, torch.from_numpy(teacher)], dim=1)
    a_ref = TF.cross_entropy(sh[:, 0], torch.from_numpy(target))
    s_ref = TF.kl_div(
        TF.log_softmax(sh[:, 1], dim=-1), TF.log_softmax(tp, dim=-1),
        reduction="batchmean", log_target=True,
    ) * 4
    attn = torch.from_numpy(np.asarray(student["attn"])).mean(1)
    d_ref = TF.mse_loss(attn[:, 0], torch.from_numpy(fg_pf)) * 3.0
    p_ref = TF.binary_cross_entropy_with_logits(
        torch.from_numpy(np.asarray(student["mask_predictions"]))[:, 0],
        torch.from_numpy(fg_mask),
    )
    np.testing.assert_allclose(float(parts["action_loss"]), float(a_ref), rtol=1e-5)
    np.testing.assert_allclose(float(parts["scene_loss"]), float(s_ref), rtol=1e-4)
    np.testing.assert_allclose(float(parts["mask_distill_loss"]), float(d_ref), rtol=1e-5)
    np.testing.assert_allclose(float(parts["mask_prediction_loss"]), float(p_ref), rtol=1e-5)


def test_hvu_loss_kl_equals_ce():
    """The reference HVU 'KL' branch reduces to CE (one-hot target KL)."""
    rng = np.random.default_rng(3)
    B, A, Sc, S = 4, 6, 4, 2
    student = _student(rng, B=B, S=S, A=A, Sc=Sc)
    at = rng.integers(0, A, size=B)
    st = rng.integers(0, Sc, size=B)
    fg_mask = rng.uniform(size=(B, 196)).astype(np.float32)
    fg_pf = rng.uniform(size=(B, 24)).astype(np.float32)
    cfg = SlotLossConfig(
        num_action_classes=A, num_scene_classes=Sc,
        mask_distill_loss_weight=1.0, mask_prediction_loss_weight=1.0,
    )
    total, _, parts = hvu_slot_loss(
        student, jnp.asarray(at), jnp.asarray(st),
        jnp.asarray(fg_mask), jnp.asarray(fg_pf), cfg,
    )
    # oracle scene term: KL(log_softmax, one-hot) == CE
    sh = np.asarray(student["slots_head"])
    probs = jax.nn.softmax(jnp.asarray(sh), axis=-1)
    ca = -np.take_along_axis(np.asarray(probs), at[:, None, None].repeat(S, 1), 2)[..., 0]
    cs = -np.take_along_axis(np.asarray(probs), (st + A)[:, None, None].repeat(S, 1), 2)[..., 0]
    scene_ref = 0.0
    for b in range(B):
        rows, cols = linear_sum_assignment(np.stack([ca[b], cs[b]], 1))
        for r, c in zip(rows, cols):
            if c == 1:
                scene_ref += float(
                    TF.cross_entropy(torch.from_numpy(sh[b, r]), torch.tensor(st[b] + A))
                )
    np.testing.assert_allclose(float(parts["scene_loss"]), scene_ref / B, rtol=1e-5)


def test_multi_task_loss_kl_matches_torch():
    rng = np.random.default_rng(4)
    B, A, Sc = 4, 6, 5
    student = {
        "action_logit": jnp.asarray(rng.normal(size=(B, A)), jnp.float32),
        "scene_logit": jnp.asarray(rng.normal(size=(B, Sc)), jnp.float32),
    }
    teacher = rng.normal(size=(B, Sc)).astype(np.float32)
    target = rng.integers(0, A, size=B)
    total, _, parts = multi_task_loss(
        student, jnp.asarray(teacher), jnp.asarray(target), num_action_classes=A,
    )
    a_ref = TF.cross_entropy(
        torch.from_numpy(np.asarray(student["action_logit"])), torch.from_numpy(target)
    )
    l_ref = TF.kl_div(
        TF.log_softmax(torch.from_numpy(np.asarray(student["scene_logit"])), dim=-1),
        TF.log_softmax(torch.from_numpy(teacher), dim=-1),
        reduction="batchmean", log_target=True,
    )
    np.testing.assert_allclose(float(parts["action_loss"]), float(a_ref), rtol=1e-5)
    np.testing.assert_allclose(float(parts["logit_loss"]), float(l_ref), rtol=1e-5)


def test_classification_criteria_match_torch():
    rng = np.random.default_rng(6)
    logits = rng.normal(size=(8, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=8)
    ce = cross_entropy(jnp.asarray(logits), jnp.asarray(labels)).mean()
    ref = TF.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels))
    np.testing.assert_allclose(float(ce), float(ref), rtol=1e-5)

    ls = label_smoothing_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0.1).mean()
    ref_ls = TF.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels), label_smoothing=0.1)
    np.testing.assert_allclose(float(ls), float(ref_ls), rtol=1e-5)

    probs = rng.uniform(size=(8, 10)).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    st = soft_target_cross_entropy(jnp.asarray(logits), jnp.asarray(probs)).mean()
    ref_st = (-torch.from_numpy(probs) * TF.log_softmax(torch.from_numpy(logits), -1)).sum(-1).mean()
    np.testing.assert_allclose(float(st), float(ref_st), rtol=1e-5)


def test_loss_is_differentiable():
    rng = np.random.default_rng(7)
    B, A, Sc, S = 2, 5, 4, 2
    student = _student(rng, B=B, S=S, A=A, Sc=Sc)
    teacher = jnp.asarray(rng.normal(size=(B, Sc)), jnp.float32)
    target = jnp.asarray(rng.integers(0, A, size=B))
    fg_mask = jnp.asarray(rng.uniform(size=(B, 196)), jnp.float32)
    fg_pf = jnp.asarray(rng.uniform(size=(B, 24)), jnp.float32)
    cfg = SlotLossConfig(num_action_classes=A, num_scene_classes=Sc)

    def f(sh):
        s = dict(student, slots_head=sh)
        total, _, _ = devias_slot_loss(s, teacher, target, fg_mask, fg_pf, cfg)
        return total

    g = jax.grad(f)(student["slots_head"])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
