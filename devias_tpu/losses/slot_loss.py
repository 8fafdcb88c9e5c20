"""DEVIAS training losses — fully vectorized, on-device, jit-friendly.

Numerics match the reference bit-for-bit in f32 (quirks preserved, each
noted inline):

* devias_slot_loss  <- utils/loss/train_loss.py (matching + hard_select)
* hvu_slot_loss     <- utils/loss/hvu_train_loss.py (real scene labels)
* multi_task_loss   <- run_multi_task_finetuning.py:31-78
* classification criteria <- run_slot_finetuning.py:583-589
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from devias_tpu.losses.matching import match_action_scene_slots


# ---------------------------------------------------------------------------
# primitive criteria (torch-functional semantics)
# ---------------------------------------------------------------------------

def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample CE with integer labels (F.cross_entropy, no reduction)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def soft_target_cross_entropy(logits: jnp.ndarray, target_probs: jnp.ndarray) -> jnp.ndarray:
    """timm SoftTargetCrossEntropy: per-sample sum(-target * log_softmax)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(target_probs * logp).sum(axis=-1)


def label_smoothing_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, smoothing: float = 0.1
) -> jnp.ndarray:
    """timm LabelSmoothingCrossEntropy semantics."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    smooth = -logp.mean(axis=-1)
    return (1.0 - smoothing) * nll + smoothing * smooth


def kl_div_log_target(student_logp: jnp.ndarray, teacher_logp: jnp.ndarray) -> jnp.ndarray:
    """Pointwise exp(t) * (t - s), summed over the last axis (classes).
    Caller applies the reference's 'batchmean' divisor — which for the
    per-sample 1-D call in the matching loss is the NUMBER OF CLASSES, a
    quirk of F.kl_div(reduction='batchmean') on 1-D inputs
    (ref: utils/loss/train_loss.py:160-165)."""
    t = teacher_logp.astype(jnp.float32)
    s = student_logp.astype(jnp.float32)
    return (jnp.exp(t) * (t - s)).sum(axis=-1)


def bce_with_logits(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """F.binary_cross_entropy_with_logits, mean over the last axis.
    NOTE the reference feeds the mask predictor's *sigmoid output* as x —
    the quirk is preserved by calling this on that output
    (ref: model/modeling_slot.py:204 + utils/loss/train_loss.py:146-149)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    return (jax.nn.softplus(x) - x * y).mean(axis=-1)


def pad_teacher_logits(teacher_scene_logit: jnp.ndarray, num_action_classes: int):
    """Prepend an action block filled with (global batch min - 1) so the scene
    class index lands at argmax + num_action_classes
    (ref: utils/loss/train_loss.py:100-107)."""
    t = teacher_scene_logit.astype(jnp.float32)
    var = t.min() - 1.0
    B = t.shape[0]
    pad = jnp.full((B, num_action_classes), var, t.dtype)
    return jnp.concatenate([pad, t], axis=1)


def cosine_orthogonality_loss(slots: jnp.ndarray) -> jnp.ndarray:
    """Mean off-diagonal pairwise cosine similarity between slots
    (ref: utils/loss/train_loss.py:173-178)."""
    s = slots.astype(jnp.float32)
    # torch F.normalize: x / max(||x||, eps) with eps=1e-12
    norm = jnp.linalg.norm(s, axis=-1, keepdims=True)
    s = s / jnp.maximum(norm, 1e-12)
    sim = jnp.einsum("bsd,btd->bst", s, s)
    S = sim.shape[1]
    off = sim * (1.0 - jnp.eye(S))
    return (off.sum(axis=(1, 2)) / (S * (S - 1))).mean()


# ---------------------------------------------------------------------------
# DEVIAS slot loss
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SlotLossConfig:
    num_action_classes: int
    num_scene_classes: int = 365
    slot_matching_method: str = "matching"  # 'matching' | 'hard_select'
    scene_criterion: str = "KL"  # 'KL' | 'CE'
    # flag defaults from run_slot_finetuning.py:53-55
    scene_loss_weight: float = 4000.0
    mask_prediction_loss_weight: float = 3.0
    mask_distill_loss_weight: float = 1.0


def _head_mean_attn(attn: jnp.ndarray) -> jnp.ndarray:
    """[B, h, S, N] -> [B, S, N] mean over heads (ref train_loss.py:94-97)."""
    return attn.astype(jnp.float32).mean(axis=1)


def devias_slot_loss(
    student: dict,
    teacher_scene_logit: jnp.ndarray,
    target: jnp.ndarray,
    fg_mask: jnp.ndarray,
    fg_masks_per_frames: jnp.ndarray,
    cfg: SlotLossConfig,
):
    """Returns (total_loss, action_logit [B, C], loss_dict).

    matching branch (ref utils/loss/train_loss.py:85-187): Hungarian-match
    slots to {action, scene}; action slot gets CE + mask-distill MSE +
    mask-prediction BCE; scene slot gets KL vs the padded teacher (or CE);
    plus the cosine orthogonality term over all slots.
    """
    slots_head = student["slots_head"].astype(jnp.float32)  # [B, S, C]
    slots = student["slots"].astype(jnp.float32)  # [B, S, D]
    mask_predictions = student["mask_predictions"].astype(jnp.float32)  # [B, S, 196]
    attn = _head_mean_attn(student["attn"])  # [B, S, N]
    B, S, C = slots_head.shape

    fg_mask = fg_mask.astype(jnp.float32)
    fg_masks_per_frames = fg_masks_per_frames.astype(jnp.float32)

    teacher_padded = pad_teacher_logits(teacher_scene_logit, cfg.num_action_classes)
    scene_target = (
        jnp.argmax(teacher_scene_logit.astype(jnp.float32), axis=1) + cfg.num_action_classes
    )

    if cfg.slot_matching_method == "hard_select":
        # ref train_loss.py:28-82: slot 0 = action, slot 1 = scene, KL x4
        action_loss = cross_entropy(slots_head[:, 0], target).mean()
        scene_kl = kl_div_log_target(
            jax.nn.log_softmax(slots_head[:, 1], axis=-1),
            jax.nn.log_softmax(teacher_padded, axis=-1),
        )
        scene_loss = scene_kl.sum() / B * 4.0  # 2-D batchmean => /B, then x4
        mask_distill_loss = (
            ((attn[:, 0] - fg_masks_per_frames) ** 2).mean() * cfg.mask_distill_loss_weight
        )
        mask_prediction_loss = (
            bce_with_logits(mask_predictions[:, 0], fg_mask).mean()
            * cfg.mask_prediction_loss_weight
        )
        cosine_loss = cosine_orthogonality_loss(slots)
        total = action_loss + scene_loss + mask_distill_loss + mask_prediction_loss + cosine_loss
        action_logit = slots_head[:, 0]
        return total, action_logit, {
            "action_loss": action_loss,
            "scene_loss": scene_loss,
            "mask_distill_loss": mask_distill_loss,
            "mask_prediction_loss": mask_prediction_loss,
            "cosine_loss": cosine_loss,
        }

    # --- matching branch ---
    probs = jax.nn.softmax(slots_head, axis=-1)  # [B, S, C]
    cost_action = -jnp.take_along_axis(
        probs, jnp.broadcast_to(target[:, None, None], (B, S, 1)), axis=-1
    )[..., 0]
    cost_scene = -jnp.take_along_axis(
        probs, jnp.broadcast_to(scene_target[:, None, None], (B, S, 1)), axis=-1
    )[..., 0]
    a_idx, s_idx = match_action_scene_slots(cost_action, cost_scene)

    def take(x, idx):
        return jnp.take_along_axis(
            x, idx[:, None, None].astype(jnp.int32), axis=1
        ).squeeze(1)

    action_slot_logits = take(slots_head, a_idx)  # [B, C]
    scene_slot_logits = take(slots_head, s_idx)  # [B, C]
    action_attn = take(attn, a_idx)  # [B, N]
    action_mask_pred = take(mask_predictions, a_idx)  # [B, 196]

    action_loss = cross_entropy(action_slot_logits, target).sum() / B
    mask_distill_loss = (
        ((action_attn - fg_masks_per_frames) ** 2).mean(axis=-1).sum()
        / B
        * cfg.mask_distill_loss_weight
    )
    mask_prediction_loss = (
        bce_with_logits(action_mask_pred, fg_mask).sum() / B * cfg.mask_prediction_loss_weight
    )

    if cfg.scene_criterion == "CE":
        scene_loss = cross_entropy(scene_slot_logits, scene_target).sum() / B
    else:  # KL — per-sample 1-D batchmean divides by num classes (quirk)
        scene_kl = kl_div_log_target(
            jax.nn.log_softmax(scene_slot_logits, axis=-1),
            jax.nn.log_softmax(teacher_padded, axis=-1),
        ) / C
        scene_loss = scene_kl.sum() / B * cfg.scene_loss_weight

    cosine_loss = cosine_orthogonality_loss(slots)
    total = action_loss + scene_loss + cosine_loss + mask_prediction_loss + mask_distill_loss
    return total, action_slot_logits, {
        "action_loss": action_loss,
        "scene_loss": scene_loss,
        "cosine_loss": cosine_loss,
        "mask_prediction_loss": mask_prediction_loss,
        "mask_distill_loss": mask_distill_loss,
    }


def hvu_slot_loss(
    student: dict,
    action_targets: jnp.ndarray,
    scene_targets: jnp.ndarray,
    fg_mask: jnp.ndarray,
    fg_masks_per_frames: jnp.ndarray,
    cfg: SlotLossConfig,
):
    """HVU variant: real scene labels, no teacher
    (ref: utils/loss/hvu_train_loss.py:27-128). The reference's 'KL' branch
    — kl_div(log_softmax, one-hot, batchmean on a [1, C] input) — reduces
    exactly to CE against the scene label, so both criteria share one path.
    Default mask loss weights are 1.0 here (ref hvu_train_loss.py:13)."""
    slots_head = student["slots_head"].astype(jnp.float32)
    slots = student["slots"].astype(jnp.float32)
    mask_predictions = student["mask_predictions"].astype(jnp.float32)
    attn = _head_mean_attn(student["attn"])
    B, S, C = slots_head.shape

    scene_target = scene_targets + cfg.num_action_classes

    probs = jax.nn.softmax(slots_head, axis=-1)
    cost_action = -jnp.take_along_axis(
        probs, jnp.broadcast_to(action_targets[:, None, None], (B, S, 1)), axis=-1
    )[..., 0]
    cost_scene = -jnp.take_along_axis(
        probs, jnp.broadcast_to(scene_target[:, None, None], (B, S, 1)), axis=-1
    )[..., 0]
    a_idx, s_idx = match_action_scene_slots(cost_action, cost_scene)

    def take(x, idx):
        return jnp.take_along_axis(
            x, idx[:, None, None].astype(jnp.int32), axis=1
        ).squeeze(1)

    action_slot_logits = take(slots_head, a_idx)
    scene_slot_logits = take(slots_head, s_idx)
    action_attn = take(attn, a_idx)
    action_mask_pred = take(mask_predictions, a_idx)

    action_loss = cross_entropy(action_slot_logits, action_targets).sum() / B
    scene_loss = cross_entropy(scene_slot_logits, scene_target).sum() / B
    mask_distill_loss = (
        ((action_attn - fg_masks_per_frames.astype(jnp.float32)) ** 2).mean(axis=-1).sum()
        / B
        * cfg.mask_distill_loss_weight
    )
    mask_prediction_loss = (
        bce_with_logits(action_mask_pred, fg_mask).sum() / B * cfg.mask_prediction_loss_weight
    )
    cosine_loss = cosine_orthogonality_loss(slots)
    total = action_loss + scene_loss + cosine_loss + mask_prediction_loss + mask_distill_loss
    return total, action_slot_logits, {
        "action_loss": action_loss,
        "scene_loss": scene_loss,
        "cosine_loss": cosine_loss,
        "mask_prediction_loss": mask_prediction_loss,
        "mask_distill_loss": mask_distill_loss,
    }


def multi_task_loss(
    student: dict,
    teacher_scene_logit: jnp.ndarray,
    target: jnp.ndarray,
    num_action_classes: int,
    logit_criterion: str = "KL",
    logit_criterion_weight: float = 1.0,
    unified_head: bool = False,
    action_criterion=cross_entropy,
):
    """Multi-task baseline loss (ref: run_multi_task_finetuning.py:31-78):
    action CE + scene logit distillation (KL batchmean over the batch, or CE
    vs teacher argmax), with optional unified-head teacher padding."""
    action_logit = student["action_logit"].astype(jnp.float32)
    scene_logit = student["scene_logit"].astype(jnp.float32)
    teacher = teacher_scene_logit.astype(jnp.float32)
    B = action_logit.shape[0]

    if unified_head:
        teacher = pad_teacher_logits(teacher, num_action_classes)

    action_loss = action_criterion(action_logit, target).mean()
    if logit_criterion == "CE":
        pseudo = jnp.argmax(teacher, axis=1)
        logit_loss = cross_entropy(scene_logit, pseudo).mean()
    elif logit_criterion == "KL":
        logit_loss = (
            kl_div_log_target(
                jax.nn.log_softmax(scene_logit, axis=-1),
                jax.nn.log_softmax(teacher, axis=-1),
            ).sum()
            / B
            * logit_criterion_weight
        )
    else:
        raise NotImplementedError(logit_criterion)

    total = action_loss + logit_loss
    return total, action_logit, {"action_loss": action_loss, "logit_loss": logit_loss}
