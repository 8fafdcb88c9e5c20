from devias_tpu.losses.matching import match_action_scene_slots
from devias_tpu.losses.slot_loss import (
    SlotLossConfig,
    devias_slot_loss,
    hvu_slot_loss,
    multi_task_loss,
    cross_entropy,
    soft_target_cross_entropy,
    label_smoothing_cross_entropy,
)
