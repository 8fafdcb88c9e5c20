"""Classification / mask heads.

ref: model/modeling_slot.py:23-33 (MLPHead), 194-216 (MaskPredictor),
model/modeling_slot_fusion.py:23-53 (fusion MLPHead).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from devias_tpu.nn.vit import trunc02

Dtype = Any

TORCH_LN_EPS = 1e-5


class MLPHead(nn.Module):
    """fc1 -> ReLU -> fc2 (ref: model/modeling_slot.py:23-33)."""

    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32
    out_kernel_init: Any = trunc02

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, kernel_init=trunc02, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(
            self.out_dim, dtype=self.dtype, kernel_init=self.out_kernel_init, name="fc2"
        )(x)
        return x


class MaskPredictor(nn.Module):
    """Slot -> 14x14 foreground-mask decoder: 768->512->256->196 MLP with a
    final sigmoid (ref: model/modeling_slot.py:194-216). NOTE: the training
    loss applies BCE-with-logits on this *sigmoid output* — a reference quirk
    preserved by the loss, not here (ref: utils/loss/train_loss.py:146-149)."""

    out_dim: int = 196
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(512, dtype=self.dtype, kernel_init=trunc02, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(256, dtype=self.dtype, kernel_init=trunc02, name="fc2")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, kernel_init=trunc02, name="fc3")(x)
        x = nn.sigmoid(x.astype(jnp.float32))
        return x


class FusionMLPHead(nn.Module):
    """Downstream slot-fusion MLP head (ref: model/modeling_slot_fusion.py:23-53).

    Reference quirk preserved bit-for-bit: BOTH the action and scene tokens
    are projected through `fc_action_down` + `fc_action_ln` (the scene-branch
    params exist but are never used, ref lines 43-44); they are still created
    here so checkpoints round-trip. Then concat -> [optional input LN] ->
    ReLU -> dropout -> classifier(in_dim -> classes).
    """

    num_classes: int
    in_dim: int = 768
    fc_drop_rate: float = 0.0
    use_input_ln: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, action_feat, scene_feat, deterministic: bool = True):
        down = nn.Dense(
            self.in_dim // 2, dtype=self.dtype, kernel_init=trunc02, name="fc_action_down"
        )
        ln = nn.LayerNorm(epsilon=TORCH_LN_EPS, dtype=self.dtype, name="fc_action_ln")
        # dead params kept for checkpoint parity with the reference
        _ = nn.Dense(
            self.in_dim // 2, dtype=self.dtype, kernel_init=trunc02, name="fc_scene_down"
        )(scene_feat)
        _ = nn.LayerNorm(epsilon=TORCH_LN_EPS, dtype=self.dtype, name="fc_scene_ln")(_)

        a = ln(down(action_feat))
        s = ln(down(scene_feat))
        x = jnp.concatenate([a, s], axis=-1)
        if self.use_input_ln:
            x = nn.LayerNorm(epsilon=TORCH_LN_EPS, dtype=self.dtype, name="fc_input_ln")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.fc_drop_rate)(x, deterministic=deterministic)
        x = nn.Dense(
            self.num_classes, dtype=self.dtype, kernel_init=trunc02, name="classifier"
        )(x)
        return x
