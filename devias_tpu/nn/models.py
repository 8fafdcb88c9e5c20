"""The four DEVIAS model families, TPU-native.

| name (reference timm registry)      | class         | ref file                          |
|-------------------------------------|---------------|-----------------------------------|
| slot_vit_base_patch16_224           | SlotViT       | model/modeling_slot.py:416-422    |
| vit_base_patch16_224                | PlainViT      | model/modeling_finetune.py:328-334|
| disentangle_vit_base_patch16_224    | MultiTaskViT  | model/modeling_multi_task.py:337  |
| slot_fusion_vit_base_patch16_224    | SlotFusionViT | model/modeling_slot_fusion.py:406 |

All outputs are dicts of arrays (jit-friendly); slot-role selection is
vectorized argmax/take (no per-sample python), unlike the reference's
`torch.arange` gathers (ref modeling_slot.py:400-406) — same semantics.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from devias_tpu.nn.agg import AggregationBlock
from devias_tpu.nn.heads import MLPHead, MaskPredictor, FusionMLPHead
from devias_tpu.nn.vit import VideoViT, trunc02

Dtype = Any


def _scaled_trunc02(scale: float):
    """trunc_normal(0.02) then *= init_scale — equivalent to a truncated
    normal with stddev 0.02*scale (ref modeling_slot.py:301-315)."""
    if scale == 0.0:
        return nn.initializers.zeros
    return nn.initializers.truncated_normal(stddev=0.02 * scale, lower=-2.0, upper=2.0)


def select_slots_by_head(slots, slots_head, num_classes: int, num_scene_classes: int):
    """Pick the action slot (highest max action-class prob) and scene slot
    (highest max scene-class prob) from the unified head output
    (ref: model/modeling_slot.py:395-406)."""
    probs = jax.nn.softmax(slots_head.astype(jnp.float32), axis=-1)
    action_probs = probs[..., :num_classes]
    scene_probs = probs[..., num_classes : num_classes + num_scene_classes]
    action_idx = jnp.argmax(action_probs.max(axis=-1), axis=1)  # [B]
    scene_idx = jnp.argmax(scene_probs.max(axis=-1), axis=1)  # [B]

    def take(x, idx):
        return jnp.take_along_axis(x, idx[:, None, None], axis=1).squeeze(1)

    return {
        "action_idx": action_idx,
        "scene_idx": scene_idx,
        "action_feat": take(slots, action_idx),
        "scene_feat": take(slots, scene_idx),
        "action_logit": take(slots_head, action_idx),
        "scene_logit": take(slots_head, scene_idx),
    }


class SlotViT(nn.Module):
    """DEVIAS student: ViT backbone + slot aggregation + unified
    action/scene head + mask decoder (ref: model/modeling_slot.py:219-413).

    Output dict:
      slots            [B, S, D]       (after the agg block's final LN)
      slots_head       [B, S, A+Sc]    unified logits per slot
      mask_predictions [B, S, 196]     sigmoid outputs
      attn             [B, h, S, N]    last-round pre-renorm slot attention
      action_feat/scene_feat/action_logit/scene_logit — role-selected
        (argmax selection in 'matching' mode; slot0/slot1 in 'hard_select',
         ref modeling_slot.py:383-388)
    """

    num_classes: int = 400
    num_scene_classes: int = 365
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    fc_drop_rate: float = 0.0
    init_scale: float = 0.001
    init_values: float = 0.0
    patch_size: int = 16
    tubelet_size: int = 2
    num_latents: int = 2
    agg_depth: int = 4
    agg_weights_tie: bool = True
    slot_matching_method: str = "matching"
    head_type: str = "linear"
    use_learnable_pos_emb: bool = False
    remat: bool = False
    fused_attention: bool = False
    exact_gelu: bool = False  # force erf GELU even in bf16 (parity runs)
    patch_embed_conv: bool = True  # see nn/vit.py PatchEmbed3D lowerings
    patch_embed_mode: Optional[str] = None  # 'conv'|'patchify'|'dot'
    fused_interpret: bool = False
    input_norm: bool = False
    int8_dense: bool = False  # w8a8 backbone GEMMs (frozen-inference only)
    dtype: Dtype = jnp.float32

    def backbone_kwargs(self) -> dict:
        """The configured VideoViT fields, shared by __call__ (which names
        it 'backbone') and external token producers (core/pipeline.py's
        pipeline-parallel path builds the same module unnamed and consumes
        params['backbone'] directly)."""
        return dict(
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            init_values=self.init_values,
            patch_size=self.patch_size,
            tubelet_size=self.tubelet_size,
            use_learnable_pos_emb=self.use_learnable_pos_emb,
            remat=self.remat,
            fused_attention=self.fused_attention,
            exact_gelu=self.exact_gelu,
            patch_embed_conv=self.patch_embed_conv,
            patch_embed_mode=self.patch_embed_mode,
            fused_interpret=self.fused_interpret,
            input_norm=self.input_norm,
            int8_dense=self.int8_dense,
            dtype=self.dtype,
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True, tokens=None):
        # `tokens` short-circuits the backbone with externally produced
        # [B, N, D] tokens (the pipeline-parallel training path runs the
        # backbone under core/pipeline.py::pipeline_tokens and the agg/
        # heads/loss on the full token tensor); params['backbone'] is then
        # simply unused by this apply.
        if tokens is None:
            tokens = VideoViT(
                **self.backbone_kwargs(),
                name="backbone",
            )(x, deterministic=deterministic)

        slots, attn = AggregationBlock(
            num_latents=self.num_latents,
            latent_dim=self.embed_dim,
            depth=self.agg_depth,
            weight_tie=self.agg_weights_tie,
            fused=self.fused_attention,
            fused_interpret=self.fused_interpret,
            dtype=self.dtype,
            name="agg_block",
        )(tokens, deterministic=deterministic)

        B, S, D = slots.shape
        total = self.num_classes + self.num_scene_classes
        dropped = nn.Dropout(self.fc_drop_rate)(slots, deterministic=deterministic)
        if self.head_type == "linear":
            slots_head = nn.Dense(
                total,
                dtype=self.dtype,
                kernel_init=_scaled_trunc02(self.init_scale),
                name="head",
            )(dropped)
        else:
            slots_head = MLPHead(
                hidden_dim=512,
                out_dim=total,
                dtype=self.dtype,
                out_kernel_init=_scaled_trunc02(self.init_scale),
                name="head",
            )(dropped)
        # mask decoder over the spatial patch grid: 196 (=14x14) at 224px,
        # matching the reference's hardcoded width (ref modeling_slot.py:211);
        # generalized to follow the input's actual grid.
        n_spatial = (x.shape[2] // self.patch_size) * (x.shape[3] // self.patch_size)
        mask_predictions = MaskPredictor(
            out_dim=n_spatial, dtype=self.dtype, name="mask_predictor"
        )(slots)

        out = {
            "slots": slots,
            "slots_head": slots_head,
            "mask_predictions": mask_predictions,
            "attn": attn,
        }
        if self.slot_matching_method == "hard_select":
            out.update(
                action_feat=slots[:, 0],
                scene_feat=slots[:, 1],
                action_logit=slots_head[:, 0],
                scene_logit=slots_head[:, 1],
                action_idx=jnp.zeros((B,), jnp.int32),
                scene_idx=jnp.ones((B,), jnp.int32),
            )
        else:
            out.update(
                select_slots_by_head(
                    slots, slots_head, self.num_classes, self.num_scene_classes
                )
            )
        return out


class PlainViT(nn.Module):
    """VideoMAE finetune ViT (baseline action model and frozen Places-365
    scene teacher; ref: model/modeling_finetune.py:178-334). Returns
    (token, logits): mean-pooled fc_norm token by default, CLS token when
    use_mean_pooling=False (the --use_cls scene-model variant)."""

    num_classes: int = 400
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    fc_drop_rate: float = 0.0
    init_scale: float = 0.001
    init_values: float = 0.0
    patch_size: int = 16
    tubelet_size: int = 2
    use_mean_pooling: bool = True
    use_learnable_pos_emb: bool = False
    remat: bool = False
    fused_attention: bool = False
    exact_gelu: bool = False  # force erf GELU even in bf16 (parity runs)
    patch_embed_conv: bool = True  # see nn/vit.py PatchEmbed3D lowerings
    patch_embed_mode: Optional[str] = None  # 'conv'|'patchify'|'dot'
    fused_interpret: bool = False
    input_norm: bool = False
    int8_dense: bool = False  # w8a8 backbone GEMMs (frozen-inference only)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        tokens = VideoViT(
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            init_values=self.init_values,
            patch_size=self.patch_size,
            tubelet_size=self.tubelet_size,
            use_cls_token=not self.use_mean_pooling,
            use_learnable_pos_emb=self.use_learnable_pos_emb,
            final_norm=not self.use_mean_pooling,
            remat=self.remat,
            fused_attention=self.fused_attention,
            exact_gelu=self.exact_gelu,
            patch_embed_conv=self.patch_embed_conv,
            patch_embed_mode=self.patch_embed_mode,
            fused_interpret=self.fused_interpret,
            input_norm=self.input_norm,
            int8_dense=self.int8_dense,
            dtype=self.dtype,
            name="backbone",
        )(x, deterministic=deterministic)

        if self.use_mean_pooling:
            token = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="fc_norm")(
                tokens.mean(axis=1)
            )
        else:
            token = tokens[:, 0]
        dropped = nn.Dropout(self.fc_drop_rate)(token, deterministic=deterministic)
        logits = nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            kernel_init=_scaled_trunc02(self.init_scale),
            name="head",
        )(dropped)
        return {"token": token, "logits": logits}


class MultiTaskViT(nn.Module):
    """Multi-task baseline: ViT with a prepended CLS (action) token and an
    appended scene token; separate or unified heads
    (ref: model/modeling_multi_task.py:178-334)."""

    num_classes: int = 400
    num_scene_classes: int = 365
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    fc_drop_rate: float = 0.0
    init_scale: float = 0.001
    init_values: float = 0.0
    patch_size: int = 16
    tubelet_size: int = 2
    unified_head: bool = False
    use_learnable_pos_emb: bool = False
    remat: bool = False
    fused_attention: bool = False
    exact_gelu: bool = False  # force erf GELU even in bf16 (parity runs)
    patch_embed_conv: bool = True  # see nn/vit.py PatchEmbed3D lowerings
    patch_embed_mode: Optional[str] = None  # 'conv'|'patchify'|'dot'
    fused_interpret: bool = False
    input_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        tokens = VideoViT(
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            init_values=self.init_values,
            patch_size=self.patch_size,
            tubelet_size=self.tubelet_size,
            use_cls_token=True,
            num_extra_suffix_tokens=1,
            use_learnable_pos_emb=self.use_learnable_pos_emb,
            remat=self.remat,
            fused_attention=self.fused_attention,
            exact_gelu=self.exact_gelu,
            patch_embed_conv=self.patch_embed_conv,
            patch_embed_mode=self.patch_embed_mode,
            fused_interpret=self.fused_interpret,
            input_norm=self.input_norm,
            dtype=self.dtype,
            name="backbone",
        )(x, deterministic=deterministic)

        action_token = tokens[:, 0]
        scene_token = tokens[:, -1]
        drop = nn.Dropout(self.fc_drop_rate)
        a = drop(action_token, deterministic=deterministic)
        s = drop(scene_token, deterministic=deterministic)

        if self.unified_head:
            head = nn.Dense(
                self.num_classes + self.num_scene_classes,
                dtype=self.dtype,
                kernel_init=_scaled_trunc02(self.init_scale),
                name="head",
            )
            action_logit, scene_logit = head(a), head(s)
        else:
            action_logit = nn.Dense(
                self.num_classes,
                dtype=self.dtype,
                kernel_init=_scaled_trunc02(self.init_scale),
                name="head",
            )(a)
            scene_logit = nn.Dense(
                self.num_scene_classes,
                dtype=self.dtype,
                kernel_init=_scaled_trunc02(self.init_scale),
                name="scene_head",
            )(s)
        return {
            "action_token": action_token,
            "scene_token": scene_token,
            "action_logit": action_logit,
            "scene_logit": scene_logit,
        }


class SlotFusionViT(nn.Module):
    """Downstream transfer model: pretrained SlotViT structure whose unified
    head selects the action/scene slots, then a new fusion head classifies
    their fusion (ref: model/modeling_slot_fusion.py:214-403)."""

    num_classes: int = 400  # pretrain classes (unified head width)
    num_scene_classes: int = 365
    downstream_nb_classes: int = 48
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    fc_drop_rate: float = 0.0
    init_scale: float = 0.001
    init_values: float = 0.0
    patch_size: int = 16
    tubelet_size: int = 2
    num_latents: int = 2
    agg_depth: int = 8
    agg_weights_tie: bool = True
    slot_fusion_method: str = "concat"  # 'concat' | 'gap'
    head_type: str = "mlp"
    use_input_ln: bool = False
    use_learnable_pos_emb: bool = False
    remat: bool = False
    fused_attention: bool = False
    exact_gelu: bool = False  # force erf GELU even in bf16 (parity runs)
    patch_embed_conv: bool = True  # see nn/vit.py PatchEmbed3D lowerings
    patch_embed_mode: Optional[str] = None  # 'conv'|'patchify'|'dot'
    fused_interpret: bool = False
    input_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        tokens = VideoViT(
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            init_values=self.init_values,
            patch_size=self.patch_size,
            tubelet_size=self.tubelet_size,
            use_learnable_pos_emb=self.use_learnable_pos_emb,
            remat=self.remat,
            fused_attention=self.fused_attention,
            exact_gelu=self.exact_gelu,
            patch_embed_conv=self.patch_embed_conv,
            patch_embed_mode=self.patch_embed_mode,
            fused_interpret=self.fused_interpret,
            input_norm=self.input_norm,
            dtype=self.dtype,
            name="backbone",
        )(x, deterministic=deterministic)

        if self.slot_fusion_method == "gap":
            # ref modeling_slot_fusion.py:369-373 (gap mode skips the agg block)
            feat = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="action_norm")(
                tokens.mean(axis=1)
            )
            feat = nn.Dropout(self.fc_drop_rate)(feat, deterministic=deterministic)
            logits = nn.Dense(
                self.downstream_nb_classes,
                dtype=self.dtype,
                kernel_init=_scaled_trunc02(self.init_scale),
                name="fusion_head",
            )(feat)
            return {"feat": feat, "logits": logits}

        slots, attn = AggregationBlock(
            num_latents=self.num_latents,
            latent_dim=self.embed_dim,
            depth=self.agg_depth,
            weight_tie=self.agg_weights_tie,
            fused=self.fused_attention,
            fused_interpret=self.fused_interpret,
            dtype=self.dtype,
            name="agg_block",
        )(tokens, deterministic=deterministic)

        # pretrained unified head used only for slot-role selection
        slots_head = nn.Dense(
            self.num_classes + self.num_scene_classes,
            dtype=self.dtype,
            kernel_init=trunc02,
            name="head",
        )(slots)
        sel = select_slots_by_head(slots, slots_head, self.num_classes, self.num_scene_classes)
        action_feat = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="action_norm")(
            sel["action_feat"]
        )
        scene_feat = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="scene_norm")(
            sel["scene_feat"]
        )

        if self.head_type == "mlp":
            logits = FusionMLPHead(
                num_classes=self.downstream_nb_classes,
                in_dim=self.embed_dim,
                fc_drop_rate=self.fc_drop_rate,
                use_input_ln=self.use_input_ln,
                dtype=self.dtype,
                name="fusion_head",
            )(action_feat, scene_feat, deterministic=deterministic)
        else:
            fused = jnp.concatenate([action_feat, scene_feat], axis=-1)
            logits = nn.Dense(
                self.downstream_nb_classes,
                dtype=self.dtype,
                kernel_init=_scaled_trunc02(self.init_scale),
                name="fusion_head",
            )(fused)
        return {
            "feat": jnp.concatenate([action_feat, scene_feat], axis=-1),
            "logits": logits,
            "slots": slots,
        }


_REGISTRY = {
    "slot_vit_base_patch16_224": SlotViT,
    "vit_base_patch16_224": PlainViT,
    "disentangle_vit_base_patch16_224": MultiTaskViT,
    "slot_fusion_vit_base_patch16_224": SlotFusionViT,
}


def create_model(name: str, **kwargs):
    """Model factory mirroring `timm.models.create_model` names used by the
    reference CLIs (ref: run_slot_finetuning.py:371)."""
    if name not in _REGISTRY:
        raise ValueError(f"unknown model {name}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)
