"""PyTorch (VideoMAE / DEVIAS) checkpoint import into devias_tpu pytrees.

Covers the reference's checkpoint surgery (ref: run_slot_finetuning.py:438-499):
  * unwrap 'model' | 'module' containers
  * strip 'backbone.' / 'encoder.' / '_orig_mod.' prefixes
  * drop head weights whose shape mismatches
  * bicubic positional-embedding interpolation over the spatial grid only
    (temporal axis preserved)
plus the weight-layout translation into the flax tree:
  * torch Linear [out, in] -> flax Dense kernel [in, out] (transpose)
  * Conv3d patch embed [D, C, t, ph, pw] -> [t*ph*pw*C, D] matmul kernel
  * fused qkv weight + separate q/v biases -> qkv_kernel/q_bias/v_bias
  * agg_block PreNorm wrappers -> flat layer names; tied layers read from
    layers.0 (the reference stores the same tensors at every index when
    weight_tie_layers=True, ref agg_block/agg_block.py:90-103)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().float().numpy()


def load_torch_checkpoint_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file into {key: np.ndarray}, unwrapping containers
    (ref run_slot_finetuning.py:447-453; DeepSpeed ckpts store 'module',
    ref eval_slot_finetuning_hvu.py:296-299)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "module", "state_dict"):
        if isinstance(ckpt, dict) and key in ckpt and isinstance(ckpt[key], dict):
            ckpt = ckpt[key]
            break
    return {k: _to_numpy(v) for k, v in ckpt.items() if hasattr(v, "shape")}


def strip_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """ref run_slot_finetuning.py:460-469."""
    out = {}
    for k, v in sd.items():
        for pref in ("_orig_mod.", "backbone.", "encoder."):
            if k.startswith(pref):
                k = k[len(pref):]
        out[k] = v
    return out


def interpolate_pos_embed(
    pos: np.ndarray, src_spatial: int, dst_spatial: int, num_frames_tokens: int
) -> np.ndarray:
    """Bicubic resize over the HxW grid, keeping the temporal axis
    (ref run_slot_finetuning.py:471-497). pos: [N, D] with
    N = num_frames_tokens * src_spatial^2."""
    import torch
    import torch.nn.functional as TF

    D = pos.shape[-1]
    x = torch.from_numpy(pos.reshape(-1, num_frames_tokens, src_spatial, src_spatial, D))
    x = x.reshape(-1, src_spatial, src_spatial, D).permute(0, 3, 1, 2)
    x = TF.interpolate(x, size=(dst_spatial, dst_spatial), mode="bicubic", align_corners=False)
    x = x.permute(0, 2, 3, 1).reshape(num_frames_tokens * dst_spatial * dst_spatial, D)
    return x.numpy()


def _linear(sd, name):
    """torch Linear -> (kernel [in,out], bias or None). Copies both (a
    state-dict numpy view would alias live torch storage)."""
    w = sd[f"{name}.weight"].T.copy()
    b = sd.get(f"{name}.bias")
    return w, None if b is None else b.copy()


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"].copy(), "bias": sd[f"{name}.bias"].copy()}


def _backbone_params(
    sd: Dict[str, np.ndarray],
    depth: int,
    dst_spatial: Optional[int] = None,
    frames_tokens: Optional[int] = None,
    num_extra_tokens: Optional[int] = None,
) -> Dict[str, Any]:
    """Translate a VideoMAE-style torch backbone into the VideoViT tree.
    `depth` is capped to the blocks actually present in the checkpoint.

    dst_spatial/frames_tokens: target HxW patch-grid side and temporal token
    count — when given and the checkpoint's learnable pos_embed was trained
    at a different spatial resolution, it is bicubic-interpolated over the
    spatial grid only, exactly as the reference finetune surgery does
    (ref run_slot_finetuning.py:471-497); extra (cls) tokens are kept."""
    present = [
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.") and k.endswith(".norm1.weight")
    ]
    if present:
        depth = min(depth, max(present) + 1)
    p: Dict[str, Any] = {}

    w = sd["patch_embed.proj.weight"]  # [D, C, t, ph, pw]
    D = w.shape[0]
    # -> flattened-patch matmul kernel, (t, ph, pw, c) patch order
    p["patch_embed"] = {
        "kernel": w.transpose(2, 3, 4, 1, 0).reshape(-1, D).copy(),
        "bias": sd["patch_embed.proj.bias"].copy(),
    }
    if "cls_token" in sd:
        p["cls_token"] = sd["cls_token"].copy()
    if "scene_token" in sd:  # multi-task suffix token (ref modeling_multi_task.py)
        p["suffix_tokens"] = sd["scene_token"].copy()
    if "pos_embed" in sd:
        pos = sd["pos_embed"].copy()
        if dst_spatial is not None and frames_tokens is not None:
            if num_extra_tokens is None:
                # reference: extra = pos rows beyond the patch count — the
                # prepended cls slot exists iff the model has one
                num_extra_tokens = 1 if "cls_token" in sd else 0
            flat = pos.reshape(-1, pos.shape[-1]) if pos.ndim == 3 else pos
            extra, tokens = flat[:num_extra_tokens], flat[num_extra_tokens:]
            src_spatial = int(round((tokens.shape[0] / frames_tokens) ** 0.5))
            if src_spatial != dst_spatial:
                tokens = interpolate_pos_embed(
                    tokens, src_spatial, dst_spatial, frames_tokens
                )
                flat = np.concatenate([extra, tokens], axis=0)
                pos = flat[None] if pos.ndim == 3 else flat
        p["pos_embed"] = pos

    for i in range(depth):
        b = f"blocks.{i}"
        blk: Dict[str, Any] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "attn": {
                "qkv_kernel": sd[f"{b}.attn.qkv.weight"].T.copy(),
                "q_bias": sd[f"{b}.attn.q_bias"].copy(),
                "v_bias": sd[f"{b}.attn.v_bias"].copy(),
            },
            "mlp": {},
        }
        pw, pb = _linear(sd, f"{b}.attn.proj")
        blk["attn"]["proj"] = {"kernel": pw, "bias": pb}
        for fc in ("fc1", "fc2"):
            w_, b_ = _linear(sd, f"{b}.mlp.{fc}")
            blk["mlp"][fc] = {"kernel": w_, "bias": b_}
        if f"{b}.gamma_1" in sd:
            blk["gamma_1"] = sd[f"{b}.gamma_1"].copy()
            blk["gamma_2"] = sd[f"{b}.gamma_2"].copy()
        p[f"blocks_{i}"] = blk

    if "norm.weight" in sd:
        p["norm"] = _ln(sd, "norm")
    return p


def _agg_params(sd: Dict[str, np.ndarray], n_unique: int) -> Dict[str, Any]:
    """agg_block.* -> AggregationBlock tree. For tied models the torch
    state dict repeats identical tensors at every layer index; read the
    first n_unique."""
    p: Dict[str, Any] = {"latents": sd["agg_block.latents"].copy()}
    for i in range(n_unique):
        b = f"agg_block.layers.{i}"
        wq, _ = _linear(sd, f"{b}.0.fn.to_q")
        wk, _ = _linear(sd, f"{b}.0.fn.to_k")
        wv, _ = _linear(sd, f"{b}.0.fn.to_v")
        wo, bo = _linear(sd, f"{b}.0.fn.to_out.0")
        f1w, f1b = _linear(sd, f"{b}.2.fn.net.0")
        f2w, f2b = _linear(sd, f"{b}.2.fn.net.3")
        p[f"layers_{i}"] = {
            "norm_q": _ln(sd, f"{b}.0.norm"),
            "norm_context": _ln(sd, f"{b}.0.norm_context"),
            "cross_attn": {
                "to_q": {"kernel": wq},
                "to_k": {"kernel": wk},
                "to_v": {"kernel": wv},
                "to_out": {"kernel": wo, "bias": bo},
            },
            "norm_ff": _ln(sd, f"{b}.2.norm"),
            "ff_fc1": {"kernel": f1w, "bias": f1b},
            "ff_fc2": {"kernel": f2w, "bias": f2b},
        }
    if "agg_block.last_layer.0.weight" in sd:
        p["last_norm"] = _ln(sd, "agg_block.last_layer.0")
    return p


def _mask_predictor_params(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out = {}
    for flax_name, torch_idx in (("fc1", 0), ("fc2", 2), ("fc3", 4)):
        w, b = _linear(sd, f"mask_predictor.decoder.{torch_idx}")
        out[flax_name] = {"kernel": w, "bias": b}
    return out


def import_torch_state_dict(
    sd: Dict[str, np.ndarray],
    model_kind: str,
    depth: int = 12,
    agg_unique_layers: int = 1,
    expected_head_out: Optional[int] = None,
    dst_spatial: Optional[int] = None,
    frames_tokens: Optional[int] = None,
    num_extra_tokens: Optional[int] = None,
) -> Dict[str, Any]:
    """Build a flax params tree from a torch state dict.

    model_kind: 'slot' | 'plain' | 'multi_task' | 'slot_fusion' | 'backbone'
    expected_head_out: if given and the checkpoint head mismatches, the head
    is dropped (caller keeps its fresh init; ref run_slot_finetuning.py:455-458).
    dst_spatial/frames_tokens: target patch-grid geometry for the learnable
    pos-embed interpolation surgery (ref run_slot_finetuning.py:471-497).
    Returns a partial tree — merge over a freshly initialized tree with
    `merge_params`.
    """
    valid = ("slot", "plain", "multi_task", "slot_fusion", "backbone")
    if model_kind not in valid:
        # a silent fallthrough would import the backbone but drop heads /
        # norms — a correctness trap (an unknown kind once cost a debugging
        # session: the teacher head stayed random-init and only the scene
        # loss drifted)
        raise ValueError(f"unknown model_kind {model_kind!r}; expected one of {valid}")
    sd = strip_prefixes(sd)
    p: Dict[str, Any] = {
        "backbone": _backbone_params(
            sd, depth, dst_spatial=dst_spatial, frames_tokens=frames_tokens,
            num_extra_tokens=num_extra_tokens,
        )
    }

    def add_linear(dst_name: str, torch_name: str):
        if f"{torch_name}.weight" in sd:
            w, b = _linear(sd, torch_name)
            if expected_head_out is not None and w.shape[1] != expected_head_out:
                return  # mismatched head dropped
            p[dst_name] = {"kernel": w, "bias": b}

    if model_kind in ("slot", "slot_fusion"):
        if "agg_block.latents" in sd:
            p["agg_block"] = _agg_params(sd, agg_unique_layers)
    if model_kind == "slot":
        if "mask_predictor.decoder.0.weight" in sd:
            p["mask_predictor"] = _mask_predictor_params(sd)
        if "head.fc1.weight" in sd:  # MLP head variant
            w1, b1 = _linear(sd, "head.fc1")
            w2, b2 = _linear(sd, "head.fc2")
            p["head"] = {"fc1": {"kernel": w1, "bias": b1}, "fc2": {"kernel": w2, "bias": b2}}
        else:
            add_linear("head", "head")
    elif model_kind == "plain":
        if "fc_norm.weight" in sd:
            p["fc_norm"] = _ln(sd, "fc_norm")
        add_linear("head", "head")
    elif model_kind == "multi_task":
        add_linear("head", "head")
        add_linear("scene_head", "scene_head")
    elif model_kind == "slot_fusion":
        add_linear("head", "head")
        for n in ("action_norm", "scene_norm"):
            if f"{n}.weight" in sd:
                p[n] = _ln(sd, n)
        if "fusion_head.classifier.weight" in sd:
            fh: Dict[str, Any] = {}
            for n in ("fc_action_down", "fc_scene_down", "classifier"):
                w, b = _linear(sd, f"fusion_head.{n}")
                fh[n] = {"kernel": w, "bias": b}
            for n in ("fc_action_ln", "fc_scene_ln", "fc_input_ln"):
                if f"fusion_head.{n}.weight" in sd:
                    fh[n] = _ln(sd, f"fusion_head.{n}")
            p["fusion_head"] = fh
        elif "fusion_head.weight" in sd:
            add_linear("fusion_head", "fusion_head")
    return p


def merge_params(init_params, imported, strict: bool = False):
    """Overlay imported leaves onto a freshly initialized tree, keeping
    init values where the checkpoint has nothing (tolerant load, ref
    utils/utils.py:330-375). Shapes must match where both exist."""
    import jax

    missing, loaded = [], []

    def merge(dst: dict, src: dict, path=""):
        out = dict(dst)
        for k, v in src.items():
            kp = f"{path}/{k}"
            if k not in dst:
                missing.append(kp)
                if strict:
                    raise KeyError(f"imported key {kp} not in model tree")
                continue
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, kp)
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {kp}: model {dst[k].shape} vs ckpt {v.shape}"
                    )
                out[k] = jax.numpy.asarray(v, dst[k].dtype)
                loaded.append(kp)
        return out

    merged = merge(init_params, imported)
    return merged, {"loaded": loaded, "unused_in_ckpt": missing}
