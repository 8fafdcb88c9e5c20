"""Export devias_tpu params to a reference-layout PyTorch state dict.

The inverse of torch_import (checkpoint compatibility in BOTH directions,
SURVEY §5.4): the produced dict round-trips through
`import_torch_state_dict` and matches the reference's key names
(model/modeling_slot.py module tree), so trained TPU checkpoints can be
evaluated by the original PyTorch code.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _linear_out(sd, name, tree):
    sd[f"{name}.weight"] = _np(tree["kernel"]).T.copy()
    if "bias" in tree:
        sd[f"{name}.bias"] = _np(tree["bias"]).copy()


def _ln_out(sd, name, tree):
    sd[f"{name}.weight"] = _np(tree["scale"]).copy()
    sd[f"{name}.bias"] = _np(tree["bias"]).copy()


def export_backbone(sd: Dict[str, np.ndarray], bb: Dict[str, Any],
                    patch_size: int = 16, tubelet: int = 2, in_chans: int = 3):
    k = _np(bb["patch_embed"]["kernel"])  # [t*p*p*C, D]
    D = k.shape[1]
    sd["patch_embed.proj.weight"] = (
        k.reshape(tubelet, patch_size, patch_size, in_chans, D).transpose(4, 3, 0, 1, 2).copy()
    )
    sd["patch_embed.proj.bias"] = _np(bb["patch_embed"]["bias"]).copy()
    if "cls_token" in bb:
        sd["cls_token"] = _np(bb["cls_token"]).copy()
    if "suffix_tokens" in bb:
        sd["scene_token"] = _np(bb["suffix_tokens"]).copy()
    if "pos_embed" in bb:
        sd["pos_embed"] = _np(bb["pos_embed"]).copy()
    i = 0
    while f"blocks_{i}" in bb:
        blk = bb[f"blocks_{i}"]
        b = f"blocks.{i}"
        _ln_out(sd, f"{b}.norm1", blk["norm1"])
        _ln_out(sd, f"{b}.norm2", blk["norm2"])
        sd[f"{b}.attn.qkv.weight"] = _np(blk["attn"]["qkv_kernel"]).T.copy()
        sd[f"{b}.attn.q_bias"] = _np(blk["attn"]["q_bias"]).copy()
        sd[f"{b}.attn.v_bias"] = _np(blk["attn"]["v_bias"]).copy()
        _linear_out(sd, f"{b}.attn.proj", blk["attn"]["proj"])
        _linear_out(sd, f"{b}.mlp.fc1", blk["mlp"]["fc1"])
        _linear_out(sd, f"{b}.mlp.fc2", blk["mlp"]["fc2"])
        if "gamma_1" in blk:
            sd[f"{b}.gamma_1"] = _np(blk["gamma_1"]).copy()
            sd[f"{b}.gamma_2"] = _np(blk["gamma_2"]).copy()
        i += 1
    if "norm" in bb:
        _ln_out(sd, "norm", bb["norm"])


def export_agg(sd: Dict[str, np.ndarray], agg: Dict[str, Any], depth: int):
    """Tied models replicate the single unique layer across all `depth`
    indices, exactly as the reference's cache_fn tying stores it."""
    sd["agg_block.latents"] = _np(agg["latents"]).copy()
    unique = sorted(int(n.split("_")[1]) for n in agg if n.startswith("layers_"))
    for i in range(depth):
        lay = agg[f"layers_{unique[min(i, len(unique) - 1)]}"]
        b = f"agg_block.layers.{i}"
        _ln_out(sd, f"{b}.0.norm", lay["norm_q"])
        _ln_out(sd, f"{b}.0.norm_context", lay["norm_context"])
        for t_name in ("to_q", "to_k", "to_v"):
            sd[f"{b}.0.fn.{t_name}.weight"] = _np(lay["cross_attn"][t_name]["kernel"]).T.copy()
        _linear_out(sd, f"{b}.0.fn.to_out.0", lay["cross_attn"]["to_out"])
        _ln_out(sd, f"{b}.2.norm", lay["norm_ff"])
        _linear_out(sd, f"{b}.2.fn.net.0", lay["ff_fc1"])
        _linear_out(sd, f"{b}.2.fn.net.3", lay["ff_fc2"])
    if "last_norm" in agg:
        _ln_out(sd, "agg_block.last_layer.0", agg["last_norm"])


def export_torch_state_dict(params: Dict[str, Any], model_kind: str,
                            agg_depth: int = 8) -> Dict[str, np.ndarray]:
    """params: flax tree of a devias_tpu model. model_kind as in
    torch_import. Returns {torch_key: np.ndarray}."""
    sd: Dict[str, np.ndarray] = {}
    export_backbone(sd, params["backbone"])
    if "agg_block" in params:
        export_agg(sd, params["agg_block"], agg_depth)
    if "mask_predictor" in params:
        for f_name, idx in (("fc1", 0), ("fc2", 2), ("fc3", 4)):
            _linear_out(sd, f"mask_predictor.decoder.{idx}", params["mask_predictor"][f_name])
    if "fc_norm" in params:
        _ln_out(sd, "fc_norm", params["fc_norm"])
    for name in ("action_norm", "scene_norm"):
        if name in params:
            _ln_out(sd, name, params[name])
    if "head" in params:
        if "fc1" in params["head"]:  # MLP head
            _linear_out(sd, "head.fc1", params["head"]["fc1"])
            _linear_out(sd, "head.fc2", params["head"]["fc2"])
        else:
            _linear_out(sd, "head", params["head"])
    if "scene_head" in params:
        _linear_out(sd, "scene_head", params["scene_head"])
    if "fusion_head" in params:
        fh = params["fusion_head"]
        if "classifier" in fh:
            for n in ("fc_action_down", "fc_scene_down", "classifier"):
                _linear_out(sd, f"fusion_head.{n}", fh[n])
            for n in ("fc_action_ln", "fc_scene_ln", "fc_input_ln"):
                if n in fh:
                    _ln_out(sd, f"fusion_head.{n}", fh[n])
        else:
            _linear_out(sd, "fusion_head", fh)
    return sd


def save_torch_checkpoint(path: str, params: Dict[str, Any], model_kind: str,
                          agg_depth: int = 8, epoch: int = 0) -> None:
    """Write a torch-loadable .pth with the reference container layout
    ({'model': state_dict, 'epoch': epoch})."""
    import torch

    sd = export_torch_state_dict(params, model_kind, agg_depth)
    torch.save(
        {"model": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
         "epoch": epoch},
        path,
    )
