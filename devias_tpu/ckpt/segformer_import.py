"""Import HuggingFace SegformerForSemanticSegmentation weights into the
flax Segformer (devias_tpu.nn.segformer).

The reference loads ``nvidia/segformer-b3-finetuned-cityscapes-1024-1024``
from the hub (ref run_slot_finetuning.py:425); this environment has no
egress, so the importer takes a *local* checkpoint: an HF snapshot
directory, a ``pytorch_model.bin`` / ``.pth`` torch state dict, or a
``model.safetensors`` file (or an in-memory dict for tests).

Key mapping (HF torch -> flax, layouts converted OIHW->HWIO etc.):
  segformer.encoder.patch_embeddings.{s}.proj        -> patch_embed_{s}_proj
  segformer.encoder.patch_embeddings.{s}.layer_norm  -> patch_embed_{s}_norm
  segformer.encoder.block.{s}.{i}.layer_norm_1       -> block_{s}_{i}.norm1
  ...attention.self.{query,key,value}                -> ...attn.{q,k,v}
  ...attention.self.sr / .layer_norm                 -> ...attn.sr / .sr_norm
  ...attention.output.dense                          -> ...attn.proj
  ...mlp.{dense1,dwconv.dwconv,dense2}               -> ...mlp.*
  segformer.encoder.layer_norm.{s}                   -> stage_norm_{s}
  decode_head.linear_c.{s}.proj                      -> linear_c_{s}
  decode_head.linear_fuse / batch_norm / classifier  -> linear_fuse / bn / classifier

Golden parity test: tests/test_segformer.py.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from devias_tpu.nn.segformer import SegformerConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t.astype(np.float32)
    return t.detach().cpu().float().numpy()  # torch tensor


def _linear(sd, prefix):
    return {"kernel": _np(sd[prefix + ".weight"]).T, "bias": _np(sd[prefix + ".bias"])}


def _conv(sd, prefix, bias=True):
    out = {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _dwconv(sd, prefix):
    # torch depthwise (C,1,kh,kw), groups=C  ->  flax HWIO (kh,kw,1,C)
    return {
        "kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd[prefix + ".bias"]),
    }


def _ln(sd, prefix):
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def load_state_dict(path: str) -> Dict:
    """Load a torch/safetensors state dict from a local file or HF snapshot
    directory."""
    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin", "pytorch_model.pth"):
            p = os.path.join(path, name)
            if os.path.exists(p):
                path = p
                break
        else:
            raise FileNotFoundError(f"no checkpoint file under {path}")
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def import_segformer_params(state_dict, config: SegformerConfig) -> Dict:
    """HF torch state dict -> flax params for devias_tpu.nn.segformer.Segformer."""
    sd = state_dict
    if isinstance(sd, str):
        sd = load_state_dict(sd)
    e = "segformer.encoder"
    params: Dict = {}
    for s in range(4):
        params[f"patch_embed_{s}_proj"] = _conv(sd, f"{e}.patch_embeddings.{s}.proj")
        params[f"patch_embed_{s}_norm"] = _ln(sd, f"{e}.patch_embeddings.{s}.layer_norm")
        params[f"stage_norm_{s}"] = _ln(sd, f"{e}.layer_norm.{s}")
        for i in range(config.depths[s]):
            b = f"{e}.block.{s}.{i}"
            attn = {
                "q": _linear(sd, f"{b}.attention.self.query"),
                "k": _linear(sd, f"{b}.attention.self.key"),
                "v": _linear(sd, f"{b}.attention.self.value"),
                "proj": _linear(sd, f"{b}.attention.output.dense"),
            }
            if config.sr_ratios[s] > 1:
                attn["sr"] = _conv(sd, f"{b}.attention.self.sr")
                attn["sr_norm"] = _ln(sd, f"{b}.attention.self.layer_norm")
            params[f"block_{s}_{i}"] = {
                "norm1": _ln(sd, f"{b}.layer_norm_1"),
                "attn": attn,
                "norm2": _ln(sd, f"{b}.layer_norm_2"),
                "mlp": {
                    "dense1": _linear(sd, f"{b}.mlp.dense1"),
                    "dwconv": _dwconv(sd, f"{b}.mlp.dwconv.dwconv"),
                    "dense2": _linear(sd, f"{b}.mlp.dense2"),
                },
            }
    for s in range(4):
        params[f"linear_c_{s}"] = _linear(sd, f"decode_head.linear_c.{s}.proj")
    params["linear_fuse"] = _conv(sd, "decode_head.linear_fuse", bias=False)
    params["bn"] = {
        "scale": _np(sd["decode_head.batch_norm.weight"]),
        "bias": _np(sd["decode_head.batch_norm.bias"]),
        "mean": _np(sd["decode_head.batch_norm.running_mean"]),
        "var": _np(sd["decode_head.batch_norm.running_var"]),
    }
    params["classifier"] = _conv(sd, "decode_head.classifier")
    return params
