"""Export loop closed against the reference: a repo slot model exported
with torch_export must load into the REFERENCE torch model (strict=True)
and produce the same forward outputs.

test_reference_golden.py proves torch->repo import parity; this proves the
reverse repo->torch direction, so checkpoints can round-trip between the
frameworks in both directions (ref model/modeling_slot.py:337-422 for the
consuming model).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _ref_oracle import load_reference  # noqa: E402
from devias_tpu.ckpt.torch_export import export_torch_state_dict  # noqa: E402
from devias_tpu.nn import create_model  # noqa: E402

load_reference()

from model import modeling_slot  # noqa: E402

A_CLS, SC_CLS = 7, 11
DEPTH, FRAMES, AGG_DEPTH, HEADS = 2, 4, 2, 12


def test_exported_slot_model_matches_in_torch():
    model = create_model(
        "slot_vit_base_patch16_224", num_classes=A_CLS,
        num_scene_classes=SC_CLS, depth=DEPTH, num_heads=HEADS,
        num_latents=2, agg_depth=AGG_DEPTH, agg_weights_tie=True,
        slot_matching_method="matching",
    )
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, FRAMES, 224, 224, 3)).astype(np.float32) * 0.5
    params = model.init({"params": jax.random.PRNGKey(3)}, jnp.asarray(x))["params"]

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_torch_state_dict(params, "slot", agg_depth=AGG_DEPTH).items()
    }

    norm = lambda d: torch.nn.LayerNorm(d, eps=1e-6)  # noqa: E731
    net = modeling_slot.VisionTransformer(
        img_size=224, patch_size=16, num_classes=A_CLS, embed_dim=768,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=norm, init_scale=0.001, all_frames=FRAMES,
        tubelet_size=2, num_latents=2, slot_matching_method="matching",
        num_scene_classes=SC_CLS, agg_weights_tie=True, agg_depth=AGG_DEPTH,
    )
    # strict load: every reference key must be provided, nothing extra
    net.load_state_dict(sd, strict=True)
    net.eval()

    with torch.no_grad():
        _, (t_action, t_scene, t_attn), (t_slots_head, t_slots, t_masks) = net(
            torch.from_numpy(x.transpose(0, 4, 1, 2, 3)).contiguous()
        )

    out = model.apply({"params": params}, jnp.asarray(x), deterministic=True)

    np.testing.assert_allclose(
        np.asarray(out["action_logit"]), t_action.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["scene_logit"]), t_scene.numpy(), rtol=1e-4, atol=1e-4
    )
    B = x.shape[0]
    np.testing.assert_allclose(
        np.asarray(out["slots_head"]).reshape(t_slots_head.shape),
        t_slots_head.numpy(), rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["mask_predictions"]).reshape(t_masks.shape),
        t_masks.numpy(), rtol=1e-4, atol=1e-4,
    )
