"""Checkpoint conversion between PyTorch (.pth) and devias_tpu (orbax).

Usage:
  # torch -> orbax (import a VideoMAE/DEVIAS checkpoint)
  python -m devias_tpu.cli.convert_checkpoint to_orbax \
      --input devias_k400.pth --output /ckpts/devias_k400 \
      --model_kind slot --nb_classes 400 --num_latents 2 --agg_depth 8 \
      --agg_weights_tie

  # orbax -> torch (export trained params for the reference's evaluators)
  python -m devias_tpu.cli.convert_checkpoint to_torch \
      --input /out/ckpt --output exported.pth --model_kind slot ...
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def get_args(argv=None):
    p = argparse.ArgumentParser("checkpoint conversion")
    p.add_argument("direction", choices=["to_orbax", "to_torch"])
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--model_kind", default="slot",
                   choices=["slot", "plain", "multi_task", "slot_fusion"])
    p.add_argument("--nb_classes", type=int, default=400)
    p.add_argument("--num_scene_classes", type=int, default=365)
    p.add_argument("--num_latents", type=int, default=2)
    p.add_argument("--agg_depth", type=int, default=8)
    p.add_argument("--agg_weights_tie", action="store_true", default=False)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--embed_dim", type=int, default=768)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--input_size", type=int, default=224)
    return p.parse_args(argv)


_KIND_TO_NAME = {
    "slot": "slot_vit_base_patch16_224",
    "plain": "vit_base_patch16_224",
    "multi_task": "disentangle_vit_base_patch16_224",
    "slot_fusion": "slot_fusion_vit_base_patch16_224",
}


def build_template(args):
    from devias_tpu.nn import create_model

    kw = dict(
        num_classes=args.nb_classes,
        depth=args.depth, embed_dim=args.embed_dim, num_heads=args.num_heads,
    )
    if args.model_kind != "plain":
        kw["num_scene_classes"] = args.num_scene_classes
    if args.model_kind in ("slot", "slot_fusion"):
        kw.update(num_latents=args.num_latents, agg_depth=args.agg_depth,
                  agg_weights_tie=args.agg_weights_tie)
    model = create_model(_KIND_TO_NAME[args.model_kind], **kw)
    x = jnp.zeros((1, args.num_frames, args.input_size, args.input_size, 3), jnp.float32)
    return model.init({"params": jax.random.PRNGKey(0)}, x)["params"]


def main(argv=None):
    args = get_args(argv)
    params = build_template(args)
    agg_unique = 1 if args.agg_weights_tie else args.agg_depth

    if args.direction == "to_orbax":
        from devias_tpu.ckpt import import_torch_state_dict, load_torch_checkpoint_file, save_checkpoint
        from devias_tpu.ckpt.torch_import import merge_params

        sd = load_torch_checkpoint_file(args.input)
        imported = import_torch_state_dict(
            sd, args.model_kind, depth=args.depth, agg_unique_layers=agg_unique
        )
        merged, report = merge_params(params, imported)
        print(f"loaded {len(report['loaded'])} tensors; "
              f"{len(report['unused_in_ckpt'])} ckpt keys unused")
        save_checkpoint(args.output, 0, {"params": merged})
        print(f"wrote orbax checkpoint to {args.output}")
    else:
        from devias_tpu.ckpt import load_checkpoint
        from devias_tpu.ckpt.torch_export import save_torch_checkpoint

        restored = load_checkpoint(args.input, _latest(args.input), {"params": params})
        save_torch_checkpoint(
            args.output, restored["params"], args.model_kind, agg_depth=args.agg_depth
        )
        print(f"wrote torch checkpoint to {args.output}")


def _latest(path):
    from devias_tpu.ckpt import latest_checkpoint_step

    step = latest_checkpoint_step(path)
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    return step


if __name__ == "__main__":
    main()
