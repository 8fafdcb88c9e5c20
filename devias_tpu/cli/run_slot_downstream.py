"""Downstream transfer with slot fusion: load a DEVIAS checkpoint (incl.
unified head), fine-tune everything with a new fusion head on the target
dataset (full fine-tune — nothing frozen, SURVEY §2.4).

ref: run_slot_downstream.py (591 LoC) + model/modeling_slot_fusion.py +
engine/engine_for_finetuning.py.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from devias_tpu.ckpt import auto_resume
from devias_tpu.cli.common import (
    build_shared_parser,
    finetune_surgery,
    make_data_config,
    make_eval_loader,
    make_optim_config,
    make_train_loader,
    run_train_loop,
    tiny_overrides,
)
from devias_tpu.core.dist import make_mesh, maybe_init_distributed
from devias_tpu.data import build_dataset
from devias_tpu.eval import final_test, merge_results, validation_one_epoch
from devias_tpu.losses import cross_entropy, label_smoothing_cross_entropy
from devias_tpu.nn import create_model
from devias_tpu.train import TrainState, make_classification_train_step, make_optimizer


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        "Slot-fusion downstream transfer (TPU)", parents=[build_shared_parser("downstream")]
    )
    parser.add_argument("--slot_fusion_method", default="concat", choices=["gap", "concat"])
    parser.add_argument("--downstream_nb_classes", default=400, type=int)
    parser.add_argument("--use_input_ln", action="store_true", default=False)
    parser.add_argument("--agg_weights_tie", default=False, action="store_true")
    parser.add_argument("--agg_depth", default=8, type=int)
    parser.add_argument("--num_latents", type=int, default=4)
    parser.add_argument("--head_type", type=str, default="linear")
    parser.add_argument("--agg_block_scale", type=float, default=0.8)
    # accepted for command compatibility: the reference downstream parser
    # defines the mean-pooling toggles (run_slot_downstream.py:149-151) but
    # the slot-fusion model never reads use_mean_pooling.
    parser.add_argument("--use_mean_pooling", action="store_true")
    parser.add_argument("--use_cls", action="store_false", dest="use_mean_pooling")
    parser.set_defaults(model="slot_fusion_vit_base_patch16_224", use_mean_pooling=True,
                        num_workers=8)
    return parser.parse_args(argv)


def main(args=None):
    args = args or get_args()
    maybe_init_distributed()  # multi-host; MUST precede any backend use
    # rank-offset seeding (ref run_slot_finetuning.py:261-265)
    np.random.seed(args.seed + jax.process_index())
    mesh = make_mesh()
    rank, world = jax.process_index(), jax.process_count()

    model = create_model(
        args.model,
        num_classes=args.nb_classes,  # pretrain classes (unified head width)
        num_scene_classes=365,
        downstream_nb_classes=args.downstream_nb_classes,
        tubelet_size=args.tubelet_size,
        fc_drop_rate=args.fc_drop_rate,
        drop_rate=args.drop,
        drop_path_rate=args.drop_path,
        attn_drop_rate=args.attn_drop_rate,
        init_scale=args.init_scale,
        num_latents=args.num_latents,
        agg_depth=args.agg_depth,
        agg_weights_tie=args.agg_weights_tie,
        slot_fusion_method=args.slot_fusion_method,
        head_type=args.head_type,
        use_input_ln=args.use_input_ln,
        remat=args.use_checkpoint,
        dtype=jnp.bfloat16,
        **tiny_overrides(args),
    )
    x = jnp.zeros((1, args.num_frames, args.input_size, args.input_size, 3), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(args.seed)}, x)["params"]
    agg_unique = 1 if args.agg_weights_tie else args.agg_depth
    # loads the DEVIAS K400 ckpt INCLUDING the unified head (ref SURVEY §2.4)
    params, _ = finetune_surgery(args, "slot_fusion", params, args.nb_classes + 365,
                                 agg_unique_layers=agg_unique)

    @jax.jit
    def _logits(p, videos):
        return model.apply({"params": p}, videos, deterministic=True)["logits"]

    params_ref = [params]
    logits_fn = lambda v: _logits(params_ref[0], v)
    out_dir = args.output_dir or "."
    ntasks = world if args.dist_eval else 1

    if args.eval:
        ds_test, _ = build_dataset(False, True, make_data_config(args))
        final_test(make_eval_loader(ds_test, args), logits_fn, args.batch_size,
                   os.path.join(out_dir, "test"), rank=rank)
        if rank == 0:
            top1, top5 = merge_results(os.path.join(out_dir, "test"), ntasks)
            print(f"Final top-1 {top1:.2f} top-5 {top5:.2f}")
        return

    cfg = make_data_config(args, nb_classes=args.downstream_nb_classes)
    ds_train, _ = build_dataset(True, False, cfg)
    loader_train = make_train_loader(ds_train, args)
    ds_val, _ = build_dataset(False, False, cfg)
    loader_val = make_eval_loader(ds_val, args)
    steps_per_epoch = len(ds_train) // (args.batch_size * args.update_freq * world)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)
    opt_cfg = make_optim_config(args, args.epochs * steps_per_epoch, steps_per_epoch,
                                agg_block_scale=args.agg_block_scale)
    tx, lr_fn = make_optimizer(params, opt_cfg)
    state = TrainState.create(params, tx, use_ema=args.model_ema)
    start_epoch = args.start_epoch
    if args.auto_resume and args.output_dir:
        restored, step = auto_resume(os.path.join(args.output_dir, "ckpt"), state)
        if restored is not None:
            state, start_epoch = restored, step + 1

    criterion = (
        (lambda lg, lb: label_smoothing_cross_entropy(lg, lb, args.smoothing))
        if args.smoothing > 0
        else cross_entropy
    )
    train_step = jax.jit(
        make_classification_train_step(
            model, tx, criterion=criterion, update_freq=args.update_freq, lr_fn=lr_fn
        ),
        donate_argnums=(0,),
    )

    def validate(st):
        params_ref[0] = st.params
        return validation_one_epoch(loader_val, logits_fn, args.batch_size)

    state, _ = run_train_loop(
        args, mesh, state, train_step, loader_train, steps_per_epoch,
        validate=validate, start_epoch=start_epoch,
    )
    params_ref[0] = state.params

    ds_test, _ = build_dataset(False, True, cfg)
    final_test(make_eval_loader(ds_test, args), logits_fn, args.batch_size,
               os.path.join(out_dir, "test"), rank=rank)
    if rank == 0:
        top1, top5 = merge_results(os.path.join(out_dir, "test"), ntasks)
        print(f"Final top-1 {top1:.2f} top-5 {top5:.2f}")


if __name__ == "__main__":
    main()
