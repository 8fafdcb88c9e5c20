"""HVU slot training: real action+scene labels, FAME-HVU, no teacher.

ref: run_slot_finetuning_hvu.py (603 LoC) + engine/engine_for_slot_hvu.py.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from devias_tpu.aug.fame import FAMEConfig
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
from devias_tpu.data.datasets import HVU_NUM_ACTION_CLASSES, HVU_NUM_SCENE_CLASSES
from devias_tpu.losses import SlotLossConfig
from devias_tpu.nn import create_model
from devias_tpu.train import TrainState, TrainStepConfig, make_hvu_train_step, make_optimizer


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        "HVU slot training (TPU)", parents=[build_shared_parser("hvu")]
    )
    parser.add_argument("--agg_weights_tie", default=False, action="store_true")
    parser.add_argument("--agg_depth", default=4, type=int)
    # defaults mirror the reference parser exactly (run_slot_finetuning_hvu
    # .py:43-73); note its mask_model default is '' — the reference's own
    # no-FAME HVU branch crashes on undefined locals (engine_for_slot_hvu
    # .py:66-77), ours trains without the mask losses
    parser.add_argument("--mask_model", default="", choices=["FAME", ""], type=str)
    parser.add_argument("--beta", type=float, default=0.5)
    parser.add_argument("--prob_aug", type=float, default=0.5)
    parser.add_argument("--mask_distill_loss_weight", type=float, default=1.0)
    parser.add_argument("--mask_prediction_loss_weight", type=float, default=3.0)
    parser.add_argument("--scene_criterion", default="KL", choices=["KL", "CE"], type=str)
    parser.add_argument("--num_latents", type=int, default=4)
    parser.add_argument("--agg_block_scale", type=float, default=0.8)
    parser.add_argument("--head_type", type=str, default="linear")
    parser.add_argument("--slot_matching_method", type=str, default="matching")
    # accepted for command compatibility: defined by the reference parser
    # (run_slot_finetuning_hvu.py:49,57,178) but read nowhere in it — HVU
    # trains with real scene labels (no teacher) and never runs kNN.
    parser.add_argument("--scene_model_path", default="", type=str)
    parser.add_argument("--nb_knn", default=[10, 20], nargs="+", type=int)
    parser.add_argument("--eval_data_path", default=None, type=str)
    parser.set_defaults(model="slot_vit_base_patch16_224", data_set="HVU")
    return parser.parse_args(argv)


def build_hvu_model(args, num_action=HVU_NUM_ACTION_CLASSES, num_scene=HVU_NUM_SCENE_CLASSES):
    return create_model(
        args.model,
        num_classes=num_action,
        num_scene_classes=num_scene,
        tubelet_size=args.tubelet_size,
        fc_drop_rate=args.fc_drop_rate,
        drop_rate=args.drop,
        drop_path_rate=args.drop_path,
        attn_drop_rate=args.attn_drop_rate,
        init_scale=args.init_scale,
        num_latents=args.num_latents,
        head_type=args.head_type,
        slot_matching_method=args.slot_matching_method,
        agg_weights_tie=args.agg_weights_tie,
        agg_depth=args.agg_depth,
        remat=args.use_checkpoint,
        dtype=jnp.bfloat16,
        **tiny_overrides(args),
    )


def hvu_validation(loader, forward_fn, batch_size, num_action):
    """Action + scene top-1 with scene targets offset by the action count
    (ref engine_for_slot_hvu.py:156-200)."""
    import numpy as np

    a1 = s1 = total = 0
    for batch in loader:
        videos = batch["videos"]
        n = videos.shape[0]
        if n < batch_size:
            videos = np.concatenate([videos, np.repeat(videos[-1:], batch_size - n, 0)], 0)
        action_logit, scene_logit = jax.device_get(forward_fn(videos))
        action_logit, scene_logit = np.asarray(action_logit)[:n], np.asarray(scene_logit)[:n]
        al = np.asarray(batch["labels"])[:n]
        sl = np.asarray(batch["scene_labels"])[:n]
        # full-width ranking, scene targets shifted by the action count —
        # the reference never slices the unified head here
        # (ref engine_for_slot_hvu.py:175-183)
        a1 += int((action_logit.argmax(-1) == al).sum())
        s1 += int((scene_logit.argmax(-1) == sl + num_action).sum())
        total += n
    return {
        "acc1": a1 / max(total, 1) * 100,
        "scene_acc1": s1 / max(total, 1) * 100,
    }


def main(args=None):
    args = args or get_args()
    maybe_init_distributed()  # multi-host; MUST precede any backend use
    # rank-offset seeding (ref run_slot_finetuning.py:261-265)
    np.random.seed(args.seed + jax.process_index())
    mesh = make_mesh()
    rank, world = jax.process_index(), jax.process_count()

    model = build_hvu_model(args)
    x = jnp.zeros((1, args.num_frames, args.input_size, args.input_size, 3), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(args.seed)}, x)["params"]
    agg_unique = 1 if args.agg_weights_tie else args.agg_depth
    params, _ = finetune_surgery(
        args, "slot", params, HVU_NUM_ACTION_CLASSES + HVU_NUM_SCENE_CLASSES,
        agg_unique_layers=agg_unique,
    )

    ds_train, (num_action, num_scene) = build_dataset(True, False, make_data_config(args))
    loader_train = make_train_loader(ds_train, args)
    ds_val, _ = build_dataset(False, False, make_data_config(args))
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

    loss_cfg = SlotLossConfig(
        num_action_classes=num_action,
        num_scene_classes=num_scene,
        slot_matching_method=args.slot_matching_method,
        scene_criterion=args.scene_criterion,
        mask_prediction_loss_weight=args.mask_prediction_loss_weight,
        mask_distill_loss_weight=args.mask_distill_loss_weight,
    )
    step_cfg = TrainStepConfig(
        update_freq=args.update_freq,
        use_fame=args.mask_model == "FAME",
        fame=FAMEConfig(beta=args.beta, prob_aug=args.prob_aug),
        num_data_shards=mesh.shape["data"],
    )
    train_step = jax.jit(
        make_hvu_train_step(model, tx, loss_cfg, step_cfg, lr_fn), donate_argnums=(0,)
    )

    @jax.jit
    def _both_logits(p, videos):
        out = model.apply({"params": p}, videos, deterministic=True)
        return out["action_logit"], out["scene_logit"]

    params_ref = [params]

    def validate(st):
        params_ref[0] = st.params
        return hvu_validation(
            loader_val, lambda v: _both_logits(params_ref[0], v),
            args.batch_size, num_action,
        )

    run_train_loop(
        args, mesh, state, train_step, loader_train, steps_per_epoch,
        batch_keys=("videos", "labels", "scene_labels"),
        validate=validate, start_epoch=start_epoch,
    )


if __name__ == "__main__":
    main()
