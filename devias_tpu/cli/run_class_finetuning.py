"""Plain video-classification finetuning (baseline action model, and — with
--use_cls — the scene-model architecture used to train the Places-365
teacher).

ref: run_class_finetuning.py (593 LoC) + engine/engine_for_finetuning.py;
the scene-model training mode additionally mirrors the orphan
engine_for_finetuning_scene.py (teacher-argmax pseudo labels) via
--scene_labels_from (SURVEY §2.3 notes that capability is worth keeping).
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
from devias_tpu.eval import final_test, hat_eval, merge_results, run_scuba, validation_one_epoch
from devias_tpu.losses import cross_entropy, label_smoothing_cross_entropy
from devias_tpu.nn import create_model
from devias_tpu.train import TrainState, make_classification_train_step, make_optimizer


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        "Plain ViT finetuning (TPU)", parents=[build_shared_parser("class")]
    )
    parser.add_argument("--use_cls", action="store_true", default=False,
                        help="CLS-token head instead of mean pooling (ref :142-144)")
    parser.add_argument("--use_mean_pooling", action="store_true", default=True)
    parser.add_argument("--run_scuba", action="store_true", default=False)
    parser.add_argument("--hat_eval", action="store_true")
    parser.add_argument("--hat_split", default="1", choices=["1", "2", "3"], type=str)
    parser.add_argument("--hat_anno_path", default="", type=str)
    parser.add_argument("--scene_labels_from", default="", type=str,
                        help="scene-teacher ckpt: train against its argmax "
                             "pseudo labels (engine_for_finetuning_scene)")
    parser.set_defaults(model="vit_base_patch16_224", num_workers=8)
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
        num_classes=args.nb_classes,
        tubelet_size=args.tubelet_size,
        fc_drop_rate=args.fc_drop_rate,
        drop_rate=args.drop,
        drop_path_rate=args.drop_path,
        attn_drop_rate=args.attn_drop_rate,
        init_scale=args.init_scale,
        use_mean_pooling=not args.use_cls,
        remat=args.use_checkpoint,
        input_norm=args.device_normalize,
        dtype=jnp.bfloat16,
        **tiny_overrides(args),
    )
    x = jnp.zeros((1, args.num_frames, args.input_size, args.input_size, 3), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(args.seed)}, x)["params"]
    params, _ = finetune_surgery(args, "plain", params, args.nb_classes)

    @jax.jit
    def _logits(p, videos):
        return model.apply({"params": p}, videos, deterministic=True)["logits"]

    params_ref = [params]
    logits_fn = lambda v: _logits(params_ref[0], v)

    out_dir = args.output_dir or "."
    ntasks = world if args.dist_eval else 1

    if args.eval or args.hat_eval or args.run_scuba:
        if args.eval:
            ds_test, _ = build_dataset(False, True, make_data_config(args))
            final_test(make_eval_loader(ds_test, args), logits_fn, args.batch_size,
                       os.path.join(out_dir, "test"), rank=rank)
            if rank == 0:
                top1, top5 = merge_results(os.path.join(out_dir, "test"), ntasks)
                print(f"Final top-1 {top1:.2f} top-5 {top5:.2f}")
        if args.run_scuba:
            from devias_tpu.cli.common import make_scuba_loader

            print("SCUBA:", run_scuba(lambda v: make_scuba_loader(args, v),
                                      logits_fn, args.batch_size, out_dir,
                                      num_tasks=ntasks, rank=rank))
        if args.hat_eval:
            from devias_tpu.cli.common import make_hat_loader_factory

            make_hat_loader, versions = make_hat_loader_factory(args)
            print("HAT:", hat_eval(make_hat_loader, logits_fn, args.batch_size,
                                   out_dir, versions=versions,
                                   num_tasks=ntasks, rank=rank))
        return

    # pseudo-label teacher (scene-model training mode)
    teacher_logits_fn = None
    if args.scene_labels_from:
        teacher = create_model(
            "vit_base_patch16_224", num_classes=365, use_mean_pooling=False,
            dtype=jnp.bfloat16, **tiny_overrides(args),
        )
        tparams = jax.jit(teacher.init)({"params": jax.random.PRNGKey(1)}, x)["params"]
        from devias_tpu.ckpt import import_torch_state_dict, load_torch_checkpoint_file
        from devias_tpu.ckpt.torch_import import merge_params

        sd = load_torch_checkpoint_file(args.scene_labels_from)
        tparams, _ = merge_params(
            tparams, import_torch_state_dict(sd, "plain", expected_head_out=365)
        )

        @jax.jit
        def teacher_logits_fn(videos):
            return teacher.apply({"params": tparams}, videos, deterministic=True)["logits"]

    ds_train, _ = build_dataset(True, False, make_data_config(args))
    loader_train = make_train_loader(ds_train, args)
    ds_val, _ = build_dataset(False, False, make_data_config(args))
    loader_val = make_eval_loader(ds_val, args)

    steps_per_epoch = len(ds_train) // (args.batch_size * args.update_freq * world)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)
    opt_cfg = make_optim_config(args, args.epochs * steps_per_epoch, steps_per_epoch)
    tx, lr_fn = make_optimizer(params, opt_cfg)
    state = TrainState.create(params, tx, use_ema=args.model_ema,
                              ema_decay=args.model_ema_decay)
    start_epoch = args.start_epoch
    if args.auto_resume and args.output_dir:
        restored, step = auto_resume(os.path.join(args.output_dir, "ckpt"), state)
        if restored is not None:
            state, start_epoch = restored, step + 1

    mixup_cfg = None
    if args.mixup > 0 or args.cutmix > 0:
        from devias_tpu.aug.mixup import MixupConfig
        from devias_tpu.losses import soft_target_cross_entropy

        mixup_cfg = MixupConfig(
            mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
            prob=args.mixup_prob, switch_prob=args.mixup_switch_prob,
            label_smoothing=args.smoothing, num_classes=args.nb_classes,
            mode=args.mixup_mode,
            cutmix_minmax=tuple(args.cutmix_minmax) if args.cutmix_minmax else None,
        )
        criterion = soft_target_cross_entropy
    elif args.smoothing > 0:
        criterion = lambda lg, lb: label_smoothing_cross_entropy(lg, lb, args.smoothing)
    else:
        criterion = cross_entropy
    base_step = make_classification_train_step(
        model, tx, criterion=criterion, update_freq=args.update_freq, lr_fn=lr_fn,
        mixup_cfg=mixup_cfg,
    )
    if teacher_logits_fn is not None:
        # relabel each batch with the teacher argmax before stepping
        # (ref engine_for_finetuning_scene.py:59-63)
        def step_with_pseudo(state, batch, rng):
            pseudo = jnp.argmax(teacher_logits_fn(batch["videos"]), axis=-1)
            return base_step(state, {**batch, "labels": pseudo}, rng)

        train_step = jax.jit(step_with_pseudo, donate_argnums=(0,))
    else:
        train_step = jax.jit(base_step, donate_argnums=(0,))

    def validate(st):
        params_ref[0] = st.params
        return validation_one_epoch(loader_val, logits_fn, args.batch_size)

    state, best = run_train_loop(
        args, mesh, state, train_step, loader_train, steps_per_epoch,
        validate=validate, start_epoch=start_epoch,
    )
    params_ref[0] = state.params

    ds_test, _ = build_dataset(False, True, make_data_config(args))
    final_test(make_eval_loader(ds_test, args), logits_fn, args.batch_size,
               os.path.join(out_dir, "test"), rank=rank)
    if rank == 0:
        top1, top5 = merge_results(os.path.join(out_dir, "test"), ntasks)
        print(f"Final top-1 {top1:.2f} top-5 {top5:.2f}")


if __name__ == "__main__":
    main()
