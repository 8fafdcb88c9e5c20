"""Multi-task (action CLS token + scene token) baseline training.

ref: run_multi_task_finetuning.py (696 LoC) + engine/engine_for_multi_task.py.
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
from devias_tpu.train import TrainState, make_multi_task_train_step, make_optimizer


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        "Multi-task ViT finetuning (TPU)", parents=[build_shared_parser("multi-task")]
    )
    parser.add_argument("--unified_head", action="store_true", default=False)
    parser.add_argument("--logit_criterion", default="KL", choices=["KL", "CE"], type=str)
    parser.add_argument("--logit_criterion_weight", default=1.0, type=float)
    parser.add_argument("--scene_model_path", default="", type=str)
    parser.add_argument("--eval_scene", action="store_true")
    # unseen-combination protocols on the multi-task baseline
    # (ref run_multi_task_finetuning.py:87-88,214-216,583-619)
    parser.add_argument("--run_knn", action="store_true", default=False)
    parser.add_argument("--run_scuba", action="store_true", default=False)
    parser.add_argument("--hat_eval", action="store_true", default=False)
    parser.add_argument("--hat_split", default="1", choices=["1", "2", "3"], type=str)
    parser.add_argument("--hat_anno_path", default="", type=str)
    parser.add_argument("--nb_knn", default=[10, 20], nargs="+", type=int)
    parser.add_argument("--temperature", default=0.07, type=float)
    parser.add_argument(
        "--slicing", action="store_true", default=False,
        help="accepted for command compatibility: defined by the reference "
             "parser (run_multi_task_finetuning.py:114) but read nowhere",
    )
    parser.set_defaults(model="disentangle_vit_base_patch16_224")
    return parser.parse_args(argv)


def main(args=None):
    args = args or get_args()
    maybe_init_distributed()  # multi-host; MUST precede any backend use
    # rank-offset seeding (ref run_slot_finetuning.py:261-265)
    np.random.seed(args.seed + jax.process_index())
    mesh = make_mesh()
    rank, world = jax.process_index(), jax.process_count()
    tiny = tiny_overrides(args)

    model = create_model(
        args.model,
        num_classes=args.nb_classes,
        num_scene_classes=365,
        tubelet_size=args.tubelet_size,
        fc_drop_rate=args.fc_drop_rate,
        drop_rate=args.drop,
        drop_path_rate=args.drop_path,
        attn_drop_rate=args.attn_drop_rate,
        init_scale=args.init_scale,
        unified_head=args.unified_head,
        remat=args.use_checkpoint,
        dtype=jnp.bfloat16,
        **tiny,
    )
    teacher = create_model(
        "vit_base_patch16_224", num_classes=365, use_mean_pooling=False,
        tubelet_size=args.tubelet_size, dtype=jnp.bfloat16, **tiny,
    )
    x = jnp.zeros((1, args.num_frames, args.input_size, args.input_size, 3), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(args.seed)}, x)["params"]
    tparams = jax.jit(teacher.init)({"params": jax.random.PRNGKey(args.seed + 1)}, x)["params"]
    total_head = args.nb_classes + (365 if args.unified_head else 0)
    params, _ = finetune_surgery(args, "multi_task", params, total_head)
    if args.scene_model_path:
        from devias_tpu.ckpt import import_torch_state_dict, load_torch_checkpoint_file
        from devias_tpu.ckpt.torch_import import merge_params

        sd = load_torch_checkpoint_file(args.scene_model_path)
        tparams, _ = merge_params(
            tparams, import_torch_state_dict(sd, "plain", expected_head_out=365)
        )

    @jax.jit
    def _action_logits(p, videos):
        out = model.apply({"params": p}, videos, deterministic=True)
        # full-width logits: the reference ranks over the whole action head
        # (A+365 when unified) — ref engine_for_multi_task.py:170-174
        return out["action_logit"]

    @jax.jit
    def _scene_logits(p, videos):
        out = model.apply({"params": p}, videos, deterministic=True)
        # ALWAYS full width: final_test_with_scene_label has a unified_head
        # slice branch (ref engine_for_multi_task.py:266-268) but every
        # reference call site leaves the flag at its False default
        # (run_multi_task_finetuning.py:587,594,601; hat_eval.py:61;
        # run_scuba.py:69) — the slice is dead code there
        return out["scene_logit"]

    @jax.jit
    def teacher_logits_fn(videos):
        return teacher.apply({"params": tparams}, videos, deterministic=True)["logits"]

    params_ref = [params]
    action_logits_fn = lambda v: _action_logits(params_ref[0], v)
    scene_logits_fn = lambda v: _scene_logits(params_ref[0], v)

    out_dir = args.output_dir or "."
    ntasks = world if args.dist_eval else 1

    # pure evaluation modes, in the reference's exclusive dispatch order
    # (ref run_multi_task_finetuning.py:583-620: hat -> scuba -> eval -> knn,
    # each `exit(0)`s)
    if args.hat_eval:
        # scene or action HAT on the multi-task baseline
        # (ref run_multi_task_finetuning.py:583-589)
        from devias_tpu.cli.common import make_hat_loader_factory
        from devias_tpu.eval import hat_eval

        make_hat_loader, versions = make_hat_loader_factory(args)
        if args.eval_scene:
            res = hat_eval(make_hat_loader, scene_logits_fn, args.batch_size,
                           out_dir, versions=versions, num_tasks=ntasks,
                           rank=rank, scene_label_fn=teacher_logits_fn)
        else:
            res = hat_eval(make_hat_loader, action_logits_fn, args.batch_size,
                           out_dir, versions=versions, num_tasks=ntasks, rank=rank)
        print("HAT:", res)
        return

    if args.run_scuba:
        # the MT reference always runs BOTH the FG (action) and BG
        # (scene-vs-teacher) SCUBA tests (run_multi_task_finetuning.py:594)
        from devias_tpu.cli.common import make_scuba_loader
        from devias_tpu.eval import run_scuba

        res = run_scuba(lambda v: make_scuba_loader(args, v),
                        action_logits_fn, args.batch_size, out_dir,
                        bg_forward_fn=scene_logits_fn,
                        bg_scene_label_fn=teacher_logits_fn,
                        num_tasks=ntasks, rank=rank)
        print("SCUBA:", res)
        return

    if args.eval or args.eval_scene:
        ds_test, _ = build_dataset(False, True, make_data_config(args))
        loader = make_eval_loader(ds_test, args)
        if args.eval:
            final_test(loader, action_logits_fn, args.batch_size,
                       os.path.join(out_dir, "test"), rank=rank)
            if rank == 0:
                top1, top5 = merge_results(os.path.join(out_dir, "test"), ntasks)
                print(f"Final top-1 {top1:.2f} top-5 {top5:.2f}")
        if args.eval_scene:
            final_test(loader, scene_logits_fn, args.batch_size,
                       os.path.join(out_dir, "scene_test"), rank=rank,
                       scene_label_fn=teacher_logits_fn)
            if rank == 0:
                top1, top5 = merge_results(os.path.join(out_dir, "scene_test"), ntasks)
                print(f"Scene top-1 {top1:.2f} top-5 {top5:.2f}")
        return

    if args.run_knn:
        # the reference's own MT --run_knn crashes on an arity mismatch
        # (run_multi_task_finetuning.py:619 calls run_knn(model, args)
        # against run_knn.py:166's 3-arg signature); here the probe runs
        # on the CLS/scene tokens.
        from devias_tpu.cli.common import run_knn_protocol

        @jax.jit
        def feature_fn(videos):
            out = model.apply({"params": params_ref[0]}, videos, deterministic=True)
            return out["action_token"], out["scene_token"]

        print("kNN:", run_knn_protocol(args, feature_fn, teacher_logits_fn, rank))
        return

    ds_train, _ = build_dataset(True, False, make_data_config(args))
    loader_train = make_train_loader(ds_train, args)
    ds_val, _ = build_dataset(False, False, make_data_config(args))
    loader_val = make_eval_loader(ds_val, args)
    steps_per_epoch = len(ds_train) // (args.batch_size * args.update_freq * world)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)
    opt_cfg = make_optim_config(args, args.epochs * steps_per_epoch, steps_per_epoch)
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

    base_step = make_multi_task_train_step(
        model, teacher, tx,
        num_action_classes=args.nb_classes,
        logit_criterion=args.logit_criterion,
        logit_criterion_weight=args.logit_criterion_weight,
        unified_head=args.unified_head,
        action_criterion=criterion,
        update_freq=args.update_freq,
        lr_fn=lr_fn,
    )
    step = lambda st, batch, rng: base_step(st, tparams, batch, rng)  # noqa: E731
    train_step = jax.jit(step, donate_argnums=(0,))

    def validate(st):
        params_ref[0] = st.params
        return validation_one_epoch(loader_val, action_logits_fn, args.batch_size)

    state, _ = run_train_loop(
        args, mesh, state, train_step, loader_train, steps_per_epoch,
        validate=validate, start_epoch=start_epoch,
    )
    params_ref[0] = state.params

    ds_test, _ = build_dataset(False, True, make_data_config(args))
    final_test(make_eval_loader(ds_test, args), action_logits_fn, args.batch_size,
               os.path.join(out_dir, "test"), rank=rank)
    if rank == 0:
        top1, top5 = merge_results(os.path.join(out_dir, "test"), ntasks)
        print(f"Final top-1 {top1:.2f} top-5 {top5:.2f}")


if __name__ == "__main__":
    main()
