"""DEVIAS slot training / evaluation entry point.

Flag-compatible with the reference `run_slot_finetuning.py` (published
commands in docs/TRAIN.md / docs/EVAL.md run unchanged). The torch/
DeepSpeed-specific flags are accepted and ignored where TPU makes them
moot (bf16 replaces the fp16 engine).

ref: run_slot_finetuning.py:250-740.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from devias_tpu.aug.fame import FAMEConfig
from devias_tpu.ckpt import auto_resume, save_checkpoint
from devias_tpu.cli.common import (
    JsonlLogger,
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
from devias_tpu.losses import SlotLossConfig
from devias_tpu.nn import create_model
from devias_tpu.train import (
    TrainState,
    TrainStepConfig,
    make_optimizer,
    make_slot_train_step,
)


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        "DEVIAS slot training (TPU)", parents=[build_shared_parser("slot")]
    )
    # slot-specific flags (ref run_slot_finetuning.py:43-73, 184-213)
    parser.add_argument("--run_knn", action="store_true", default=False)
    parser.add_argument("--run_scuba", action="store_true", default=False)
    parser.add_argument("--agg_weights_tie", default=False, action="store_true")
    parser.add_argument("--agg_depth", default=8, type=int)
    parser.add_argument("--scene_model_path", default="", type=str)
    parser.add_argument("--mask_model", default="", choices=["FAME", "Segformer", ""], type=str)
    parser.add_argument(
        "--segformer_ckpt", default="", type=str,
        help="local SegFormer-B3 checkpoint (HF snapshot dir / pytorch_model"
             ".bin / model.safetensors) for --mask_model Segformer; the "
             "reference pulls nvidia/segformer-b3-finetuned-cityscapes from "
             "the hub (ref run_slot_finetuning.py:425), this environment "
             "has no egress so the weights must be local",
    )
    parser.add_argument(
        "--segformer_variant", default="b3", choices=["b0", "b3"], type=str,
        help="SegFormer geometry; the reference uses b3 (b0 exists for tests)",
    )
    parser.add_argument("--beta", type=float, default=0.5)
    parser.add_argument("--prob_aug", type=float, default=0.5)
    parser.add_argument("--mask_distill_loss_weight", type=float, default=1)
    parser.add_argument("--mask_prediction_loss_weight", type=float, default=3)
    parser.add_argument("--scene_loss_weight", type=float, default=4000)
    parser.add_argument("--scene_criterion", default="KL", choices=["KL", "CE"], type=str)
    parser.add_argument("--nb_knn", default=[10, 20], nargs="+", type=int)
    parser.add_argument("--temperature", default=0.07, type=float)
    parser.add_argument("--num_latents", type=int, default=4)
    parser.add_argument("--agg_block_scale", type=float, default=0.8)
    parser.add_argument("--head_type", type=str, default="linear")
    parser.add_argument(
        "--slot_matching_method", type=str, default="matching",
        choices=["hard_select", "matching"],
    )
    parser.add_argument("--hat_split", default="1", choices=["1", "2", "3"], type=str)
    parser.add_argument("--hat_eval", action="store_true")
    parser.add_argument("--hat_anno_path", default="", type=str)
    parser.add_argument("--scuba_val", action="store_true")
    parser.add_argument("--eval_scene", action="store_true")
    parser.add_argument(
        "--teacher_int8", action="store_true", default=False,
        help="run the frozen scene teacher's GEMMs as w8a8 int8 on the MXU "
             "(2x bf16 rate on v5e). NOT the parity path: perturbs teacher "
             "logits by a bounded amount (tests/test_quant.py); devias_tpu "
             "extension, off by default",
    )
    parser.set_defaults(model="slot_vit_base_patch16_224")
    return parser.parse_args(argv)


def build_models(args, dtype=jnp.bfloat16):
    tiny = tiny_overrides(args)
    model = create_model(
        args.model,
        **tiny,
        num_classes=args.nb_classes,
        num_scene_classes=365,
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
        input_norm=args.device_normalize,
        dtype=dtype,
    )
    # frozen Places-365 scene teacher: CLS-token variant
    # (ref run_slot_finetuning.py:392-406, use_mean_pooling=False)
    teacher = create_model(
        "vit_base_patch16_224",
        num_classes=365,
        tubelet_size=args.tubelet_size,
        use_mean_pooling=False,
        input_norm=args.device_normalize,
        int8_dense=getattr(args, "teacher_int8", False),
        dtype=dtype,
        **tiny,
    )
    return model, teacher


def init_params(args, model, teacher):
    x = jnp.zeros((1, args.num_frames, args.input_size, args.input_size, 3), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(args.seed)}, x)["params"]
    tparams = jax.jit(teacher.init)({"params": jax.random.PRNGKey(args.seed + 1)}, x)["params"]

    agg_unique = 1 if args.agg_weights_tie else args.agg_depth
    params, _ = finetune_surgery(args, "slot", params, args.nb_classes + 365,
                                 agg_unique_layers=agg_unique)
    if args.scene_model_path:
        from devias_tpu.ckpt import import_torch_state_dict, load_torch_checkpoint_file
        from devias_tpu.ckpt.torch_import import merge_params

        sd = load_torch_checkpoint_file(args.scene_model_path)
        imported = import_torch_state_dict(sd, "plain", expected_head_out=365)
        tparams, rep = merge_params(tparams, imported)
        print(f"scene teacher load: {len(rep['loaded'])} tensors")
    return params, tparams


def main(args=None):
    args = args or get_args()
    maybe_init_distributed()  # multi-host; MUST precede any backend use
    # rank-offset seeding (ref run_slot_finetuning.py:261-265)
    np.random.seed(args.seed + jax.process_index())
    mp_flags = [
        ("--pp_stages", getattr(args, "pp_stages", 1)),
        ("--sp_shards", getattr(args, "sp_shards", 1)),
        ("--tp_size", getattr(args, "tp_size", 1)),
    ]
    active = [f for f, v in mp_flags if v > 1]
    if len(active) > 1:
        raise ValueError(f"{' and '.join(active)} are mutually exclusive")
    if getattr(args, "pp_stages", 1) > 1:
        # (data, pipe) mesh: backbone pipeline-parallel, batch over data
        from devias_tpu.core.pipeline import make_pp_mesh

        mesh = make_pp_mesh(args.pp_stages)
    elif getattr(args, "sp_shards", 1) > 1:
        # (data, seq) mesh: backbone sequence-parallel, batch over data
        from devias_tpu.core.dist import make_sp_mesh

        mesh = make_sp_mesh(args.sp_shards)
    elif getattr(args, "tp_size", 1) > 1:
        # (data, model) mesh: Megatron-style TP param placement; the step
        # itself is unchanged (GSPMD derives the all-reduces)
        mesh = make_mesh(model_parallel=args.tp_size)
    else:
        mesh = make_mesh()
    rank, world = jax.process_index(), jax.process_count()

    model, teacher = build_models(args)
    params, tparams = init_params(args, model, teacher)

    loss_cfg = SlotLossConfig(
        num_action_classes=args.nb_classes,
        num_scene_classes=365,
        slot_matching_method=args.slot_matching_method,
        scene_criterion=args.scene_criterion,
        scene_loss_weight=args.scene_loss_weight,
        mask_prediction_loss_weight=args.mask_prediction_loss_weight,
        mask_distill_loss_weight=args.mask_distill_loss_weight,
    )

    # jitted eval forwards; params passed explicitly so the latest training
    # params are used (a closure would bake them in at trace time)
    @jax.jit
    def _action_logits(p, videos):
        # FULL (nb_classes+365)-width logits: the reference ranks top-1/5,
        # computes val CE, and writes result files over the whole unified
        # head, never an action slice (ref engine_for_slot.py:236-239,
        # 277-289 — `output` is the model's action_logit as returned)
        return model.apply({"params": p}, videos, deterministic=True)["action_logit"]

    @jax.jit
    def _scene_logits(p, videos):
        return model.apply({"params": p}, videos, deterministic=True)["scene_logit"][:, args.nb_classes :]

    @jax.jit
    def _teacher_logits(videos):
        return teacher.apply({"params": tparams}, videos, deterministic=True)["logits"]

    params_ref = [params]  # updated as training advances
    action_logits_fn = lambda v: _action_logits(params_ref[0], v)
    scene_logits_fn = lambda v: _scene_logits(params_ref[0], v)
    teacher_logits_fn = _teacher_logits

    # ---- pure evaluation modes ------------------------------------------
    if args.eval or args.eval_scene or args.hat_eval or args.run_scuba or args.run_knn:
        run_evaluations(args, model, params_ref, action_logits_fn, scene_logits_fn,
                        teacher_logits_fn, rank, world)
        return

    # ---- training --------------------------------------------------------
    cfg_train = make_data_config(args)
    ds_train, nb_classes = build_dataset(True, False, cfg_train)
    if isinstance(nb_classes, int) and nb_classes != args.nb_classes:
        print(f"WARNING: dataset reports {nb_classes} classes but "
              f"--nb_classes is {args.nb_classes}; using --nb_classes")
    loader_train = make_train_loader(ds_train, args)
    ds_val, _ = build_dataset(False, False, cfg_train)
    loader_val = make_eval_loader(ds_val, args)

    steps_per_epoch = len(ds_train) // (args.batch_size * args.update_freq * world)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)
    total_steps = args.epochs * steps_per_epoch
    opt_cfg = make_optim_config(args, total_steps, steps_per_epoch,
                                agg_block_scale=args.agg_block_scale)
    tx, lr_fn = make_optimizer(params, opt_cfg)
    state = TrainState.create(params, tx, use_ema=args.model_ema,
                              ema_decay=args.model_ema_decay)

    start_epoch = args.start_epoch
    if args.resume:
        # explicit checkpoint dir (ref --resume, run_slot_finetuning.py:198)
        restored, step = auto_resume(args.resume, state)
        if restored is None:
            raise FileNotFoundError(f"--resume {args.resume}: no checkpoint found")
        state, start_epoch = restored, step + 1
        print(f"resumed from {args.resume} epoch {step}")
    elif args.auto_resume and args.output_dir:
        restored, step = auto_resume(os.path.join(args.output_dir, "ckpt"), state)
        if restored is not None:
            state, start_epoch = restored, step + 1
            print(f"auto-resumed from epoch {step}")

    segformer_apply = None
    if args.mask_model == "Segformer":
        # frozen SegFormer-B3 person-mask model (ref run_slot_finetuning.py:
        # 423-427); weights must be a local HF checkpoint (no egress here).
        if not args.segformer_ckpt:
            raise SystemExit(
                "--mask_model Segformer requires --segformer_ckpt pointing at "
                "a local nvidia/segformer-b3-finetuned-cityscapes-1024-1024 "
                "checkpoint (HF snapshot dir, pytorch_model.bin, or "
                "model.safetensors). Use FAME (the published DEVIAS recipe) "
                "if no weights are available."
            )
        from devias_tpu.ckpt.segformer_import import import_segformer_params
        from devias_tpu.nn.segformer import Segformer, segformer_b0, segformer_b3

        seg_cfg = {"b0": segformer_b0, "b3": segformer_b3}[args.segformer_variant]()
        seg_model = Segformer(seg_cfg, dtype=jnp.bfloat16)
        seg_params = jax.tree.map(
            jnp.asarray, import_segformer_params(args.segformer_ckpt, seg_cfg)
        )
        segformer_apply = lambda frames: seg_model.apply(
            {"params": seg_params}, frames
        )
    step_cfg = TrainStepConfig(
        update_freq=args.update_freq,
        use_fame=args.mask_model == "FAME",
        fame=FAMEConfig(beta=args.beta, prob_aug=args.prob_aug),
        num_data_shards=mesh.shape["data"],
        device_normalize=args.device_normalize,
        pp_microbatches=args.pp_microbatches,
    )
    train_step = jax.jit(
        make_slot_train_step(
            model, teacher, tx, loss_cfg, step_cfg, lr_fn,
            segformer_apply=segformer_apply,
            pp_mesh=mesh if args.pp_stages > 1 else None,
            sp_mesh=mesh if getattr(args, "sp_shards", 1) > 1 else None,
        ),
        donate_argnums=(0,),
    )

    logger = JsonlLogger(args.output_dir)
    best_scuba = [-1.0]

    def validate(state):
        params_ref[0] = state.params
        return validation_one_epoch(loader_val, action_logits_fn, args.batch_size)

    def on_epoch_end(state, epoch, record):
        params_ref[0] = state.params
        if not args.scuba_val:
            return None
        # periodic SCUBA validation with scuba-best tracking
        # (ref run_slot_finetuning.py:689-703)
        try:
            scuba = run_scuba(
                lambda variant: _make_scuba_loader(args, variant),
                action_logits_fn, args.batch_size,
                os.path.join(args.output_dir or ".", f"scuba_val_ep{epoch}"),
                num_tasks=world if args.dist_eval else 1, rank=rank,
            )
            mean_top1 = float(np.mean([v["acc1"] for v in scuba.values()])) if scuba else 0.0
            if mean_top1 > best_scuba[0] and args.output_dir and args.save_ckpt and rank == 0:
                best_scuba[0] = mean_top1
                save_checkpoint(os.path.join(args.output_dir, "ckpt_scuba_best"), epoch, state)
            return {"scuba_val_top1": round(mean_top1, 3)}
        except FileNotFoundError as exc:
            print(f"scuba_val skipped: {exc}")
            return None

    state, _ = run_train_loop(
        args, mesh, state, train_step, loader_train, steps_per_epoch,
        extra_step_args=(tparams,),
        validate=validate,
        logger=logger,
        start_epoch=start_epoch,
        on_epoch_end=on_epoch_end,
    )
    params_ref[0] = state.params

    # final test + merge (ref run_slot_finetuning.py:715-726)
    ds_test, _ = build_dataset(False, True, make_data_config(args))
    loader_test = make_eval_loader(ds_test, args)
    final_test(loader_test, action_logits_fn, args.batch_size,
               os.path.join(args.output_dir or ".", "test"), rank=rank)
    if rank == 0:
        top1, top5 = merge_results(os.path.join(args.output_dir or ".", "test"),
                                   world if args.dist_eval else 1)
        print(f"Final top-1 {top1:.2f} top-5 {top5:.2f}")
        logger.write({"final_top1": top1, "final_top5": top5})


def run_evaluations(args, model, params_ref, action_logits_fn, scene_logits_fn,
                    teacher_logits_fn, rank, world):
    """Reference dispatch order with the same exclusivity: HAT exits before
    anything else runs (ref run_slot_finetuning.py:604-611 `exit(0)`), so
    --hat_eval --eval_scene means scene HAT only, never the plain scene
    test on top."""
    out_dir = args.output_dir or "."
    ntasks = world if args.dist_eval else 1

    if args.hat_eval:
        from devias_tpu.cli.common import make_hat_loader_factory

        make_hat_loader, versions = make_hat_loader_factory(args)
        if args.eval_scene:
            # scene HAT: scene logits vs teacher argmax (ref
            # run_slot_finetuning.py:606-609, hat_eval.py:61)
            res = hat_eval(make_hat_loader, scene_logits_fn, args.batch_size,
                           out_dir, versions=versions, num_tasks=ntasks,
                           rank=rank, scene_label_fn=teacher_logits_fn)
        else:
            res = hat_eval(make_hat_loader, action_logits_fn, args.batch_size,
                           out_dir, versions=versions, num_tasks=ntasks, rank=rank)
        print("HAT:", res)
        return

    if args.eval:
        ds_test, _ = build_dataset(False, True, make_data_config(args))
        loader = make_eval_loader(ds_test, args)
        final_test(loader, action_logits_fn, args.batch_size,
                   os.path.join(out_dir, "test"), rank=rank)
        if rank == 0:
            top1, top5 = merge_results(os.path.join(out_dir, "test"), ntasks)
            print(f"Final top-1 {top1:.2f} top-5 {top5:.2f}")

    if args.eval_scene:
        ds_test, _ = build_dataset(False, True, make_data_config(args))
        loader = make_eval_loader(ds_test, args)
        final_test(loader, scene_logits_fn, args.batch_size,
                   os.path.join(out_dir, "scene_test"), rank=rank,
                   scene_label_fn=teacher_logits_fn)
        if rank == 0:
            top1, top5 = merge_results(os.path.join(out_dir, "scene_test"), ntasks)
            print(f"Scene top-1 {top1:.2f} top-5 {top5:.2f}")

    if args.run_scuba:
        # forced 2x3 views (ref run_scuba.py:19)
        res = run_scuba(lambda v: _make_scuba_loader(args, v), action_logits_fn,
                        args.batch_size, out_dir, num_tasks=ntasks, rank=rank)
        print("SCUBA:", res)

    if args.run_knn:
        from devias_tpu.cli.common import run_knn_protocol

        @jax.jit
        def feature_fn(videos):
            out = model.apply({"params": params_ref[0]}, videos, deterministic=True)
            return out["action_feat"], out["scene_feat"]

        print("kNN:", run_knn_protocol(args, feature_fn, teacher_logits_fn, rank))


def _scuba_ds(args) -> str:
    return {"Kinetics-400": "k400", "UCF101": "ucf101"}.get(args.data_set, "ucf101")


def _make_scuba_loader(args, variant: str):
    from devias_tpu.cli.common import make_scuba_loader

    return make_scuba_loader(args, variant)


if __name__ == "__main__":
    main()
