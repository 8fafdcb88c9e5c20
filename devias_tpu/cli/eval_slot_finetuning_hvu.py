"""HVU seen/unseen evaluation: 4 metric blocks (action/scene x seen/unseen).

ref: eval_slot_finetuning_hvu.py (347 LoC) — builds two datasets from the
'SEEN UNSEEN' anno pair and runs validation_action / validation_scene on
each (ref :258-273, :337-340; engine_for_slot_hvu.py:203-280).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from devias_tpu.cli.common import build_shared_parser, finetune_surgery, make_data_config, make_eval_loader
from devias_tpu.data import build_dataset
from devias_tpu.data.datasets import HVU_NUM_ACTION_CLASSES, HVU_NUM_SCENE_CLASSES
from devias_tpu.cli.run_slot_finetuning_hvu import build_hvu_model
from devias_tpu.eval.merge import accuracy_topk


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        "HVU seen/unseen evaluation (TPU)", parents=[build_shared_parser("hvu-eval")],
        conflict_handler="resolve",
    )
    # the reference passes the SEEN and UNSEEN filelists as two tokens
    # (--anno_path SEEN UNSEEN, nargs='+', ref eval_slot_finetuning_hvu.py:
    # 40-41, docs/EVAL.md:82) — override the shared single-string flag
    parser.add_argument("--anno_path", default=[], nargs="+", type=str)
    parser.add_argument("--agg_weights_tie", default=False, action="store_true")
    parser.add_argument("--agg_depth", default=4, type=int)
    parser.add_argument("--num_latents", type=int, default=4)
    parser.add_argument("--head_type", type=str, default="linear")
    parser.add_argument("--slot_matching_method", type=str, default="matching")
    # accepted for command compatibility: the reference eval script inherits
    # these training flags in its parser (eval_slot_finetuning_hvu.py:
    # 44-62,170) but never reads them at eval time.
    parser.add_argument("--nb_knn", default=[10, 20], nargs="+", type=int)
    parser.add_argument("--agg_block_scale", type=float, default=0.8)
    parser.add_argument("--mask_model", default="", choices=["FAME", ""], type=str)
    parser.add_argument("--beta", type=float, default=0.5)
    parser.add_argument("--prob_aug", type=float, default=0.5)
    parser.add_argument("--mask_distill_loss_weight", type=float, default=1.0)
    parser.add_argument("--mask_prediction_loss_weight", type=float, default=3.0)
    parser.add_argument("--eval_data_path", default=None, type=str)
    parser.set_defaults(model="slot_vit_base_patch16_224", data_set="HVU-EVAL")
    return parser.parse_args(argv)


def validation_block(loader, forward_fn, batch_size, num_action, which: str):
    """which='action': FULL-width action logits vs action labels; 'scene':
    FULL-width scene logits vs scene labels offset by num_action — the
    reference ranks top-1/top-5 over the whole unified (A+SC) head in both
    blocks, never a slice (ref engine_for_slot_hvu.py:203-280)."""
    logits_all, labels_all = [], []
    for batch in loader:
        videos = batch["videos"]
        n = videos.shape[0]
        if n < batch_size:
            videos = np.concatenate([videos, np.repeat(videos[-1:], batch_size - n, 0)], 0)
        action_logit, scene_logit = jax.device_get(forward_fn(videos))
        if which == "action":
            logits_all.append(np.asarray(action_logit)[:n])
            labels_all.append(np.asarray(batch["labels"])[:n])
        else:
            logits_all.append(np.asarray(scene_logit)[:n])
            labels_all.append(np.asarray(batch["scene_labels"])[:n] + num_action)
    logits = np.concatenate(logits_all)
    labels = np.concatenate(labels_all)
    t1, t5 = accuracy_topk(logits, labels)
    return {"acc1": t1, "acc5": t5}


def main(args=None):
    args = args or get_args()
    # normalize the SEEN/UNSEEN pair to the factory's space-joined form
    # (a single quoted "SEEN UNSEEN" token keeps working)
    if isinstance(args.anno_path, (list, tuple)):
        args.anno_path = " ".join(args.anno_path)
    from devias_tpu.core.dist import maybe_init_distributed

    maybe_init_distributed()  # multi-host (ref utils/utils.py:249-282)
    model = build_hvu_model(args)
    x = jnp.zeros((1, args.num_frames, args.input_size, args.input_size, 3), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(args.seed)}, x)["params"]
    agg_unique = 1 if args.agg_weights_tie else args.agg_depth
    params, _ = finetune_surgery(
        args, "slot", params, HVU_NUM_ACTION_CLASSES + HVU_NUM_SCENE_CLASSES,
        agg_unique_layers=agg_unique,
    )

    @jax.jit
    def forward_fn(videos):
        out = model.apply({"params": params}, videos, deterministic=True)
        return out["action_logit"], out["scene_logit"]

    datasets, (num_action, _) = build_dataset(False, False, make_data_config(args))
    seen_ds, unseen_ds = datasets
    results = {}
    for name, ds in (("seen", seen_ds), ("unseen", unseen_ds)):
        loader = make_eval_loader(ds, args)
        results[f"action_{name}"] = validation_block(
            loader, forward_fn, args.batch_size, num_action, "action")
        loader = make_eval_loader(ds, args)
        results[f"scene_{name}"] = validation_block(
            loader, forward_fn, args.batch_size, num_action, "scene")
    for k, v in results.items():  # 4 metric blocks (ref :337-340)
        print(f"{k}: top-1 {v['acc1']:.2f} top-5 {v['acc5']:.2f}")
    return results


if __name__ == "__main__":
    main()
