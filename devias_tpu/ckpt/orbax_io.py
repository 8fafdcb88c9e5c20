"""Orbax checkpointing with the reference's auto-resume semantics.

ref: utils/utils.py:442-517 — epoch-numbered checkpoints + 'best'
tracking, auto_load_model scanning for the max saved epoch and restoring
model/optimizer/epoch. Here a checkpoint is the whole TrainState pytree
(params, opt_state, ema, step) plus a small metadata dict.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(output_dir: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(output_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(output_dir: str, step: int, state, metadata: Optional[dict] = None,
                    max_to_keep: Optional[int] = None) -> None:
    """Save TrainState (or any pytree) at `step` under output_dir/<step>/."""
    if jax.process_index() != 0 and jax.process_count() > 1:
        # single-controller per-host saving is handled by orbax; master-only
        # guard mirrors ref utils/utils.py:244-246 for the simple local case
        pass
    with _manager(output_dir, max_to_keep) as mgr:
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **(
                {"metadata": ocp.args.JsonSave(metadata)}
                if metadata is not None
                else {}
            ),
        )
        mgr.save(step, args=args)
        mgr.wait_until_finished()


def latest_checkpoint_step(output_dir: str) -> Optional[int]:
    if not os.path.isdir(output_dir):
        return None
    with _manager(output_dir) as mgr:
        return mgr.latest_step()


def load_checkpoint(output_dir: str, step: int, abstract_state: Any):
    """Restore a checkpoint into the structure of `abstract_state`
    (a concrete template pytree, e.g. a freshly created TrainState)."""
    with _manager(output_dir) as mgr:
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(abstract_state)),
        )
    return restored["state"]


def auto_resume(output_dir: str, abstract_state: Any):
    """ref utils/utils.py:467-517: find the newest checkpoint in
    output_dir and restore it; returns (state, step) or (None, None)."""
    step = latest_checkpoint_step(output_dir)
    if step is None:
        return None, None
    return load_checkpoint(output_dir, step, abstract_state), step
