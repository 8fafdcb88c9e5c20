"""Per-step cosine schedules with linear warmup.

Mirrors the reference's `cosine_scheduler` (ref: utils/utils.py:422-439),
which builds a per-iteration value array: linear warmup from
`warmup_start` over `warmup_steps`, then half-cosine from `base` to
`final` over the remaining steps. The reference writes these values into
optimizer param groups each micro-step (ref: engine/engine_for_slot.py:91-96);
here they are pure functions of the step counter usable inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_schedule(
    base_value: float,
    final_value: float,
    total_steps: int,
    warmup_steps: int = 0,
    warmup_start: float = 0.0,
):
    """Returns f(step) -> value. Matches the reference array semantics:
    warmup is linspace(warmup_start, base, warmup_steps); cosine phase index
    i runs 0..total-warmup-1 with cos(pi * i / (total - warmup))."""
    base_value = float(base_value)
    final_value = float(final_value)
    warmup_steps = int(warmup_steps)
    total_steps = int(total_steps)
    cos_steps = max(total_steps - warmup_steps, 1)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        # linear warmup: value at step s (s < warmup) = start + (base-start)*s/(warmup-1)
        if warmup_steps > 1:
            warm = warmup_start + (base_value - warmup_start) * step / (warmup_steps - 1)
        else:
            warm = jnp.full_like(step, base_value)
        i = jnp.clip(step - warmup_steps, 0, cos_steps - 1)
        cos = final_value + 0.5 * (base_value - final_value) * (
            1.0 + jnp.cos(jnp.pi * i / cos_steps)
        )
        return jnp.where(step < warmup_steps, warm, cos)

    return fn


def cosine_wd_schedule(base_wd: float, final_wd: float, total_steps: int):
    """Weight-decay cosine (no warmup), as in ref run_slot_finetuning.py:577-580."""
    return cosine_schedule(base_wd, final_wd, total_steps, warmup_steps=0)
