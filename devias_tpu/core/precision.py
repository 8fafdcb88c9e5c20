"""Mixed-precision policy for TPU.

The reference trains in fp16 with DeepSpeed dynamic loss scaling
(ref: utils/utils.py:520-549, run flag --enable_deepspeed). On TPU the
idiomatic equivalent is bfloat16 compute with float32 parameters and no
loss scaling (bf16 has fp32's exponent range).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy: params stored in `param_dtype`, compute in `compute_dtype`,
    reductions/softmax/logits in `output_dtype`."""

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_param(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT_POLICY = Policy()
F32_POLICY = Policy(compute_dtype=jnp.float32)
