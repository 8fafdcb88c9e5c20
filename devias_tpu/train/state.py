"""Train state pytree: params, optimizer state, EMA, step counter.

Replaces the reference's model/optimizer/scaler/EMA checkpoint tuple
(ref: utils/utils.py:442-517). bf16 training on TPU needs no loss scaler.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.9999)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, use_ema: bool = False,
               ema_decay: float = 0.9999):
        return cls(
            step=jnp.zeros([], jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
            ema_decay=ema_decay,
        )

    def apply_updates(self, updates):
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self.ema_decay
            new_ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, new_ema, new_params)
        return self.replace(step=self.step + 1, params=new_params, ema_params=new_ema)
