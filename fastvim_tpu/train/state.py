"""Train state: params + optimizer + EMA, as a flax struct pytree."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_params: Any = None  # None disables EMA

    @classmethod
    def create(cls, params, tx, ema: bool = False):
        opt_state = tx.init(params)
        # copy=True: an fp32 astype would alias the param buffer, and the
        # donated train step would then donate the same buffer twice
        ema_params = jax.tree_util.tree_map(
            lambda p: jnp.array(p, dtype=jnp.float32, copy=True),
            params) if ema else None
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=opt_state, ema_params=ema_params, tx=tx)

    def apply_gradients(self, grads, ema_decay: Optional[float] = None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if self.ema_params is not None and ema_decay is not None:
            from fastvim_tpu.train.optim import ema_update

            new_ema = ema_update(self.ema_params, new_params, ema_decay)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt, ema_params=new_ema)
