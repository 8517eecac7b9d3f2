"""Train state: params + optimizer + EMA, as one pytree.

Replaces the reference's LightningLite/fvcore state plumbing
(reference: core/gdrn_modeling/engine/engine.py:219-241) with a flax
struct — checkpointable via orbax, shardable via NamedSharding.

EMA follows the reference ramp ``decay * (1 - exp(-updates/2000))``
(lib/torch_utils/torch_utils.py:225, det/yolox/utils/ema.py:23).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    ema_decay: float = struct.field(pytree_node=False, default=0.9999)
    ema_warmup: float = struct.field(pytree_node=False, default=2000.0)
    # non-gradient collections (BatchNorm running stats for norm="BN"
    # models); None for the GN/LN default stacks
    batch_stats: Any = None

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = ema_update(new_params, self.ema_params, self.step + 1,
                             self.ema_decay, self.ema_warmup)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, ema_params=new_ema)


def ema_update(params, ema_params, updates_count, decay=0.9999, warmup=2000.0):
    d = decay * (1.0 - jnp.exp(-updates_count.astype(jnp.float32) / warmup))
    return jax.tree.map(lambda e, p: e * d + (1.0 - d) * p, ema_params, params)


def create_train_state(apply_fn, params, tx, ema_decay=0.9999,
                       ema_warmup=2000.0, batch_stats=None):
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
        tx=tx,
        apply_fn=apply_fn,
        ema_decay=ema_decay,
        ema_warmup=ema_warmup,
        batch_stats=batch_stats,
    )
