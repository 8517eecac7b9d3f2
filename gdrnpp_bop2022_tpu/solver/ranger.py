"""Ranger optimizer (RAdam + Lookahead + Gradient Centralization) as a
single optax GradientTransformation.

Reference semantics: lib/torch_utils/solver/ranger.py (the GDRNPP training
optimizer, configs/gdrn/ycbv/...ycbv.py OPTIMIZER_CFG type="Ranger").
Implemented as one fused pytree update — RAdam's variance-rectification
branch becomes a jnp.where so the whole step stays inside jit; Lookahead's
slow weights live in the optimizer state (synced every k steps via where-
masked interpolation rather than host-side control flow).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class RangerState(NamedTuple):
    count: jax.Array            # int32 step counter
    exp_avg: optax.Updates      # first moment
    exp_avg_sq: optax.Updates   # second moment
    slow: optax.Updates         # lookahead slow weights


def _centralize(g: jax.Array) -> jax.Array:
    if g.ndim > 1:
        axes = tuple(range(1, g.ndim))
        return g - jnp.mean(g, axis=axes, keepdims=True)
    return g


def ranger(
    learning_rate: optax.ScalarOrSchedule,
    alpha: float = 0.5,
    k: int = 6,
    n_sma_threshold: float = 5.0,
    b1: float = 0.95,
    b2: float = 0.999,
    eps: float = 1e-5,
    weight_decay: float = 0.0,
    use_gc: bool = True,
    gc_conv_only: bool = False,
    belief: bool = False,
) -> optax.GradientTransformation:
    """Build the Ranger transformation. Pass params to update().

    belief=True gives RangerAdaBelief (reference
    lib/torch_utils/solver/ranger_adabelief.py, solver_utils.py:54-59):
    the second moment tracks the variance of the gradient around its EMA,
    (g - m)^2, instead of the raw g^2.
    """
    gc_dim_threshold = 3 if gc_conv_only else 1

    def init_fn(params):
        return RangerState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=jax.tree.map(jnp.zeros_like, params),
            exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
            slow=jax.tree.map(jnp.copy, params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("ranger requires params for weight decay + lookahead")
        count = state.count + 1
        t = count.astype(jnp.float32)

        if use_gc:
            updates = jax.tree.map(
                lambda g: _centralize(g) if g.ndim > gc_dim_threshold else g, updates)

        exp_avg = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, updates)
        if belief:
            exp_avg_sq = jax.tree.map(
                lambda v, g, m: b2 * v + (1 - b2) * (g - m) * (g - m),
                state.exp_avg_sq, updates, exp_avg)
        else:
            exp_avg_sq = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                      state.exp_avg_sq, updates)

        beta2_t = jnp.power(b2, t)
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1.0 - beta2_t)
        bias1 = 1.0 - jnp.power(b1, t)

        rect = jnp.sqrt(
            jnp.maximum(
                (1.0 - beta2_t) * (n_sma - 4.0) / (n_sma_max - 4.0)
                * (n_sma - 2.0) / jnp.maximum(n_sma, 1e-8)
                * n_sma_max / (n_sma_max - 2.0),
                0.0,
            )
        ) / bias1
        plain = 1.0 / bias1
        use_var = n_sma > n_sma_threshold

        lr = learning_rate(count - 1) if callable(learning_rate) else learning_rate

        def radam_delta(p, m, v):
            denom_step = m / (jnp.sqrt(v) + eps) * rect
            flat_step = m * plain
            step = jnp.where(use_var, denom_step, flat_step)
            if weight_decay != 0.0:
                step = step + weight_decay * p
            return -lr * step

        delta = jax.tree.map(radam_delta, params, exp_avg, exp_avg_sq)

        # lookahead: every k steps pull fast weights toward slow ----------
        sync = (count % k) == 0

        def look(p, d, s):
            fast = p + d
            s_new = jnp.where(sync, s + alpha * (fast - s), s)
            p_new = jnp.where(sync, s_new, fast)
            return p_new - p, s_new

        moved = jax.tree.map(look, params, delta, state.slow)
        new_updates = jax.tree.map(lambda x: x[0],
                                   moved, is_leaf=lambda x: isinstance(x, tuple))
        new_slow = jax.tree.map(lambda x: x[1],
                                moved, is_leaf=lambda x: isinstance(x, tuple))

        return new_updates, RangerState(count, exp_avg, exp_avg_sq, new_slow)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(cfg, lr_schedule) -> optax.GradientTransformation:
    """Optimizer factory (reference: core/utils/solver_utils.py:28-110)."""
    sc = cfg.solver
    name = sc.optimizer.lower()
    if name == "ranger":
        tx = ranger(lr_schedule, weight_decay=sc.weight_decay)
    elif name in ("rangeradabelief", "ranger_adabelief"):
        tx = ranger(lr_schedule, weight_decay=sc.weight_decay, belief=True)
    elif name == "ranger21":
        from .optimizers import ranger21
        tx = ranger21(lr_schedule, weight_decay=sc.weight_decay)
    elif name == "adamp":
        from .optimizers import adamp
        tx = adamp(lr_schedule, weight_decay=sc.weight_decay)
    elif name == "sgdp":
        from .optimizers import sgdp
        tx = sgdp(lr_schedule, momentum=sc.momentum,
                  weight_decay=sc.weight_decay)
    elif name == "adamw":
        tx = optax.adamw(lr_schedule, weight_decay=sc.weight_decay)
    elif name == "adam":
        tx = optax.adam(lr_schedule)
    elif name == "sgd":
        tx = optax.sgd(lr_schedule, momentum=sc.momentum)
    elif name == "lamb":
        tx = optax.lamb(lr_schedule, weight_decay=sc.weight_decay)
    elif name == "radam":
        tx = optax.radam(lr_schedule)
    elif name == "adabelief":
        from .optimizers import adabelief
        tx = adabelief(lr_schedule, weight_decay=sc.weight_decay)
    elif name == "madgrad":
        from .optimizers import madgrad
        tx = madgrad(lr_schedule, momentum=sc.momentum,
                     weight_decay=sc.weight_decay)
    elif name == "sgd_gc":
        from .optimizers import sgd_gc
        tx = sgd_gc(lr_schedule, momentum=sc.momentum,
                    weight_decay=sc.weight_decay)
    else:
        raise ValueError(f"unknown optimizer {sc.optimizer}")

    # per-module LR multipliers (reference LR_MULT param groups,
    # core/gdrn_modeling/models/model_utils.py:108-341): applied as a
    # final update scaler keyed on the top-level param subtree, which
    # equals per-group lr for any optimizer whose step is linear in lr.
    lr_mults = {}
    pn = getattr(getattr(getattr(cfg, "model", None), "pose_net", None),
                 "geo_head", None)
    if pn is not None and cfg.model.pose_net.geo_head.lr_mult != 1.0:
        lr_mults["geo_head"] = cfg.model.pose_net.geo_head.lr_mult
    if pn is not None and cfg.model.pose_net.pnp_net.lr_mult != 1.0:
        lr_mults["pnp_net"] = cfg.model.pose_net.pnp_net.lr_mult

    chain = []
    if sc.nan_grad_to_zero:
        # reference: engine.py:330-333 SET_NAN_GRAD_TO_ZERO
        chain.append(optax.GradientTransformation(
            lambda params: optax.EmptyState(),
            lambda u, s, p=None: (jax.tree.map(
                lambda g: jnp.where(jnp.isfinite(g), g, 0.0), u), s),
        ))
    if sc.clip_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(sc.clip_grad_norm))
    chain.append(tx)
    if lr_mults:
        chain.append(scale_updates_by_module(lr_mults))
    out = optax.chain(*chain) if len(chain) > 1 else tx
    if sc.grad_accum_steps > 1:
        out = optax.MultiSteps(out, every_k_schedule=sc.grad_accum_steps)
    return out


def scale_updates_by_module(lr_mults: dict) -> optax.GradientTransformation:
    """Scale final updates per top-level param subtree ("geo_head",
    "pnp_net", ...) — the TPU equivalent of the reference's per-module
    param groups with lr = BASE_LR * LR_MULT. Scaling the post-optimizer
    update (not the gradient) is required because adaptive optimizers are
    invariant to gradient scale."""

    def update_fn(updates, state, params=None):
        del params

        def scale(path, u):
            key = getattr(path[0], "key", None) if path else None
            return u * lr_mults.get(key, 1.0)

        return (jax.tree_util.tree_map_with_path(scale, updates), state)

    return optax.GradientTransformation(lambda p: optax.EmptyState(),
                                        update_fn)
