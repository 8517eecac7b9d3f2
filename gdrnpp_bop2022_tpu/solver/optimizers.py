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


# ---------------------------------------------------------------------------
# AdamP / SGDP (reference: lib/torch_utils/solver/adamp.py, sgdp.py,
# registered at core/utils/solver_utils.py:60-65). The key idea: for
# scale-invariant weights (those whose gradient is nearly orthogonal to the
# weight — e.g. anything followed by a normalization layer), remove the
# radial component of the update so the effective step does not blow up the
# weight norm, and shrink weight decay by wd_ratio.
#
# Torch views a kernel as (C_out, rest); flax conv kernels are
# (kh, kw, I, O), so the channel view here groups by the LAST axis — the
# same per-output-filter grouping, transposed. The reference's data-
# dependent `if cosine_sim.max() < ...: return` becomes nested jnp.where.
# ---------------------------------------------------------------------------


def _cosine_max(x, y, eps):
    """max over rows of |cos(x_r, y_r)| for 2D views (rows, cols)."""
    num = jnp.abs(jnp.sum(x * y, axis=1))
    den = jnp.maximum(jnp.linalg.norm(x, axis=1) * jnp.linalg.norm(y, axis=1), eps)
    return jnp.max(num / den)


def _projected(p2, u2, eps):
    """Remove the component of each row of u2 along the same row of p2."""
    p_n = p2 / (jnp.linalg.norm(p2, axis=1, keepdims=True) + eps)
    return u2 - p_n * jnp.sum(p_n * u2, axis=1, keepdims=True)


def _adamp_project(p, grad, perturb, delta, wd_ratio, eps):
    """(perturb', wd_ratio') per reference adamp.py:48-62."""
    if p.ndim <= 1:
        return perturb, jnp.float32(1.0)
    ch = lambda x: x.reshape(-1, x.shape[-1]).T       # (C_out, rest)
    ly = lambda x: x.reshape(1, -1)
    n_ch = ch(p).shape[1]
    n_ly = p.size
    cond_ch = _cosine_max(ch(grad), ch(p), eps) < delta / jnp.sqrt(jnp.float32(n_ch))
    cond_ly = _cosine_max(ly(grad), ly(p), eps) < delta / jnp.sqrt(jnp.float32(n_ly))
    proj_ch = _projected(ch(p), ch(perturb), eps).T.reshape(p.shape)
    proj_ly = _projected(ly(p), ly(perturb), eps).reshape(p.shape)
    out = jnp.where(cond_ch, proj_ch, jnp.where(cond_ly, proj_ly, perturb))
    wd = jnp.where(cond_ch | cond_ly, wd_ratio, 1.0).astype(jnp.float32)
    return out, wd


class AdamPState(NamedTuple):
    count: jax.Array
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates


def adamp(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
          delta=0.1, wd_ratio=0.1, nesterov=False) -> optax.GradientTransformation:
    """AdamP (reference adamp.py:13-122) as one optax transformation."""

    def init_fn(params):
        return AdamPState(jnp.zeros([], jnp.int32),
                          jax.tree.map(jnp.zeros_like, params),
                          jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("adamp requires params")
        count = state.count + 1
        t = count.astype(jnp.float32)
        bias1 = 1.0 - jnp.power(b1, t)
        bias2 = 1.0 - jnp.power(b2, t)
        lr = learning_rate(count - 1) if callable(learning_rate) else learning_rate
        exp_avg = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                               state.exp_avg, updates)
        exp_avg_sq = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                  state.exp_avg_sq, updates)

        def leaf(p, g, m, v):
            denom = jnp.sqrt(v) / jnp.sqrt(bias2) + eps
            perturb = ((b1 * m + (1 - b1) * g) / denom if nesterov
                       else m / denom)
            perturb, wd = _adamp_project(p, g, perturb, delta, wd_ratio, eps)
            step = -(lr / bias1) * perturb
            if weight_decay > 0:
                step = step - lr * weight_decay * wd * p
            return step

        delta_tree = jax.tree.map(leaf, params, updates, exp_avg, exp_avg_sq)
        return delta_tree, AdamPState(count, exp_avg, exp_avg_sq)

    return optax.GradientTransformation(init_fn, update_fn)


class SGDPState(NamedTuple):
    count: jax.Array
    momentum: optax.Updates


def sgdp(learning_rate, momentum=0.9, dampening=0.0, weight_decay=0.0,
         delta=0.1, wd_ratio=0.1, nesterov=False,
         eps=1e-8) -> optax.GradientTransformation:
    """SGDP (reference sgdp.py:13-116) as one optax transformation."""

    def init_fn(params):
        return SGDPState(jnp.zeros([], jnp.int32),
                         jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("sgdp requires params")

        buf = jax.tree.map(lambda b, g: momentum * b + (1 - dampening) * g,
                           state.momentum, updates)
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)

        def leaf(p, g, b):
            d_p = g + momentum * b if nesterov else b
            d_p, wd = _adamp_project(p, g, d_p, delta, wd_ratio, eps)
            step = -lr * d_p
            if weight_decay > 0:
                step = step - lr * weight_decay * wd / (1 - momentum) * p
            return step

        delta_tree = jax.tree.map(leaf, params, updates, buf)
        return delta_tree, SGDPState(state.count + 1, buf)

    return optax.GradientTransformation(init_fn, update_fn)
