"""Additional optimizers from the reference's solver zoo as optax
transformations.

Reference: lib/torch_utils/solver/ (19 optimizer files; registry
core/utils/solver_utils.py:28-72). Ranger lives in solver/ranger.py; here:
AdaBelief, MADGRAD, SGD with gradient centralization, AdamP/SGDP
projection optimizers, Ranger21. Lamb/RAdam/Adam/SGD come from optax
directly.
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
        # the reference perturbs the lr by eps (madgrad.py step: lr + eps)
        lamb = (lr + eps) * jnp.sqrt(k + 1.0)

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


# ---------------------------------------------------------------------------
# Ranger21 (reference: lib/torch_utils/solver/ranger21.py, registered at
# core/utils/solver_utils.py:38-41). The Adam/PNM engine with the vendored
# file's DEFAULT feature set: adaptive gradient clipping (agc, :271-299),
# gradient centralization + std-normalization (:54-82), positive-negative
# momentum with alternating EMAs (:545-600), softplus-smoothed denominator
# (beta=50), STABLE weight decay (decay / sqrt(mean of debiased v) over the
# whole tree, :418-431), norm loss (pulls unit-wise weight norms toward 1,
# :476-480), and lookahead (k=5, alpha=0.5, :608-645).
#
# Faithful-semantics notes: the vendored `torch.max(max_variance_ma,
# variance_ma, out=variance_ma)` writes into variance_ma with a never-
# updated zero max-buffer, i.e. it is a no-op — not reproduced. unit_norm
# groups by output filter; flax kernels are (kh, kw, I, O) so "all dims but
# the last" is the same grouping transposed. The reference applies no
# internal warmup/warmdown — the external schedule drives lr, as here.
# ---------------------------------------------------------------------------


class Ranger21State(NamedTuple):
    count: jax.Array
    grad_ma: optax.Updates       # positive-step EMA
    neg_grad_ma: optax.Updates   # negative-step EMA
    variance_ma: optax.Updates
    slow: optax.Updates          # lookahead


def _unit_norm(x: jax.Array) -> jax.Array:
    """Euclidean norm grouped per output unit (last axis for flax kernels;
    scalar norm for vectors) — reference ranger21.py:251-269."""
    if x.ndim <= 1:
        return jnp.linalg.norm(x)
    axes = tuple(range(x.ndim - 1))
    return jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=True))


def ranger21(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-4,
             use_gc=True, use_gcnorm=True, agc_clip=1e-2, agc_eps=1e-3,
             pnm_factor=1.0, softplus_beta=50.0, normloss_factor=1e-4,
             lookahead_k=5, lookahead_alpha=0.5) -> optax.GradientTransformation:
    """Ranger21 as one fused optax transformation (see block comment)."""
    noise_norm = jnp.sqrt((1.0 + b2) ** 2 + b2 ** 2)

    def init_fn(params):
        z = lambda: jax.tree.map(jnp.zeros_like, params)
        return Ranger21State(jnp.zeros([], jnp.int32), z(), z(), z(),
                             jax.tree.map(jnp.copy, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("ranger21 requires params")
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr = learning_rate(count - 1) if callable(learning_rate) else learning_rate
        bc1 = 1.0 - jnp.power(b1, t)
        bc2 = 1.0 - jnp.power(b2, t)

        def precondition(p, g):
            # agc: clip per output unit to agc_clip * ||p|| (:271-299)
            p_n = jnp.maximum(_unit_norm(p), agc_eps)
            g_n = _unit_norm(g)
            max_n = p_n * agc_clip
            g = jnp.where(g_n > max_n,
                          g * (max_n / jnp.maximum(g_n, 1e-6)), g)
            if use_gc and g.ndim > 1:
                g = g - jnp.mean(g, axis=tuple(range(1, g.ndim)), keepdims=True)
            if use_gcnorm and g.size > 2:
                g = g / (jnp.std(g) + 1e-8)
            return g

        grads = jax.tree.map(precondition, params, updates)

        variance_ma = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                   state.variance_ma, grads)
        # stable-decay scalar: sqrt of the tree-wide mean of debiased v
        v_sum = sum(jnp.sum(v) for v in jax.tree.leaves(variance_ma)) / bc2
        n_param = sum(v.size for v in jax.tree.leaves(variance_ma))
        # eps floor: all-zero variance (e.g. first step with centralized
        # constant grads) must not blow up the stable-decay division
        variance_normalized = jnp.maximum(jnp.sqrt(v_sum / n_param), eps)

        # pnm: odd steps update grad_ma, even steps update neg_grad_ma
        odd = (count % 2) == 1

        def upd_ema(m, g):
            return b1 * b1 * m + (1 - b1 * b1) * g

        grad_ma = jax.tree.map(
            lambda m, g: jnp.where(odd, upd_ema(m, g), m), state.grad_ma, grads)
        neg_grad_ma = jax.tree.map(
            lambda m, g: jnp.where(odd, m, upd_ema(m, g)),
            state.neg_grad_ma, grads)

        def leaf(p, v, m_pos, m_neg):
            active = jnp.where(odd, m_pos, m_neg)
            other = jnp.where(odd, m_neg, m_pos)
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            denom = jax.nn.softplus(denom * softplus_beta) / softplus_beta
            pnm = ((1.0 + pnm_factor) * active - pnm_factor * other) / noise_norm
            new_p = p
            if weight_decay > 0:
                # clamp: decay may at most zero a weight (guards the
                # divide-by-variance blow-up on degenerate first steps)
                factor = jnp.clip(1.0 - weight_decay * lr
                                  / variance_normalized, 0.0, 1.0)
                new_p = new_p * factor
            if normloss_factor > 0:
                un = _unit_norm(p)
                correction = 2.0 * normloss_factor * (1.0 - 1.0 / (un + eps))
                new_p = new_p * jnp.clip(1.0 - lr * correction, 0.0, 2.0)
            new_p = new_p - (lr / bc1) * pnm / denom
            return new_p

        new_p = jax.tree.map(leaf, params, variance_ma, grad_ma, neg_grad_ma)

        # lookahead (:608-645)
        sync = (count % lookahead_k) == 0

        def look(p_new, p_old, s):
            s_new = jnp.where(sync, s + lookahead_alpha * (p_new - s), s)
            p_fin = jnp.where(sync, s_new, p_new)
            return p_fin - p_old, s_new

        moved = jax.tree.map(look, new_p, params, state.slow)
        delta = jax.tree.map(lambda x: x[0], moved,
                             is_leaf=lambda x: isinstance(x, tuple))
        slow = jax.tree.map(lambda x: x[1], moved,
                            is_leaf=lambda x: isinstance(x, tuple))
        return delta, Ranger21State(count, grad_ma, neg_grad_ma,
                                    variance_ma, slow)

    return optax.GradientTransformation(init_fn, update_fn)
