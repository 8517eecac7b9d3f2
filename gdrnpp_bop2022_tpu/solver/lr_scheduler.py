"""Learning-rate schedules as pure jnp-traceable functions.

The GDRNPP training recipe uses "flat and anneal": (warmup) -> flat at
base_lr until anneal_point (0.72 of training) -> cosine to ~0
(reference: lib/torch_utils/solver/lr_scheduler.py:148-260). Implemented
branch-free with jnp.where so the schedule can live inside the jitted
train step (lr becomes part of the optimizer state update, no host sync).
"""

from __future__ import annotations

import jax.numpy as jnp


def flat_and_anneal_schedule(
    base_lr: float,
    total_iters: int,
    warmup_iters: int = 0,
    warmup_factor: float = 0.1,
    warmup_method: str = "linear",
    warmup_pow: float = 2.0,
    anneal_point: float = 0.72,
    anneal_method: str = "cosine",
    target_lr_factor: float = 0.0,
    poly_power: float = 1.0,
):
    """Returns schedule(step) -> lr (jnp scalar)."""
    total_iters = max(int(total_iters), 1)
    anneal_start = anneal_point * total_iters

    def schedule(step):
        x = jnp.asarray(step, dtype=jnp.float32)

        # warmup factor ---------------------------------------------------
        alpha = x / jnp.maximum(warmup_iters, 1)
        if warmup_method == "linear":
            wf = (1.0 - warmup_factor) * alpha + warmup_factor
        elif warmup_method == "pow":
            wf = (1.0 - warmup_factor) * jnp.power(alpha, warmup_pow) + warmup_factor
        elif warmup_method == "exp":
            wf = jnp.power(warmup_factor, 1.0 - alpha)
        elif warmup_method == "constant":
            wf = jnp.full_like(x, warmup_factor)
        else:
            raise ValueError(f"unknown warmup method {warmup_method}")

        # anneal factor ---------------------------------------------------
        frac = jnp.clip((x - anneal_start) / jnp.maximum(total_iters - anneal_start, 1e-8), 0.0, 1.0)
        if anneal_method == "cosine":
            af = target_lr_factor + 0.5 * (1.0 - target_lr_factor) * (1.0 + jnp.cos(jnp.pi * frac))
        elif anneal_method == "linear":
            af = target_lr_factor + (1.0 - target_lr_factor) * (1.0 - frac)
        elif anneal_method == "poly":
            af = target_lr_factor + (1.0 - target_lr_factor) * jnp.power(1.0 - frac, poly_power)
        elif anneal_method == "exp":
            af = jnp.power(jnp.maximum(target_lr_factor, 1e-8), frac)
        elif anneal_method == "none":
            af = jnp.ones_like(x)
        else:
            raise ValueError(f"unknown anneal method {anneal_method}")

        factor = jnp.where(
            x < warmup_iters, wf,
            jnp.where(x < anneal_start, 1.0, jnp.where(x < total_iters, af, af)))
        return base_lr * factor

    return schedule


def build_lr_scheduler(cfg, iters_per_epoch: int):
    """Schedule from the SolverConfig (reference: solver_utils.py:134-160)."""
    sc = cfg.solver
    total_iters = sc.total_epochs * iters_per_epoch
    if sc.lr_scheduler == "flat_and_anneal":
        return flat_and_anneal_schedule(
            base_lr=sc.base_lr,
            total_iters=total_iters,
            warmup_iters=sc.warmup_iters,
            warmup_factor=sc.warmup_factor,
            warmup_method=sc.warmup_method,
            anneal_point=sc.anneal_point,
            anneal_method=sc.anneal_method,
        )
    if sc.lr_scheduler == "constant":
        return lambda step: jnp.full((), sc.base_lr, dtype=jnp.float32)
    raise ValueError(f"unknown lr scheduler {sc.lr_scheduler}")
