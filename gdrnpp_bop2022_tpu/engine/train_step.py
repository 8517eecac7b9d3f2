"""Jitted train/eval steps for GDRN.

The reference's per-iteration python loop body (engine.py:284-343: forward,
loss reduce, backward, NCCL all-reduce, optimizer, EMA) becomes ONE compiled
XLA program: under jit with batch-sharded inputs and replicated params, the
gradient all-reduce is inserted by XLA over the mesh's data axis — no
explicit collectives, no comm backend matrix.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..losses.gdrn_losses import compute_gdrn_losses
from .train_state import TrainState


def _forward_outputs(state, params, batch, cfg, rngs=None, train=True, progress=1.0):
    return state.apply_fn(
        {"params": params},
        roi_img=batch["roi_img"],
        roi_labels=batch["roi_labels"],
        roi_coord_2d=batch["roi_coord_2d"],
        roi_cams=batch["roi_cams"],
        roi_centers=batch["roi_centers"],
        roi_whs=batch["roi_whs"],
        roi_extents=batch["roi_extents"],
        resize_ratios=batch["resize_ratios"],
        roi_depth=batch.get("roi_depth"),
        deterministic=not train,
        progress=progress,
        train=train,
        rngs=rngs,
    )


def make_train_step(cfg, sym_bank=None, sym_mask=None):
    """Build train_step(state, batch, rng) -> (state, metrics)."""

    def loss_fn(params, state, batch, rng, progress):
        outputs = _forward_outputs(
            state, params, batch, cfg, rngs={"dropout": rng}, train=True,
            progress=progress)
        out_for_loss = {
            "vis_mask": outputs["vis_mask"],
            "full_mask": outputs["full_mask"],
            "coor_x": outputs["coor_x"],
            "coor_y": outputs["coor_y"],
            "coor_z": outputs["coor_z"],
            "region": outputs["region"],
            "rot_ego": outputs["rot"],
            "trans": outputs["trans"],
            "centroid_rel": outputs["centroid_rel"],
            "z_rel": outputs["z_rel"],
        }
        losses = compute_gdrn_losses(cfg, out_for_loss, batch,
                                     sym_bank=sym_bank, sym_mask=sym_mask,
                                     log_vars=outputs.get("log_vars"))
        total = sum(losses.values())
        metrics = dict(losses)
        metrics["total_loss"] = total
        # train-time pose error monitoring (reference: compute_mean_re_te)
        from ..geometry.rotations import angular_distance
        metrics["error_R_deg"] = jnp.mean(
            angular_distance(outputs["rot"], batch["gt_rot"])) * (180.0 / jnp.pi)
        metrics["error_t_cm"] = jnp.mean(jnp.linalg.norm(
            outputs["trans"] - batch["gt_trans"], axis=-1)) * 100.0
        return total, metrics

    # donate_argnums=(0,): the old TrainState's buffers are reused for the
    # new one, halving the params+opt-state residency during the update
    # (callers rebind `state = step(state, ...)`; on CPU donation is a no-op)
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict, rng: jax.Array,
                   progress: jax.Array):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, state, batch, rng, progress)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    return train_step


def make_eval_step(cfg, use_ema: bool = True):
    """Build eval_step(state, batch) -> outputs dict (poses + dense maps)."""

    @jax.jit
    def eval_step(state: TrainState, batch: dict):
        params = state.ema_params if use_ema else state.params
        return _forward_outputs(state, params, batch, cfg, train=False)

    return eval_step
