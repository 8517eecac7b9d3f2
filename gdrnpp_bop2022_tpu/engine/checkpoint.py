"""Checkpointing via orbax.

Replaces the reference's fvcore MyCheckpointer + PeriodicCheckpointer
(core/utils/my_checkpoint.py:34, engine.py:219-249): saves the whole
TrainState (params, optimizer, EMA, step); keeps max_to_keep; `last` symlink
semantics via orbax's latest-step tracking.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state, step: int):
        payload = {
            "step": np.asarray(jax.device_get(state.step)),
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "ema_params": jax.device_get(state.ema_params),
        }
        # BatchNorm running stats (norm="BN" models) must survive
        # resume/release — they are state, not derivable from params
        if getattr(state, "batch_stats", None) is not None:
            payload["batch_stats"] = jax.device_get(state.batch_stats)
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def restore_latest(self, template_state):
        step = self._mgr.latest_step()
        if step is None:
            return None
        template = {
            "step": np.asarray(jax.device_get(template_state.step)),
            "params": jax.device_get(template_state.params),
            "opt_state": jax.device_get(template_state.opt_state),
            "ema_params": jax.device_get(template_state.ema_params),
        }
        has_bs = getattr(template_state, "batch_stats", None) is not None
        if has_bs:
            template["batch_stats"] = jax.device_get(
                template_state.batch_stats)
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        except Exception:
            if not has_bs:
                raise
            # pre-batch_stats checkpoint: restore without them and keep
            # the template's (fresh) stats
            template.pop("batch_stats")
            has_bs = False
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        out = template_state.replace(
            step=restored["step"], params=restored["params"],
            opt_state=restored["opt_state"], ema_params=restored["ema_params"])
        if has_bs and "batch_stats" in restored:
            out = out.replace(batch_stats=restored["batch_stats"])
        return out

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()
