"""YOLOX training driver.

Reference: det/yolox/engine/yolox_trainer.py (YOLOX_DefaultTrainer): epoch
loop with EMA, AMP, mosaic-close + L1-enable at no_aug_epochs before the
end (:336-356), SGD warmup-cosine. Here: jitted train step over the data
mesh, bf16 compute, the aug switch flips the host loader and rebuilds the
jitted loss with use_l1=True (a one-time recompile, not a per-step cost).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.yolox import build_yolox
from ..models.yolox.head import yolox_loss
from ..parallel import make_mesh, replicated_sharding, shard_batch
from .train_state import create_train_state
from .checkpoint import CheckpointManager


def yolox_warmcos_schedule(base_lr: float, total_iters: int,
                           warmup_iters: int, warmup_lr_start: float = 0.0,
                           min_lr_ratio: float = 0.05):
    def sched(step):
        x = jnp.asarray(step, jnp.float32)
        warm = warmup_lr_start + (base_lr - warmup_lr_start) * jnp.square(
            x / jnp.maximum(warmup_iters, 1))
        frac = jnp.clip((x - warmup_iters)
                        / jnp.maximum(total_iters - warmup_iters, 1), 0, 1)
        cos = base_lr * (min_lr_ratio + 0.5 * (1 - min_lr_ratio)
                         * (1 + jnp.cos(jnp.pi * frac)))
        return jnp.where(x < warmup_iters, warm, cos)
    return sched


def make_yolox_train_step(model, strides=(8, 16, 32), use_l1=False):
    @jax.jit
    def step(state, batch, rng):
        imgs = batch["images"].astype(jnp.float32)

        def loss_fn(params):
            outs = state.apply_fn({"params": params}, imgs)
            losses = yolox_loss(outs, strides, batch["gt_boxes"],
                                batch["gt_labels"], batch["gt_valid"],
                                use_l1=use_l1)
            return losses["total_loss"], losses

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, metrics
    return step


def train_yolox(records, num_classes: int, output_dir: str,
                size: str = "yolox_x", input_size: int = 640,
                batch_size: int = 16, total_iters: int = 1000,
                base_lr: float = 0.01 / 64, weight_decay: float = 5e-4,
                no_aug_iters: int = 0, mesh_shape=(-1,),
                log_period: int = 20, ckpt_period: int = 500,
                seed: int = 0, loader=None):
    """Train YOLOX on detection records. Returns final TrainState."""
    from ..datasets.yolox_loader import YoloxTrainLoader

    model = build_yolox(num_classes, size)
    if loader is None:
        loader = YoloxTrainLoader(records, batch_size, input_size, seed=seed)

    sched = yolox_warmcos_schedule(base_lr * batch_size, total_iters,
                                   warmup_iters=min(500, total_iters // 10))
    tx = optax.chain(
        optax.clip_by_global_norm(35.0),
        optax.sgd(sched, momentum=0.9, nesterov=True),
    )

    host = next(iter(loader))
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.asarray(host["images"][:1]).astype(jnp.float32))
    state = create_train_state(model.apply, variables["params"], tx)

    mesh = make_mesh(mesh_shape, ("data",))
    state = jax.device_put(state, replicated_sharding(mesh))
    ckpt = CheckpointManager(os.path.join(output_dir, "ckpt_yolox"))

    step_aug = make_yolox_train_step(model, use_l1=False)
    step_noaug = make_yolox_train_step(model, use_l1=True)

    import json, time
    os.makedirs(output_dir, exist_ok=True)
    metrics_path = os.path.join(output_dir, "metrics_yolox.json")
    rng = jax.random.PRNGKey(seed + 1)
    host_batch = host
    t0 = time.perf_counter()
    for it in range(total_iters):
        in_noaug = it >= total_iters - no_aug_iters
        if in_noaug and loader.enable_aug:
            # close mosaic + enable L1 (reference yolox_trainer.py:336-356)
            loader.mosaic_prob = 0.0
            loader.mixup_prob = 0.0
            loader.enable_aug = False
        step_fn = step_noaug if in_noaug else step_aug
        rng, k = jax.random.split(rng)
        batch = shard_batch(jax.tree.map(jnp.asarray, host_batch), mesh)
        state, metrics = step_fn(state, batch, k)
        if (it + 1) % log_period == 0 or it == 0:
            row = {k_: float(v) for k_, v in jax.device_get(metrics).items()}
            row["iteration"] = it + 1
            with open(metrics_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            eta = (time.perf_counter() - t0) / (it + 1) * (total_iters - it - 1)
            print(f"yolox iter {it+1}/{total_iters} "
                  f"loss {row['total_loss']:.3f} eta {eta/60:.1f}min",
                  flush=True)
        if (it + 1) % ckpt_period == 0 or (it + 1) == total_iters:
            ckpt.save(state, it + 1)
        if it + 1 < total_iters:
            host_batch = next(iter(loader))
    loader.close()
    return state
