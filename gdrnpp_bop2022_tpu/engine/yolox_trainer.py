"""YOLOX training driver.

Reference: det/yolox/engine/yolox_trainer.py (YOLOX_DefaultTrainer):
epoch loop with EMA, AMP, resume (:207-224), periodic in-train eval with
best-checkpoint tracking (:226-283 hooks), mosaic-close + L1-enable at
no_aug_epochs before the end (:336-356), random multiscale resize every 10
iters (:413-416), SGD warmup-cosine. Here: jitted train step over the data
mesh, bf16 compute; the aug switch flips the host loader and rebuilds the
jitted loss with use_l1=True; multiscale resize is a device-side bilinear
resize + box rescale (each size is one extra XLA compile, cached).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import Callable, Optional, Sequence

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


def make_yolox_train_step(model, strides=(8, 16, 32), use_l1=False,
                          with_batch_stats=False):
    """with_batch_stats: thread BatchNorm running stats (norm="BN" models)
    through the step — forward runs with mutable batch_stats and the
    updated stats land back in the TrainState."""
    # donated state: optimizer/param buffers are updated in place (callers
    # rebind `state = step(state, ...)`; donation is ignored on CPU)
    @partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, rng):
        imgs = batch["images"].astype(jnp.float32)

        def loss_fn(params):
            if with_batch_stats:
                outs, upd = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    imgs, mutable=["batch_stats"])
            else:
                outs = state.apply_fn({"params": params}, imgs)
                upd = None
            losses = yolox_loss(outs, strides, batch["gt_boxes"],
                                batch["gt_labels"], batch["gt_valid"],
                                use_l1=use_l1)
            return losses["total_loss"], (losses, upd)

        (_, (metrics, upd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        if with_batch_stats:
            new_state = new_state.replace(batch_stats=upd["batch_stats"])
        return new_state, metrics
    return step


def precise_bn_stats(model, params, batch_stats, image_batches,
                     momentum=None):
    """Recompute BatchNorm running stats as the TRUE average over the given
    batches (reference: fvcore PreciseBN hook, yolox_trainer.py:242-250).

    Works at any BN momentum m without rebuilding the model: one mutable
    apply turns ra into ra' = m*ra + (1-m)*b, so the batch statistic is
    recovered as b = (ra' - m*ra) / (1-m), then plainly averaged.
    """
    if momentum is None:
        from ..models.yolox.darknet import BN_MOMENTUM
        momentum = BN_MOMENTUM

    @jax.jit
    def one(ra, imgs):
        _, upd = model.apply({"params": params, "batch_stats": ra},
                             imgs, mutable=["batch_stats"])
        new_ra = upd["batch_stats"]
        b = jax.tree.map(lambda n, o: (n - momentum * o) / (1.0 - momentum),
                         new_ra, ra)
        return new_ra, b

    ra = batch_stats
    total, n = None, 0
    for imgs in image_batches:
        ra, b = one(ra, jnp.asarray(imgs))
        total = b if total is None else jax.tree.map(jnp.add, total, b)
        n += 1
    if n == 0:
        return batch_stats
    return jax.tree.map(lambda s: s / n, total)


def multiscale_resize(images: jax.Array, boxes: jax.Array, size: int):
    """Device-side multiscale: bilinear-resize the batch to (size, size) and
    rescale gt boxes (reference yolox_trainer.py:413-416 random_resize +
    preprocess). images (B, S, S, 3) uint8/float, boxes (B, N, 4) xyxy."""
    B, S = images.shape[0], images.shape[1]
    if size == S:
        return images, boxes
    out = jax.image.resize(images.astype(jnp.float32),
                           (B, size, size, images.shape[-1]),
                           method="bilinear")
    return out, boxes * (size / S)


def train_yolox(records, num_classes: int, output_dir: str,
                size: str = "yolox_x", input_size: int = 640,
                batch_size: int = 16, total_iters: int = 1000,
                base_lr: float = 0.01 / 64, weight_decay: float = 5e-4,
                optimizer: str = "sgd",      # sgd | ranger (BOP'22 recipes:
                                             # Ranger lr 1e-3@bs64, wd 0 —
                                             # configs/yolox/bop_pbr/*:66-76)
                warmup_iters: Optional[int] = None,
                grad_clip: float = 35.0,
                aug: Optional[dict] = None,  # extra YoloxTrainLoader kwargs
                                             # (degrees, translate, shear,
                                             # mosaic_scale, mixup_scale, ...)
                no_aug_iters: int = 0, mesh_shape=(-1,),
                log_period: int = 20, ckpt_period: int = 500,
                seed: int = 0, loader=None,
                resume: bool = True,
                eval_fn: Optional[Callable] = None,
                eval_period: int = 0,
                eval_metric: str = "AP50",
                multiscale_range: int = 0,
                multiscale_period: int = 10,
                random_size: Optional[tuple] = None,
                mosaic_prob: Optional[float] = None,
                mixup_prob: Optional[float] = None,
                ema_decay: float = 0.9998,
                norm: str = "GN",
                precise_bn_iters: int = 0):
    """Train YOLOX on detection records. Returns final TrainState.

    eval_fn(params, iteration) -> metrics dict is called with the EMA
    params every eval_period iters (reference: in-train eval hook with EMA
    weights, yolox_trainer.py:226-283); the best `eval_metric` value's
    checkpoint is kept in <output_dir>/ckpt_yolox_best.
    multiscale_range=N: every multiscale_period iters pick a random square
    size in input_size ± N*32 (reference random_resize).
    random_size=(lo, hi): sample the square size uniformly from
    [lo*32, hi*32] instead — the reference's exp.random_size semantics
    (det/yolox/exp/yolox_base.py random_resize), NOT centered on
    input_size, so recipes whose eval size is off the range's midpoint
    (or a CLI --input-size override) still train at the pinned scales.
    Takes precedence over multiscale_range.
    """
    from ..datasets.yolox_loader import YoloxTrainLoader

    model = build_yolox(num_classes, size, norm=norm)
    if loader is None:
        loader = YoloxTrainLoader(records, batch_size, input_size, seed=seed,
                                  **(aug or {}))
    if mosaic_prob is not None:
        loader.mosaic_prob = mosaic_prob
    if mixup_prob is not None:
        loader.mixup_prob = mixup_prob

    sched = yolox_warmcos_schedule(
        base_lr * batch_size, total_iters,
        warmup_iters=(min(500, total_iters // 10) if warmup_iters is None
                      else min(warmup_iters, total_iters)))
    if optimizer == "ranger":
        from ..solver.ranger import ranger
        opt = ranger(sched, weight_decay=weight_decay)
    elif optimizer == "sgd":
        # torch-SGD-style coupled weight decay, masked off norm scales and
        # biases (reference get_default_optimizer_params with
        # weight_decay_norm=0, weight_decay_bias=0 — yolox_base.py:118-127)
        wd_mask = lambda params: jax.tree.map(lambda p: p.ndim > 1, params)
        opt = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=wd_mask)
            if weight_decay else optax.identity(),
            optax.sgd(sched, momentum=0.9, nesterov=True))
    else:
        raise ValueError(f"unknown yolox optimizer {optimizer}")
    tx = optax.chain(optax.clip_by_global_norm(grad_clip), opt)

    host = next(iter(loader))
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.asarray(host["images"][:1]).astype(jnp.float32))
    state = create_train_state(model.apply, variables["params"], tx,
                               ema_decay=ema_decay,
                               batch_stats=variables.get("batch_stats"))

    mesh = make_mesh(mesh_shape, ("data",))
    state = jax.device_put(state, replicated_sharding(mesh))
    ckpt = CheckpointManager(os.path.join(output_dir, "ckpt_yolox"))
    best_ckpt = CheckpointManager(os.path.join(output_dir, "ckpt_yolox_best"),
                                  max_to_keep=1)
    start_iter = 0
    if resume:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state = jax.device_put(restored, replicated_sharding(mesh))
            start_iter = int(state.step)
            print(f"yolox: resumed from iter {start_iter}", flush=True)

    with_bs = variables.get("batch_stats") is not None
    step_aug = make_yolox_train_step(model, use_l1=False,
                                     with_batch_stats=with_bs)
    step_noaug = make_yolox_train_step(model, use_l1=True,
                                       with_batch_stats=with_bs)

    os.makedirs(output_dir, exist_ok=True)
    metrics_path = os.path.join(output_dir, "metrics_yolox.json")
    rng = jax.random.PRNGKey(seed + 1)
    ms_rng = np.random.RandomState(seed + 2)
    host_batch = host
    # best metric persists across restarts, else the first post-resume eval
    # would always overwrite ckpt_yolox_best even when worse
    best_val_path = os.path.join(output_dir, "best_val.json")
    best_val = -np.inf
    # only inherit the persisted best when we ACTUALLY resumed a
    # checkpoint — a fresh run in a reused output dir must start clean
    if start_iter > 0 and os.path.exists(best_val_path):
        with open(best_val_path) as f:
            best_val = float(json.load(f)["best"])
    cur_size = input_size
    t0 = time.perf_counter()
    for it in range(start_iter, total_iters):
        in_noaug = it >= total_iters - no_aug_iters
        if in_noaug and loader.enable_aug:
            # close mosaic + enable L1 (reference yolox_trainer.py:336-356)
            loader.mosaic_prob = 0.0
            loader.mixup_prob = 0.0
            loader.enable_aug = False
        step_fn = step_noaug if in_noaug else step_aug
        if ((random_size is not None or multiscale_range > 0)
                and it % multiscale_period == 0):
            # random square size on the 32-stride grid (reference :413-416);
            # no_aug phase trains at the eval size
            if in_noaug:
                cur_size = input_size
            elif random_size is not None:
                cur_size = 32 * ms_rng.randint(random_size[0],
                                               random_size[1] + 1)
            else:
                cur_size = 32 * ms_rng.randint(
                    input_size // 32 - multiscale_range,
                    input_size // 32 + multiscale_range + 1)
        rng, k = jax.random.split(rng)
        batch = jax.tree.map(jnp.asarray, host_batch)
        if cur_size != input_size:
            batch["images"], batch["gt_boxes"] = multiscale_resize(
                batch["images"], batch["gt_boxes"], cur_size)
        batch = shard_batch(batch, mesh)
        state, metrics = step_fn(state, batch, k)
        if (it + 1) % log_period == 0 or it == start_iter:
            row = {k_: float(v) for k_, v in jax.device_get(metrics).items()}
            row["iteration"] = it + 1
            row["img_size"] = cur_size
            with open(metrics_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            done = it + 1 - start_iter
            eta = (time.perf_counter() - t0) / done * (total_iters - it - 1)
            print(f"yolox iter {it+1}/{total_iters} "
                  f"loss {row['total_loss']:.3f} size {cur_size} "
                  f"eta {eta/60:.1f}min", flush=True)
        if (it + 1) % ckpt_period == 0 or (it + 1) == total_iters:
            ckpt.save(state, it + 1)
        if (eval_fn is not None and eval_period > 0
                and ((it + 1) % eval_period == 0 or (it + 1) == total_iters)):
            if with_bs and precise_bn_iters > 0:
                # recompute BN stats over clean train batches before eval
                # (reference PreciseBN hook, yolox_trainer.py:242-250) —
                # with the EMA params, because that is the model the eval
                # (and the released checkpoint) actually runs
                def _bn_batches():
                    for _ in range(precise_bn_iters):
                        yield next(iter(loader))["images"].astype(np.float32)
                state = state.replace(batch_stats=precise_bn_stats(
                    model, state.ema_params, state.batch_stats,
                    _bn_batches()))
            # eval with EMA weights (reference evaluates the EMA model)
            import inspect
            if (with_bs and "batch_stats"
                    in inspect.signature(eval_fn).parameters):
                val_metrics = eval_fn(jax.device_get(state.ema_params), it + 1,
                                      batch_stats=jax.device_get(
                                          state.batch_stats))
            else:
                val_metrics = eval_fn(jax.device_get(state.ema_params), it + 1)
            row = {f"val/{k_}": float(v) for k_, v in val_metrics.items()}
            row["iteration"] = it + 1
            with open(metrics_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            val = float(val_metrics.get(eval_metric, -np.inf))
            if val > best_val:
                best_val = val
                with open(best_val_path, "w") as f:
                    json.dump({"best": best_val, "iteration": it + 1}, f)
                best_ckpt.save(state, it + 1)
                print(f"yolox eval @ {it+1}: {eval_metric}={val:.4f} "
                      f"(new best)", flush=True)
            else:
                print(f"yolox eval @ {it+1}: {eval_metric}={val:.4f} "
                      f"(best {best_val:.4f})", flush=True)
        if it + 1 < total_iters:
            host_batch = next(iter(loader))
    loader.close()
    return state
