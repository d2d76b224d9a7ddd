"""Optimizers + LR schedules with reference semantics, in optax.

Parity targets:
  * HYPER_DICT named sweep grids (engine/optimizer/default.py:1-61)
  * adam/adamw/sgd builders (optim.py:15-72; adam betas (0.9, 0.999),
    sgd momentum 0.9 non-nesterov, torch-style coupled weight decay for
    adam/sgd, decoupled for adamw)
  * cosine / linear schedules with constant / linear warmup
    (scheduler.py:11-143).  The torch schedulers step once per iteration:
    warmup step 0 uses min_lr, steps 1..warmup-1 scale base_lr*step/warmup
    (scheduler.py:74-81); the successor cosine/linear schedule only starts
    stepping after warmup ends (scheduler.py:28-33), so its step count is
    offset by warmup_iter.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

HYPER_DICT = {
    "full_ds_full_model_finetune": {
        "optim": "adamw",
        "lr": [5e-05],
        "weight_decay": [0.0, 0.01, 0.001],
        "lr_scheduler": "cosine",
        "batch_size": [64],
        "max_iter": [12800],
        "warmup_iter": 50,
        "warmup_type": "linear",
        "warmup_min_lr": 1e-5,
        "dropout": [0.0],
        "learnable_temp": [False],
        "patience": [10],
    },
    "clip_linear": {
        "optim": "adamw",
        "lr": [0.001, 0.0001],
        "weight_decay": [0.0, 0.01, 0.001],
        "lr_scheduler": "cosine",
        "batch_size": [32],
        "max_iter": [12800],
        "warmup_iter": 50,
        "warmup_type": "linear",
        "warmup_min_lr": 1e-5,
        "dropout": [0.0],
        "learnable_temp": [False],
        "patience": [5],
    },
    "linear": {
        "optim": "adamw",
        "lr": [0.001, 0.0001],
        "weight_decay": [0.0, 0.01, 0.001],
        "lr_scheduler": "cosine",
        "batch_size": [8, 32],
        "max_iter": [12800],
        "warmup_iter": 50,
        "warmup_type": "linear",
        "warmup_min_lr": 1e-5,
        "dropout": [0.0],
        "learnable_temp": [True],
        "patience": [10],
    },
    "audio": {
        "optim": "adamw",
        "lr": [0.1, 0.01, 0.001, 0.0001],
        "weight_decay": [0.0, 0.01, 0.0001],
        "lr_scheduler": "cosine",
        "batch_size": [8],
        "max_iter": [12800],
        "warmup_iter": 50,
        "warmup_type": "linear",
        "warmup_min_lr": 1e-5,
        "dropout": [0.0],
        "learnable_temp": [False],
        "patience": [5],
    },
    # fast full-finetune grid for smoke tests (same structure as
    # full_ds_full_model_finetune; tiny iteration budget)
    "smoke_full": {
        "optim": "adamw",
        "lr": [5e-05],
        "weight_decay": [0.0],
        "lr_scheduler": "cosine",
        "batch_size": [8],
        "max_iter": [30],
        "warmup_iter": 5,
        "warmup_type": "linear",
        "warmup_min_lr": 1e-5,
        "dropout": [0.0],
        "learnable_temp": [False],
        "patience": [3],
    },
    # fast grid for smoke tests / CI
    "smoke": {
        "optim": "adamw",
        "lr": [0.001],
        "weight_decay": [0.0],
        "lr_scheduler": "cosine",
        "batch_size": [8],
        "max_iter": [200],
        "warmup_iter": 10,
        "warmup_type": "linear",
        "warmup_min_lr": 1e-5,
        "dropout": [0.0],
        "learnable_temp": [False],
        "patience": [3],
    },
}


def build_schedule(lr, lr_scheduler, warmup_iter, max_iter,
                   warmup_type="linear", warmup_lr=1e-5):
    """Per-iteration LR schedule matching the torch warmup wrappers."""

    if lr_scheduler == "cosine":
        def base(step):
            return lr * 0.5 * (1 + jnp.cos(jnp.pi * step / max_iter))
    elif lr_scheduler == "linear":
        def base(step):
            return lr * (1 - step / max_iter)
    else:
        raise ValueError(f"scheduler must be cosine|linear, got {lr_scheduler}")

    if warmup_iter <= 0:
        return base

    if warmup_type not in ("constant", "linear"):
        raise ValueError(f"warmup_type must be constant|linear, got {warmup_type}")

    def schedule(step):
        if warmup_type == "constant":
            warm = jnp.full_like(jnp.asarray(step, jnp.float32), warmup_lr)
        else:
            warm = jnp.where(step == 0, warmup_lr, lr * step / warmup_iter)
        return jnp.where(step < warmup_iter, warm, base(step - warmup_iter))

    return schedule


def build_optimizer(name, schedule, weight_decay):
    """optax chain for adam/adamw/sgd with reference decay semantics."""
    if name == "adamw":
        return optax.adamw(schedule, b1=0.9, b2=0.999,
                           weight_decay=weight_decay)
    if name == "adam":
        # torch Adam applies weight decay as coupled L2 on the gradient
        return optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.adam(schedule, b1=0.9, b2=0.999),
        )
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.sgd(schedule, momentum=0.9, nesterov=False),
        )
    raise ValueError(f"Optimizer {name} not found; available = adam|sgd|adamw")
