"""Jitted training loop for the Gaussian shared-autoencoder UML experiment.

Behavioral parity with Gaussian_experiment/main.py:31-86:
  * per step: batch -> loss = alpha_x*loss_x + alpha_y*loss_y  (mode 'xy')
              or loss = loss_x with loss_y computed for logging (mode 'x')
  * Adam optimizer
  * every EVAL_EVERY steps: val recon losses + CKA + mutual-kNN on the
    shared-encoder embeddings of the full val set

TPU-first design: the X/Y pools and val set live on device; the host only
supplies [chunk, batch] int32 index arrays.  ``lax.scan`` runs `chunk`
optimizer steps per dispatch — the whole train step *and* the per-step eval
(val forward + Gram-matrix metrics) are one fused XLA program, so there are
zero per-step host round trips (the reference pays a GPU->CPU sync per step
for wandb logging).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uml_tpu.metrics.alignment import cka as cka_fn, mutual_knn as mknn_fn
from uml_tpu.models.shared_autoencoder import SharedAutoencoder
from uml_tpu.data.gaussian import UnpairedIndexStream

EVAL_EVERY = 1  # parity: Gaussian_experiment/main.py:29
MKNN_TOPK = 10


@dataclass
class GaussianTrainResult:
    params: Any
    history: dict[str, np.ndarray]  # per-step logged scalars
    final_val_loss_x: float
    final_val_loss_y: float
    final_cka: float
    final_mknn: float


def make_model(dim_obs: int, dim_common: int, dim_latent: int) -> SharedAutoencoder:
    return SharedAutoencoder(dim_obs=dim_obs, dim_common=dim_common, dim_latent=dim_latent)


def train_gaussian(
    model: SharedAutoencoder,
    pools: dict[str, jax.Array],          # {'x': [Nx, dim_obs], 'y': [Ny, dim_obs]}
    val_x: jax.Array,
    val_y: jax.Array,
    *,
    mode: str = "xy",
    alpha_x: float = 1.0,
    alpha_y: float = 1.0,
    lr: float = 1e-3,
    batch_size: int = 512,
    num_steps: int = 1000,
    seed: int = 0,
    loader_seed: int = 42,                # parity: main.py:141-143 generator seed
    chunk: int = 100,
    eval_metrics: bool = True,
    logger=None,
    stream=None,           # override the index stream (e.g. parity harness
                           # replaying the reference DataLoader's batches)
    init_params=None,      # override the random init (ported torch weights)
) -> GaussianTrainResult:
    if mode not in ("xy", "x"):
        raise ValueError(f"mode must be 'xy' or 'x', got {mode!r}")

    params = (init_params if init_params is not None
              else model.init(jax.random.key(seed), x=val_x[:1], y=val_y[:1]))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    pool_x = jnp.asarray(pools["x"])
    pool_y = jnp.asarray(pools["y"])

    def loss_fn(p, xb, yb):
        loss_x, loss_y, _, _ = model.apply(p, x=xb, y=yb)
        if mode == "xy":
            loss = alpha_x * loss_x + alpha_y * loss_y
        else:
            loss = loss_x
        return loss, (loss_x, loss_y)

    def eval_fn(p):
        loss_x, loss_y, _, _ = model.apply(p, x=val_x, y=val_y)
        out = {"val/loss_x": loss_x, "val/loss_y": loss_y,
               "val/loss": loss_x + loss_y}
        if eval_metrics:
            emb_x, emb_y = model.apply(p, x=val_x, y=val_y, method=model.get_embeddings)
            out["val/cka"] = cka_fn(emb_x, emb_y, "ip")
            out["val/mknn"] = mknn_fn(emb_x, emb_y, MKNN_TOPK)
        return out

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_chunk(p, o, idx_x, idx_y):
        def step(carry, idx):
            p, o = carry
            ix, iy = idx
            xb = pool_x[ix]
            yb = pool_y[iy]
            (loss, (lx, ly)), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, xb, yb)
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            metrics = {"train/loss": loss, "train/loss_x": lx, "train/loss_y": ly}
            metrics.update(eval_fn(p))
            return (p, o), metrics

        (p, o), metrics = jax.lax.scan(step, (p, o), (idx_x, idx_y))
        return p, o, metrics

    if stream is None:
        stream = UnpairedIndexStream(
            pool_x.shape[0], pool_y.shape[0], batch_size, seed=loader_seed
        )

    history: dict[str, list] = {}
    for idx_x, idx_y in stream.batch_chunks(num_steps, chunk):
        params, opt_state, metrics = train_chunk(params, opt_state, idx_x, idx_y)
        metrics = jax.tree.map(np.asarray, metrics)
        for k, v in metrics.items():
            history.setdefault(k, []).append(v)
        if logger is not None:
            n = len(next(iter(metrics.values())))
            for i in range(n):
                logger.log({k: float(v[i]) for k, v in metrics.items()})

    hist = {k: np.concatenate(v) for k, v in history.items()}
    return GaussianTrainResult(
        params=params,
        history=hist,
        final_val_loss_x=float(hist["val/loss_x"][-1]),
        final_val_loss_y=float(hist["val/loss_y"][-1]),
        final_cka=float(hist.get("val/cka", [np.nan])[-1]) if eval_metrics else float("nan"),
        final_mknn=float(hist.get("val/mknn", [np.nan])[-1]) if eval_metrics else float("nan"),
    )
