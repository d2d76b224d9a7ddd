"""Supervised UML training: alternating image/text batches into a shared head.

Behavioral parity with finetune.py:120-315:
  * per iteration: one image batch AND one text-feature batch (independent
    cyclic shuffled streams, finetune.py:33-39,162-176), forward through the
    shared head, loss = img_alpha * CE_img + alpha * CE_txt (:186-188)
  * per-iter diagnostics: head-weight gradients per modality, their cosine
    similarity / sign-agreement / norms (:190-206), feature direction
    similarity, optional CKA/mutual-kNN of a fixed capture set (:209-233)
  * every eval_freq=100 iters: validation accuracy, best-state snapshot,
    early stopping with patience (:247-271)
  * returns {'iter','val_acc','val_loss','model'} like the reference.

The reference's modality='text' path crashes (finetune.py:181 references
``raw_images`` that is never bound when image_loader is None); here text-only
training is actually supported.

TPU-first details:
  * the train step is one jitted program; the per-modality head gradients
    are computed in closed form (softmax(logits)-onehot contracted with
    features) instead of two extra full backward passes
  * partial final batches (reference drop_last=False) are padded to fixed
    shapes with zero sample-weights, so jit compiles exactly once
  * frozen backbones consume precomputed features (exact equivalence, no
    per-iter re-forward of a frozen ViT like the reference does)
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uml_tpu.core.meshes import maybe_shard_batch, replicate
from uml_tpu.metrics.alignment import cka as cka_fn, mutual_knn as mknn_fn
from uml_tpu.models.uml_head import UMLHead

EVAL_FREQ = 100  # parity: finetune.py:30


class CyclicBatcher:
    """Shuffled epoch batches over aligned arrays, cycling forever.

    DataLoader(shuffle=True, drop_last=False) semantics: each epoch is a
    fresh permutation; the final partial batch is padded to batch_size with
    zero weights.  Yields (inputs, labels, weights).
    """

    def __init__(self, inputs: np.ndarray, labels: np.ndarray,
                 batch_size: int, seed: int = 0):
        self.inputs = inputs
        self.labels = labels
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator:
        return self._iterate(0)

    def skip(self, n_batches: int) -> Iterator:
        """Resume fast-forward: an iterator aligned with batch ``n_batches``
        without gathering the skipped batches (one permutation draw per
        skipped epoch keeps the RNG stream replay-identical)."""
        return self._iterate(n_batches)

    def _iterate(self, skip_batches: int) -> Iterator:
        n = len(self.inputs)
        bs = self.batch_size
        bpe = (n + bs - 1) // bs
        while skip_batches >= bpe:
            self.rng.permutation(n)
            skip_batches -= bpe
        while True:
            perm = self.rng.permutation(n)
            for i in range(skip_batches * bs, n, bs):
                idx = perm[i : i + bs]
                pad = bs - len(idx)
                weights = np.ones(bs, np.float32)
                if pad:
                    weights[len(idx):] = 0.0
                    idx = np.concatenate([idx, np.zeros(pad, idx.dtype)])
                yield self.inputs[idx], self.labels[idx], weights
            skip_batches = 0


def _fast_forward(stream, it, n_batches: int):
    """Advance a batch stream by n_batches: O(epochs) via stream.skip()
    when available (CyclicBatcher, RawImageStream), else replay."""
    if n_batches <= 0:
        return it
    if hasattr(stream, "skip"):
        return stream.skip(n_batches)
    for _ in range(n_batches):
        next(it)
    return it


def eval_batches(inputs, labels, batch_size):
    """Fixed-shape padded batches over a split (for jitted validation).

    Full batches are zero-copy views into the split arrays (matters when
    the split is gigabytes of decoded uint8 images); only the final
    partial batch is padded into a copy.
    """
    out = []
    n = len(inputs)
    for i in range(0, n, batch_size):
        stop = min(i + batch_size, n)
        weights = np.ones(batch_size, np.float32)
        if stop - i == batch_size:
            out.append((inputs[i:stop], labels[i:stop], weights))
            continue
        pad = batch_size - (stop - i)
        weights[stop - i:] = 0.0
        x = np.concatenate([inputs[i:stop], np.zeros(
            (pad, *np.shape(inputs)[1:]), np.asarray(inputs).dtype)])
        y = np.concatenate([labels[i:stop], np.zeros(pad, np.asarray(labels).dtype)])
        out.append((x, y, weights))
    return out


def _weighted_ce(logits, labels, weights):
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def make_validate(model: UMLHead, batch_size: int, mesh=None):
    @jax.jit
    def _batch(params, inputs, labels, weights):
        logits, _ = model.forward(params, inputs)
        loss = _weighted_ce(logits, labels, weights)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels) * weights)
        return loss, correct, jnp.sum(weights)

    def validate(params, batches):
        losses, correct, total = [], 0.0, 0.0
        for inputs, labels, weights in batches:
            inputs, labels, weights = maybe_shard_batch(
                mesh, (inputs, labels, weights))
            l, c, t = _batch(params, jnp.asarray(inputs), jnp.asarray(labels),
                             jnp.asarray(weights))
            losses.append(float(l))
            correct += float(c)
            total += float(t)
        return float(np.mean(losses)), correct / max(total, 1.0)

    return validate


def train(
    model: UMLHead,
    image_stream,            # iterator of (inputs, labels, weights) or None
    text_stream,             # iterator of (feats, labels, weights) or None
    val_batches,
    test_batches=None,
    *,
    optimizer,
    max_iters: int = 1000,
    alpha: float = 1.0,
    img_alpha: float = 1.0,
    eval_freq: int = EVAL_FREQ,
    patience: int = 5,
    capture: dict | None = None,   # {'image_feats': [N,D] raw, 'text_feats': [M,D], ...}
    logger=None,
    validate_fn=None,
    init_params: dict | None = None,
    checkpointer=None,             # core.checkpoint.TrainCheckpointer
    ckpt_every: int | None = None,
    mesh=None,                     # jax.sharding.Mesh: data-parallel step
):
    assert image_stream is not None or text_stream is not None
    params = init_params if init_params is not None else model.init_params()
    opt_state = optimizer.init(params)
    if mesh is not None:
        # data parallel: params/opt replicated, batches sharded over 'data';
        # XLA inserts the gradient psum from the sharding annotations
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)

    has_image = image_stream is not None
    has_text = text_stream is not None
    capture_on = capture is not None

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, img_in, img_labels, img_w,
             txt_feats, txt_labels, txt_w, cap_img, cap_txt, cap_lab):
        def loss_fn(p):
            img_feats, bn_upd = (model.image_features_train(p, img_in)
                                 if has_image else (None, None))
            img_scale, txt_scale = model._scales(p)
            img_logits = (img_feats @ p["head_w"] * img_scale
                          if has_image else None)
            txt_logits = (txt_feats.astype(jnp.float32) @ p["head_w"] * txt_scale
                          if has_text else None)
            image_loss = (_weighted_ce(img_logits, img_labels, img_w)
                          if has_image else jnp.float32(0.0))
            text_loss = (_weighted_ce(txt_logits, txt_labels, txt_w)
                         if has_text else jnp.float32(0.0))
            loss = img_alpha * image_loss + alpha * text_loss
            return loss, (image_loss, text_loss, img_logits, txt_logits,
                          img_feats, bn_upd)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        image_loss, text_loss, img_logits, txt_logits, img_feats, bn_upd = aux
        # diagnostic scales come from the PRE-step params, like the
        # reference's autograd.grad before optimizer.step (finetune.py:190-195)
        img_scale, txt_scale = model._scales(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if bn_upd is not None:
            # BatchNorm running stats follow torch momentum semantics, not
            # gradients: overwrite them after the optimizer step
            params = model.merge_bn_updates(params, bn_upd)

        metrics = {"train/image_loss": image_loss, "train/text_loss": text_loss}
        if has_image:
            p_img = jax.nn.softmax(img_logits, -1)
            onehot = jax.nn.one_hot(img_labels, img_logits.shape[-1])
            grad_img = (img_feats * img_w[:, None]).T @ (p_img - onehot)
            grad_img = grad_img * img_scale / jnp.maximum(img_w.sum(), 1.0)
            metrics["train/image_acc"] = (
                ((jnp.argmax(img_logits, -1) == img_labels) * img_w).sum()
                / jnp.maximum(img_w.sum(), 1.0))
            metrics["train/img_grad_norm"] = jnp.linalg.norm(grad_img)
        else:
            grad_img = jnp.zeros_like(params["head_w"])
        if has_text:
            p_txt = jax.nn.softmax(txt_logits, -1)
            onehot_t = jax.nn.one_hot(txt_labels, txt_logits.shape[-1])
            grad_txt = (txt_feats.astype(jnp.float32) * txt_w[:, None]).T @ (p_txt - onehot_t)
            grad_txt = grad_txt * txt_scale / jnp.maximum(txt_w.sum(), 1.0)
            metrics["train/text_acc"] = (
                ((jnp.argmax(txt_logits, -1) == txt_labels) * txt_w).sum()
                / jnp.maximum(txt_w.sum(), 1.0))
            metrics["train/txt_grad_norm"] = jnp.linalg.norm(grad_txt)
        else:
            grad_txt = jnp.zeros_like(params["head_w"])

        if has_image and has_text:
            gi, gt = grad_img.ravel(), grad_txt.ravel()
            metrics["train/grad_direction_sim"] = jnp.dot(gi, gt) / (
                jnp.linalg.norm(gi) * jnp.linalg.norm(gt) + 1e-12)
            metrics["train/grad_agreement_rate"] = jnp.mean(
                (jnp.sign(gi) == jnp.sign(gt)).astype(jnp.float32))
            # weighted means: padded rows of a ragged final batch must not
            # enter the reference's batch-mean (finetune.py:239)
            fi = ((img_feats * img_w[:, None]).sum(0)
                  / jnp.maximum(img_w.sum(), 1.0))
            ft = ((txt_feats.astype(jnp.float32) * txt_w[:, None]).sum(0)
                  / jnp.maximum(txt_w.sum(), 1.0))
            metrics["train/feature_direction_sim"] = jnp.dot(fi, ft) / (
                jnp.linalg.norm(fi) * jnp.linalg.norm(ft) + 1e-12)

        if capture_on:
            # finetune.py:209-233: per-iter alignment of a fixed capture set;
            # cka uses class-mean image features vs text samples
            cap_feats = model.image_features(params, cap_img)
            n_common = min(cap_img.shape[0], cap_txt.shape[0])
            topk = min(10, n_common - 1)
            if topk >= 1:
                metrics["train/mknn_score"] = mknn_fn(
                    cap_feats[:n_common], cap_txt[:n_common], topk)
            class_sums = jax.ops.segment_sum(cap_feats, cap_lab, n_class)
            counts = jax.ops.segment_sum(
                jnp.ones_like(cap_lab, jnp.float32), cap_lab, n_class)
            class_means = class_sums / jnp.maximum(counts[:, None], 1.0)
            n_common = min(n_class, cap_txt.shape[0])
            metrics["train/cka_score"] = cka_fn(
                class_means[:n_common], cap_txt[:n_common], "ip")
        return params, opt_state, loss, metrics

    validate = validate_fn or make_validate(model, len(val_batches[0][1]),
                                             mesh=mesh)

    cap_img = (jnp.asarray(capture["image_feats"]) if capture_on
               else jnp.zeros((1, 1)))
    cap_txt = (jnp.asarray(capture["text_feats"]) if capture_on
               else jnp.zeros((1, 1)))
    cap_lab = (jnp.asarray(capture["image_labels"], jnp.int32) if capture_on
               else jnp.zeros((1,), jnp.int32))
    n_class = model.num_classes

    image_iter = iter(image_stream) if has_image else None
    text_iter = iter(text_stream) if has_text else None
    zero_img = (jnp.zeros((1, 1)), jnp.zeros((1,), jnp.int32), jnp.zeros((1,)))
    zero_txt = (jnp.zeros((1, model.shared_dim)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1,)))

    out = {"iter": None, "val_acc": None, "model": None, "val_loss": None,
           "model_records": []}
    no_improve = 0
    stopped_at = max_iters

    # mid-run resume (net-new vs the reference's save-only artifacts)
    start_iter = 0
    ckpt_on = checkpointer is not None and getattr(checkpointer, "enabled", False)
    if ckpt_on:
        like = {
            "params": params, "opt_state": opt_state, "iter": 0,
            "best_params": params, "best_val_acc": -1.0,
            "best_val_loss": 0.0, "best_iter": -1, "no_improve": 0,
        }
        step_restored, state = checkpointer.restore_latest(like)
        if step_restored is not None:
            print(f"=> Resuming from checkpoint at iter {state['iter']}")
            params = jax.tree.map(jnp.asarray, state["params"])
            opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
            if mesh is not None:
                params = replicate(mesh, params)
                opt_state = replicate(mesh, opt_state)
            start_iter = int(state["iter"])
            no_improve = int(state["no_improve"])
            if state["best_iter"] >= 0:
                out.update(iter=int(state["best_iter"]),
                           val_acc=float(state["best_val_acc"]),
                           val_loss=float(state["best_val_loss"]),
                           model=jax.tree.map(np.asarray, state["best_params"]))
            # fast-forward the data streams to keep batch order aligned;
            # streams with a .skip() do it in O(epochs) without touching
            # the skipped batches (no image decode on long resumes)
            if has_image:
                image_iter = _fast_forward(image_stream, image_iter,
                                           start_iter)
            if has_text:
                text_iter = _fast_forward(text_stream, text_iter, start_iter)

    def save_ckpt(i):
        if not (ckpt_on and ckpt_every and (i + 1) % ckpt_every == 0):
            return
        checkpointer.save(i + 1, {
            "params": params, "opt_state": opt_state, "iter": i + 1,
            "best_params": out["model"] if out["model"] is not None else params,
            "best_val_acc": out["val_acc"] if out["val_acc"] is not None else -1.0,
            "best_val_loss": out["val_loss"] if out["val_loss"] is not None else 0.0,
            "best_iter": out["iter"] if out["iter"] is not None else -1,
            "no_improve": no_improve,
        })

    if mesh is not None:
        cap_img, cap_txt, cap_lab = replicate(mesh, (cap_img, cap_txt, cap_lab))
        zero_img = replicate(mesh, zero_img)
        zero_txt = replicate(mesh, zero_txt)

    for i in range(start_iter, max_iters):
        img_b = (maybe_shard_batch(mesh, tuple(map(jnp.asarray, next(image_iter))))
                 if has_image else zero_img)
        txt_b = (maybe_shard_batch(mesh, tuple(map(jnp.asarray, next(text_iter))))
                 if has_text else zero_txt)
        # sync the batch transfer before dispatch: an unsynced transfer
        # through the axon relay falls into a ~10x slower use-triggered
        # send path (matters for raw uint8 image batches); the previous
        # step is still executing on device during the sync
        jax.block_until_ready((img_b, txt_b))
        params, opt_state, loss, metrics = step(
            params, opt_state, *img_b, *txt_b, cap_img, cap_txt, cap_lab)

        if logger is not None:
            logger.log({k: float(v) for k, v in metrics.items()})

        if i % eval_freq == 0:
            snapshot = jax.tree.map(np.asarray, params)
            val_loss, val_acc = validate(params, val_batches)
            testlog = ""
            if test_batches is not None:
                _, test_acc = validate(params, test_batches)
                testlog = f" | Test Acc: {test_acc:.4f}"
            if out["val_acc"] is None or val_acc > out["val_acc"]:
                out.update(iter=i, val_acc=val_acc, val_loss=val_loss,
                           model=snapshot)
                no_improve = 0
            else:
                no_improve += 1
            if logger is not None:
                logger.log({"val/val_loss": val_loss, "val/val_acc": val_acc,
                            "iter": i})
            print(f"Iter {i} | Loss {float(loss):.4f} | Val Loss {val_loss:.4f}"
                  f" | Val Acc {val_acc:.4f}{testlog}"
                  f" | Count {no_improve}/{patience}")
            if no_improve >= patience:
                print(f"=> Early stopping at Iter {i}")
                stopped_at = i
                break
        # checkpoint AFTER the eval so the snapshot carries this iteration's
        # best-model/early-stop state (resume skips the eval it already ran)
        save_ckpt(i)

    if out["model"] is None:
        # no eval fired (e.g. resumed past the last eval boundary with
        # max_iters < eval_freq): fall back to the current params
        out["model"] = jax.tree.map(np.asarray, params)
    params = jax.tree.map(jnp.asarray, out["model"])
    val_loss, val_acc = validate(params, val_batches)
    if logger is not None:
        logger.log({"val/best_val_loss": val_loss, "val/best_val_acc": val_acc,
                    "iter": out["iter"]})
    print(f"=> Best Val Loss {val_loss:.4f}, Val Acc {val_acc:.4f} "
          f"at Iter {out['iter']}")
    out["final_params"] = params
    out["stopped_at"] = stopped_at
    return out
