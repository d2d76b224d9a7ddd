"""Self-supervised UML training loop (MultiBench).

Behavioral parity with MultiBench/train.py:296-537:
  * two independently-shuffled streams zipped -> unpaired (x, y) batches
  * ``step_k`` warm-start: alpha_x = 0 while epoch <= step_k in 'xy' mode
  * loss = alpha_x * loss_x + alpha_y * loss_y (next-step recon)
  * per-batch diagnostics: trivial copy-last-step baselines, effective
    rank of predictions vs ground truth, diff_next, loss_private
  * every ``freq`` batches: probe evaluation (logistic on masked mean-pooled
    zx / zy / [zx, zy], modality-separability classifier) + alignment of a
    fixed ~1000-sample capture set (CKA/mKNN/cosine on proj/embed/recon)
  * raw-feature probe baselines computed once up front (train.py:31-91)
  * final evaluate() -> the returned score dict

TPU-first: splits are device-resident fixed-shape arrays; the train step
(incl. dropout) is one jitted program; embedding extraction for eval is a
jitted batched loop with the probes on host sklearn (parity) or on-device
logistic (fast path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uml_tpu.core.meshes import maybe_shard_batch, replicate
from uml_tpu.data.affect import map_labels
from uml_tpu.metrics.alignment import cka as cka_fn, mutual_knn as mknn_fn
from uml_tpu.metrics.alignment import compute_effective_rank
from uml_tpu.models.seq_autoencoder import SeqUML, length_mask
from uml_tpu.train.probes import probe_scores

MODALITY_KEYS = ("vision", "audio", "text")


def _clip01(v):
    return float(min(max(float(v), 0.0), 1.0))


def masked_mean_pool(z, lengths):
    """[B, T, D] -> [B, D] over valid steps (train.py:118-126)."""
    mask = length_mask(lengths, z.shape[1])[..., None].astype(z.dtype)
    return (z * mask).sum(axis=1) / mask.sum(axis=1)


class SelfSupTrainer:
    def __init__(self, model: SeqUML, *, lr=1e-4, seed=0):
        self.model = model
        self.tx = optax.adam(lr)
        self.seed = seed

    def init(self, x_shape, y_shape):
        rng = jax.random.key(self.seed)
        # jit the init: eager flax init dispatches hundreds of tiny ops,
        # which costs ~50s through a remote-execution relay
        variables = jax.jit(self.model.init)(
            rng, jnp.zeros(x_shape), jnp.zeros(y_shape),
            jnp.full((x_shape[0],), x_shape[1], jnp.int32),
            jnp.full((y_shape[0],), y_shape[1], jnp.int32))
        return variables, self.tx.init(variables)

    @functools.partial(jax.jit, static_argnames=("self", "mode"))
    def train_step(self, variables, opt_state, x, y, lx, ly, alpha_x, alpha_y,
                   dropout_key, mode="xy"):
        use_x = "x" in mode
        use_y = "y" in mode

        def loss_fn(v):
            out = self.model.apply(
                v, x if use_x else None, y if use_y else None,
                lx, ly, deterministic=False,
                rngs={"dropout": dropout_key})
            loss = alpha_x * out["loss_x"] + alpha_y * out["loss_y"]
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables)
        updates, opt_state = self.tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)

        metrics = {"train/loss": loss, "train/loss_x": out["loss_x"],
                   "train/loss_y": out["loss_y"],
                   "train/loss_private": out["loss_private"]}

        # trivial copy-last-step baselines (train.py:404-426)
        def trivial(data, lengths):
            if data.shape[1] == 1:
                return jnp.float32(0.0)
            diff = data[:, :-1, :] - data[:, 1:, :]
            m = jnp.broadcast_to(
                length_mask(lengths, data.shape[1])[..., None], data.shape
            ).astype(data.dtype)
            return jnp.sum(diff**2 * m[:, :-1, :]) / (jnp.sum(m[:, :-1, :]) + 1e-8)

        if use_x:
            metrics["train/trivial_loss_x"] = trivial(x, lx)
            metrics["train/diff_next_x"] = out["diff_next_x"]
        if use_y:
            metrics["train/trivial_loss_y"] = trivial(y, ly)
            metrics["train/diff_next_y"] = out["diff_next_y"]
            m = jnp.broadcast_to(
                length_mask(ly, y.shape[1])[..., None], y.shape).astype(y.dtype)
            recon = out["y_recon"][:, :-1, :]
            metrics["train/recon_y_loss"] = jnp.sum(
                (recon - y[:, 1:, :]) ** 2 * m[:, 1:, :]) / (
                jnp.sum(m[:, 1:, :]) + 1e-8)
            # effective rank over VALID predicted tokens (train.py:389-390);
            # zeroed padding rows contribute no singular mass (uncentered
            # SVD), so masking == the reference's boolean gather.  The GT
            # counterpart is computed once from the fixed capture set
            # (train.py:388 uses flattened_fixed_samples_x2), not per batch.
            pred_flat = (recon * m[:, 1:, :]).reshape(-1, recon.shape[-1])
            metrics["train/pred_effective_rank_y"] = compute_effective_rank(pred_flat)
        return variables, opt_state, metrics

    # -- embedding extraction (jitted) ------------------------------------

    @functools.partial(jax.jit, static_argnames=("self",))
    def _embed_batch(self, variables, x, y, lx, ly):
        out = self.model.apply(variables, x, y, lx, ly, deterministic=True)
        return (masked_mean_pool(out["zx"], lx),
                masked_mean_pool(out["zy"], ly),
                out["loss_x"], out["loss_y"])

    def extract_embeddings(self, variables, stream):
        zx, zy, lsx, lsy, labels = [], [], [], [], []
        for data, lengths, lab in stream:
            x, y, lx, ly = data["x"], data["y"], lengths["x"], lengths["y"]
            a, b, lossx, lossy = self._embed_batch(
                variables, jnp.asarray(x), jnp.asarray(y),
                jnp.asarray(lx), jnp.asarray(ly))
            zx.append(np.asarray(a))
            zy.append(np.asarray(b))
            lsx.append(float(lossx))
            lsy.append(float(lossy))
            labels.append(np.asarray(lab))
        return (np.concatenate(zx), np.concatenate(zy),
                np.asarray(lsx), np.asarray(lsy),
                np.concatenate(labels))


def evaluate(trainer, variables, eval_streams, ds_name, *, seed: int = 0):
    """Probe evaluation; parity with train.py:93-239.

    ``seed`` drives the modality-separability shuffle through an explicit
    generator so identical runs produce identical results.pth regardless of
    ambient global-RNG state (the reference relies on its up-front global
    seeding, utilis.py:8-16).
    """
    rng = np.random.default_rng(seed)
    embds = {}
    for split, stream in eval_streams.items():
        zx, zy, loss_x, loss_y, labels = trainer.extract_embeddings(
            variables, stream())
        embds[split] = {"x1": zx, "x2": zy,
                        "loss_x1": loss_x, "loss_x2": loss_y,
                        "labels": map_labels(labels, ds_name)}

    results = {}
    # modality separability (train.py:148-154)
    sep = []
    for split in ("train", "val", "test"):
        e = embds[split]
        X = np.concatenate([e["x1"], e["x2"]], axis=0)
        y = np.concatenate([np.zeros(len(e["x1"])), np.ones(len(e["x2"]))])
        perm = rng.permutation(len(X))
        from uml_tpu.train.probes import make_classifier

        clf = make_classifier("logistic", ds_name)
        clf.fit(X[perm], y[perm])
        sep.append(clf.score(X[perm], y[perm]))
    results["val/modality_separate"] = float(np.mean(sep))

    results["val/loss_x"] = float(np.mean(embds["val"]["loss_x1"]))
    results["test/loss_x"] = float(np.mean(embds["test"]["loss_x1"]))
    results["val/loss_y"] = float(np.mean(embds["val"]["loss_x2"]))
    results["test/loss_y"] = float(np.mean(embds["test"]["loss_x2"]))

    def scores(train_X, val_X, test_X):
        return probe_scores(
            train_X, embds["train"]["labels"], val_X, embds["val"]["labels"],
            test_X, embds["test"]["labels"], ds_name)

    v, t = scores(embds["train"]["x1"], embds["val"]["x1"], embds["test"]["x1"])
    results["val/score_x"], results["test/score_x"] = v, t
    v, t = scores(embds["train"]["x2"], embds["val"]["x2"], embds["test"]["x2"])
    results["val/score_y"], results["test/score_y"] = v, t
    v, t = scores(
        np.concatenate([embds["train"]["x1"], embds["train"]["x2"]], axis=1),
        np.concatenate([embds["val"]["x1"], embds["val"]["x2"]], axis=1),
        np.concatenate([embds["test"]["x1"], embds["test"]["x2"]], axis=1))
    results["val/score_xy"], results["test/score_xy"] = v, t
    return results


def evaluate_raw(eval_streams, ds_name):
    """Raw-feature probe baselines (train.py:31-91): mean over the padded
    time axis of each raw modality."""
    feats = {}
    for split, stream in eval_streams.items():
        xs, ys, labels = [], [], []
        for data, lengths, lab in stream():
            # the reference means over the BATCH-max padded length
            # (collate pads per batch, train.py:52-58); divide by the
            # batch's true max length rather than the split-max padding
            tx = max(int(np.max(lengths["x"])), 1)
            ty = max(int(np.max(lengths["y"])), 1)
            xs.append(np.asarray(data["x"]).sum(axis=1) / tx)
            ys.append(np.asarray(data["y"]).sum(axis=1) / ty)
            labels.append(np.asarray(lab))
        feats[split] = {"x": np.concatenate(xs), "y": np.concatenate(ys),
                        "labels": map_labels(np.concatenate(labels), ds_name)}

    def scores(key):
        if key == "xy":
            get = lambda s: np.concatenate([feats[s]["x"], feats[s]["y"]], axis=1)
        else:
            get = lambda s: feats[s][key]
        return probe_scores(get("train"), feats["train"]["labels"],
                            get("val"), feats["val"]["labels"],
                            get("test"), feats["test"]["labels"], ds_name)

    out = {}
    for key, name in (("x", "score_x_raw"), ("y", "score_y_raw"),
                      ("xy", "score_xy_raw")):
        v, t = scores(key)
        out[f"val/{name}"] = v
        out[f"test/{name}"] = t
    return out


def train_selfsup(
    trainer: SelfSupTrainer,
    stream_1,                 # callable -> epoch iterator of (x,y,lx,ly,...)
    stream_2,
    eval_streams: dict,       # {'train','val','test'} -> callable -> iterator
    *,
    mode: str = "xy",
    num_epochs: int = 100,
    step_k: int = -1,
    alpha_x: float = 1.0,
    alpha_y: float = 1.0,
    ds_name: str = "mosi",
    eval_freq: int = 100,
    capture: bool = True,
    capture_samples: int = 1000,
    augment: bool = False,
    logger=None,
    checkpointer=None,            # core.checkpoint.TrainCheckpointer
    mesh=None,                    # jax.sharding.Mesh: data-parallel step
):
    # peek shapes from one batch of each stream
    d1, l1, _ = next(iter(stream_1()))
    d2, l2, _ = next(iter(stream_2()))
    x_shape = d1["x"].shape
    y_shape = d2["y"].shape
    variables, opt_state = trainer.init(x_shape, y_shape)
    if mesh is not None:
        # data parallel: state replicated, batches sharded over 'data'
        variables = replicate(mesh, variables)
        opt_state = replicate(mesh, opt_state)

    cap = None
    if capture:
        xs, ys, lxs, lys = [], [], [], []
        count = 0
        for (da, la, _), (db, lb, _) in zip(stream_1(), stream_2()):
            xs.append(da["x"]); lxs.append(la["x"])
            ys.append(db["y"]); lys.append(lb["y"])
            count += len(da["x"])
            if count >= capture_samples:
                break
        cap = {
            "x": jnp.asarray(np.concatenate(xs)[:capture_samples]),
            "y": jnp.asarray(np.concatenate(ys)[:capture_samples]),
            "lx": jnp.asarray(np.concatenate(lxs)[:capture_samples]),
            "ly": jnp.asarray(np.concatenate(lys)[:capture_samples]),
        }

    raw_results = evaluate_raw(eval_streams, ds_name)

    # GT effective rank of the y modality: constant, computed once from the
    # capture set's valid tokens (train.py:388, flattened_fixed_samples_x2)
    gt_eff_rank_y = None
    if cap is not None and "y" in mode:
        m = length_mask(cap["ly"], cap["y"].shape[1])[..., None].astype(
            cap["y"].dtype)
        gt_flat = (cap["y"] * m).reshape(-1, cap["y"].shape[-1])
        gt_eff_rank_y = float(compute_effective_rank(gt_flat))

    @functools.partial(jax.jit, static_argnames=())
    def capture_alignment(variables, x, y, lx, ly):
        out = trainer.model.apply(variables, x, y, lx, ly, deterministic=True)
        zx = masked_mean_pool(out["zx"], lx)
        zy = masked_mean_pool(out["zy"], ly)
        px = masked_mean_pool(out["x_proj"], lx)
        py = masked_mean_pool(out["y_proj"], ly)
        n = min(zx.shape[0], zy.shape[0])
        topk = min(10, n - 1)
        cos = jnp.mean(jnp.sum(zx[:n] * zy[:n], -1) /
                       (jnp.linalg.norm(zx[:n], axis=-1)
                        * jnp.linalg.norm(zy[:n], axis=-1) + 1e-12))
        return {
            "val/cka_embed": cka_fn(zx[:n], zy[:n], "ip"),
            "val/mknn_embed": mknn_fn(zx[:n], zy[:n], topk),
            "val/cos_sim_embed": cos,
            "val/cka_proj": cka_fn(px[:n], py[:n], "ip"),
            "val/mknn_proj": mknn_fn(px[:n], py[:n], topk),
        }

    rng = jax.random.key(trainer.seed + 1)
    score = None
    embeddings_history = {"x1": [], "x2": []} if capture else None

    # epoch-level resume (net-new vs the reference's end-of-run save)
    start_epoch = 0
    ckpt_on = checkpointer is not None and getattr(checkpointer, "enabled", False)
    if ckpt_on:
        like = {"variables": variables, "opt_state": opt_state, "epoch": 0}
        step_restored, state = checkpointer.restore_latest(like)
        if step_restored is not None:
            print(f"=> Resuming from checkpoint at epoch {state['epoch']}")
            variables = jax.tree.map(jnp.asarray, state["variables"])
            opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
            if mesh is not None:
                variables = replicate(mesh, variables)
                opt_state = replicate(mesh, opt_state)
            start_epoch = int(state["epoch"])
            # fast-forward the shuffle streams AND the dropout rng so the
            # resumed run replays the identical batch/key sequence
            for _ in range(start_epoch):
                for _ in zip(stream_1(), stream_2()):
                    rng, _key = jax.random.split(rng)

    for epoch in range(start_epoch, num_epochs):
        ax = alpha_x
        if epoch <= step_k and mode == "xy":
            print(f"Training only on y, step: [{epoch}/{step_k}]; "
                  f"total steps: {num_epochs}")
            ax = 0.0
        for i_batch, ((da, la, _), (db, lb, _)) in enumerate(
                zip(stream_1(), stream_2())):
            x_in = da["x"]
            if augment:
                # --augment applies per-sequence views (the reference
                # accepts this flag but never uses it, train.py:296);
                # the rng is derived per (seed, epoch, batch) so resumed
                # runs replay identical augmentations
                from uml_tpu.data.seq_augment import augment_single

                aug_rng = np.random.RandomState(
                    (trainer.seed * 1_000_003 + epoch * 10_007 + i_batch)
                    % (2**31))
                x_in = augment_single(x_in, aug_rng)
            rng, key = jax.random.split(rng)
            batch = maybe_shard_batch(
                mesh, (jnp.asarray(x_in), jnp.asarray(db["y"]),
                       jnp.asarray(la["x"]), jnp.asarray(lb["y"])))
            variables, opt_state, metrics = trainer.train_step(
                variables, opt_state, *batch,
                jnp.float32(ax), jnp.float32(alpha_y), key, mode=mode)
            if logger is not None:
                if gt_eff_rank_y is not None:
                    metrics = dict(metrics,
                                   **{"train/gt_effective_rank_y": gt_eff_rank_y})
                logger.log({k: float(v) for k, v in metrics.items()})

            if eval_streams and i_batch % eval_freq == 0:
                score = evaluate(trainer, variables, eval_streams, ds_name,
                                 seed=trainer.seed)
                score.update(raw_results)
                if cap is not None:
                    align = capture_alignment(variables, cap["x"], cap["y"],
                                              cap["lx"], cap["ly"])
                    score.update({k: _clip01(v) if "cka" in k else float(v)
                                  for k, v in align.items()})
                    # per-eval pooled capture embeddings (the reference's
                    # embeddings.pth history, main.py:151-152)
                    zx, zy, _, _ = trainer._embed_batch(
                        variables, cap["x"], cap["y"], cap["lx"], cap["ly"])
                    embeddings_history["x1"].append(np.asarray(zx))
                    embeddings_history["x2"].append(np.asarray(zy))
                if logger is not None:
                    logger.log(score)

        if ckpt_on:
            checkpointer.save(epoch + 1, {
                "variables": variables, "opt_state": opt_state,
                "epoch": epoch + 1})

    # Final evaluation runs after the loop (not inside the last epoch) so a
    # resume at start_epoch >= num_epochs still reports the finished result
    # instead of leaving score=None.
    if eval_streams:
        print("Final evaluation...")
        score = evaluate(trainer, variables, eval_streams, ds_name,
                         seed=trainer.seed)
        score.update(raw_results)
        if logger is not None:
            logger.log({f"final_{k}": v for k, v in score.items()})

    return variables, score, embeddings_history
