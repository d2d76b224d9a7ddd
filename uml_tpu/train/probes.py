"""Probe classifiers for self-supervised evaluation.

Parity with MultiBench/train.py:96-102: mosi uses a
StandardScaler+LogisticRegression(liblinear, max_iter=1000) pipeline, other
datasets plain LogisticRegression(max_iter=200); kNN probes available.

Also provides a jitted device-resident logistic probe (L-BFGS-free, plain
full-batch Adam on the convex objective) for fast on-device eval when
sklearn round-trips dominate; sklearn remains the default for score parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def make_classifier(classifier_type: str, ds_name: str):
    from sklearn.linear_model import LogisticRegression
    from sklearn.neighbors import KNeighborsClassifier
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import StandardScaler

    if classifier_type == "logistic":
        if ds_name == "mosi":
            return make_pipeline(
                StandardScaler(with_mean=True, with_std=True),
                LogisticRegression(max_iter=1000, solver="liblinear"))
        return LogisticRegression(max_iter=200)
    if classifier_type == "knn":
        return KNeighborsClassifier()
    raise ValueError(f"Unsupported classifier type: {classifier_type}")


def probe_scores(train_X, train_y, val_X, val_y, test_X, test_y,
                 ds_name: str, classifier_type: str = "logistic"):
    """fit on train, -> (val_score, test_score)."""
    clf = make_classifier(classifier_type, ds_name)
    clf.fit(train_X, train_y)
    return clf.score(val_X, val_y), clf.score(test_X, test_y)


# ---------------------------------------------------------------------------
# device-resident logistic probe (optional fast path)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_classes", "steps"))
def _fit_logistic(X, y, n_classes: int, steps: int = 300, lr: float = 0.5,
                  l2: float = 1e-4):
    mu = X.mean(0)
    sd = X.std(0) + 1e-8
    Xn = (X - mu) / sd
    d = X.shape[1]
    W = jnp.zeros((d, n_classes))
    b = jnp.zeros((n_classes,))

    def loss_fn(params):
        W, b = params
        logits = Xn @ W + b
        ce = -jnp.mean(jnp.take_along_axis(
            jax.nn.log_softmax(logits), y[:, None], axis=1))
        return ce + l2 * jnp.sum(W**2)

    import optax

    tx = optax.adam(lr)
    state = tx.init((W, b))

    def step(carry, _):
        params, state = carry
        grads = jax.grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        return (params, state), None

    (params, _), _ = jax.lax.scan(step, ((W, b), state), length=steps)
    return params, mu, sd


def device_probe_scores(train_X, train_y, val_X, val_y, test_X, test_y,
                        n_classes=None):
    """Jitted logistic probe; returns (val_acc, test_acc)."""
    if n_classes is None:
        n_classes = int(np.max(train_y)) + 1
    (W, b), mu, sd = _fit_logistic(
        jnp.asarray(train_X), jnp.asarray(train_y), n_classes)

    def acc(X, y):
        logits = (jnp.asarray(X) - mu) / sd @ W + b
        return float(jnp.mean(jnp.argmax(logits, -1) == jnp.asarray(y)))

    return acc(val_X, val_y), acc(test_X, test_y)
