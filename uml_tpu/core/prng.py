"""PRNG discipline.

All device-side randomness flows through explicit ``jax.random`` keys derived
from a single experiment seed; host-side sampling (few-shot index draws,
shuffle orders that must match the reference byte-for-byte) uses seeded
python/numpy RNGs via :func:`uml_tpu.utils.set_random_seed`.
"""

from __future__ import annotations

import jax
import numpy as np


def make_rng(seed: int) -> jax.Array:
    """Root PRNG key for an experiment."""
    return jax.random.key(seed)


def host_rng(seed: int) -> np.random.Generator:
    """Independent host-side generator (shuffle orders, augment draws)."""
    return np.random.default_rng(seed)


def epoch_perm(rng: np.random.Generator, n: int) -> np.ndarray:
    """A fresh shuffle of [0, n) — one independently-drawn stream per loader,
    which is how the reference realizes "unpairedness" (two shuffled
    DataLoaders zipped, MultiBench/main.py:70-71)."""
    return rng.permutation(n)
