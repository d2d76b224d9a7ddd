"""Seeding / determinism discipline.

The reference enforces correctness purely through determinism (seeding of
python/numpy/torch RNGs: engine/tools/utils.py:26-32, MultiBench/utilis.py:8-16).
On TPU+JAX the story is simpler: JAX PRNG keys are explicit and all XLA
programs are deterministic by construction; we still seed python/numpy for
the host-side split/sampling machinery whose outputs must match the
reference exactly (few-shot index JSONs).
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_random_seed(seed: int) -> None:
    """Seed every host RNG that influences data sampling order."""
    os.environ.setdefault("PYTHONHASHSEED", str(seed))
    random.seed(seed)
    np.random.seed(seed)
    try:  # torch is used only for .pth interop / parity checks; seed if present
        import torch

        torch.manual_seed(seed)
    except ImportError:  # pragma: no cover
        pass


def cname2lab(lab2cname: dict[int, str]) -> dict[str, int]:
    """Invert a label->classname map to lowercase_underscored name->label.

    Parity with engine/tools/utils.py:120-123.
    """
    return {v.lower().replace(" ", "_"): k for k, v in lab2cname.items()}
