"""IL A/B on the REAL bench train step (full CLIP model, donated adamw
step, bs128): does stage-interleaving the stash backward's chains move
the shipping train line?  Tower-level A/Bs read IL=3 as +0.6-2% at
bs128 — inside drift — so this decides the default on the actual step.

Usage: timeout 3000 python tools/exp_train_il.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import uml_tpu  # noqa: F401
from bench import init_on_cpu, stage_input, train_bench


def build():
    from uml_tpu.models.clip import build_clip

    model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    return model, variables


def main():
    u8 = stage_input(128, 224 * 224 * 3)
    for il in ("0", "3", "0", "3"):
        os.environ["UML_BWD_IL"] = il
        model, variables = build()
        rate = train_bench(model, variables, [u8])[0]
        print(f"train bs128 [IL={il}]: {rate:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
