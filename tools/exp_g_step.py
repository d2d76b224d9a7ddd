"""Time the bench train step (vision+head adamw, bs128) under the current
UML_KERNEL_G / UML_BWD_G env — for sweeping kernel batch-grouping at the
train batch size (round-2 optima G=4 fwd / G=1 bwd were measured at
bs512; bs128's grids are 4x smaller and may pipeline better with more,
smaller programs).

Usage: UML_KERNEL_G=2 timeout 2400 python tools/exp_g_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import uml_tpu  # noqa: F401


def main():
    import bench

    model = bench.build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    u8 = bench.stage_input(128, 224 * 224 * 3)
    rate = bench.train_bench(model, variables, [u8])[0]
    print(f"KERNEL_G={os.environ.get('UML_KERNEL_G', '4')} "
          f"BWD_G={os.environ.get('UML_BWD_G', '1')}: "
          f"{rate:.1f} img/s ({128 / rate * 1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
