"""Bisect WHICH bench.py pre-staging step collapses the H2D link.

exp_poison_trigger.py showed: fresh process ~1450 MB/s; first D2H fetch
drops puts to ~26 MB/s; compile/dispatch/block are safe.  Yet the full
bench's pipeline transfer stage measured 16 MB/s BEFORE any fetch.  This
replays bench.main()'s exact pre-pipeline sequence with a timed 19 MB put
after each phase to find the real trigger.

Usage: timeout 900 python tools/exp_bench_poison.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import uml_tpu  # noqa: F401

MB19 = 19 * 2**20
_rng = np.random.default_rng(1)
_keep = []


def t_put(tag):
    h = _rng.integers(0, 256, (MB19,), dtype=np.uint8)
    t0 = time.time()
    d = jax.device_put(h)
    d.block_until_ready()
    dt = time.time() - t0
    _keep.append(d)
    print(f"{tag:34s}: 19MB in {dt:6.3f}s ({19 / dt:7.1f} MB/s)", flush=True)


def main():
    import bench

    t_put("A0 fresh")
    t_put("A0 fresh (rep)")

    model = bench.build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    t_put("A1 post vitb16 init+put")

    imgs = bench.stage_input(2048, 224 * 224 * 3)
    t_put("A2 post stage_input(2048)")

    train_u8 = bench.stage_input(128, 224 * 224 * 3)
    t_put("A3 post stage_input(128)")

    # stage the family towers' weights in-process (what family_setups
    # did before the family lines moved to their own subprocesses)
    staged = []
    for key, build in bench.FAMILY_BUILDERS.items():
        _, variables, _ = build()
        staged.append(variables)
        staged.append(bench.stage_input(bench.FAMILY_BATCH, 224 * 224 * 3))
    t_put("A4 post family staging")
    t_put("A4 post family staging (rep)")

    del imgs, train_u8, staged
    print("done", flush=True)


if __name__ == "__main__":
    main()
