"""Why doesn't the full-finetune step speed up from bs128 to bs512?

bench r3: train_full_finetune_img_per_s 1115.6 (bs128) vs
train_full_finetune_bs512_img_per_s 1118.0 — flat, which contradicts the
small-batch fill/drain account of the ~70%-of-floor step (the extraction
forward composes 82% of its big-batch rate at bs128 and ~87% at bs2048).
Phase timings at both batches locate which phase stops scaling.

Usage: timeout 2400 python tools/exp_train_bs512.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

import uml_tpu  # noqa: F401


def timeit(label, fn, *args, iters=5, runs=3):
    fn(*args)
    rates = []
    for _ in range(runs):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        rates.append((time.time() - t0) / iters)
    ms = sorted(rates)[len(rates) // 2] * 1e3
    print(f"{label:40s}: {ms:8.2f} ms", flush=True)
    return ms


def main():
    import optax

    import bench

    model = bench.build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    u8s = {b: bench.stage_input(b, 224 * 224 * 3) for b in (128, 512)}
    rng = np.random.default_rng(0)
    head = jax.block_until_ready(jax.device_put(
        jnp.asarray(rng.standard_normal((512, 100)) * 0.01, jnp.float32)))
    params = variables["params"]

    def loss_fn(p, u8, labels):
        feats = model.apply({"params": p}, u8,
                            method=lambda m, x: m.encode_image_u8(x))
        logits = feats @ head
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    for b in (128, 512):
        labels = jax.block_until_ready(jax.device_put(
            jnp.asarray(rng.integers(0, 100, (b,)), jnp.int32)))
        u8 = u8s[b]
        fwd = jax.jit(loss_fn)
        ms = timeit(f"bs{b} fwd only", fwd, params, u8, labels)
        print(f"  -> fwd {b / ms * 1e3:.0f} img/s", flush=True)
        grad = jax.jit(jax.value_and_grad(loss_fn))
        ms = timeit(f"bs{b} fwd+bwd", grad, params, u8, labels)
        print(f"  -> step-sans-opt {b / ms * 1e3:.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
