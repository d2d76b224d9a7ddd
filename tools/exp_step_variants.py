"""A/B the full-finetune step variants at bs128 + measure relay dispatch
overhead.

Variants:
  a. current bench step: adamw over ALL CLIP params (incl. the text tower,
     which gets zero grads but still pays adamw m/v/decay traffic)
  b. vision+head-only step: optimizer state and grads restricted to the
     image tower + classifier head — the reference's actual finetune
     surface (text features are precomputed .pth, the text encoder is
     never trained: finetune.py:337-346 builds UMLClip from the image
     encoder; text enters as cached features)
  c. dispatch-overhead probe: tiny jitted op dispatched back-to-back with
     the same sync pattern as the step loop — isolates the axon relay's
     per-dispatch cost from device time.

Usage: timeout 1800 python tools/exp_step_variants.py
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


def timeit(label, fn, iters=5, runs=3, unit_imgs=128):
    rates = []
    for _ in range(runs):
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        rates.append((time.time() - t0) / iters)
    ms = sorted(rates)[len(rates) // 2] * 1e3
    print(f"{label:44s}: {ms:8.2f} ms  ({unit_imgs / ms * 1e3:7.1f} img/s)",
          flush=True)
    return ms


def main():
    import optax

    import bench

    model = bench.build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    u8 = bench.stage_input(128, 224 * 224 * 3)
    b = 128
    rng = np.random.default_rng(0)
    labels = jax.block_until_ready(jax.device_put(
        jnp.asarray(rng.integers(0, 100, (b,)), jnp.int32)))
    head = jax.block_until_ready(jax.device_put(
        jnp.asarray(rng.standard_normal((512, 100)) * 0.01, jnp.float32)))
    params = variables["params"]
    tx = optax.adamw(1e-5)

    # --- c. dispatch overhead probe (first: cheapest compile) ---
    tiny = jax.block_until_ready(jax.device_put(jnp.ones((8, 128))))

    @jax.jit
    def bump(x):
        return x * 1.000001 + 0.5

    state = bump(tiny)
    jax.block_until_ready(state)

    def tick():
        nonlocal state
        state = bump(state)
        return state

    timeit("tiny op x20 between syncs", tick, iters=20, runs=3, unit_imgs=1)

    # --- a. current bench step: all params ---
    def loss_all(p, u8, labels):
        feats = model.apply({"params": p}, u8,
                            method=lambda m, x: m.encode_image_u8(x))
        logits = feats @ head
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_all(p, o, u8, labels):
        loss, grads = jax.value_and_grad(loss_all)(p, u8, labels)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p = params
    o = tx.init(params)
    p, o, l = step_all(p, o, u8, labels)
    float(l)

    def run_all():
        nonlocal p, o
        p, o, l = step_all(p, o, u8, labels)
        return l

    timeit("step: adamw over ALL params", run_all)
    del p, o

    # --- b. vision+head-only ---
    variables2 = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    params2 = variables2["params"]
    frozen = {k: v for k, v in params2.items() if k != "visual"}

    def loss_vis(tp, u8, labels):
        full = dict(frozen)
        full["visual"] = tp["visual"]
        feats = model.apply({"params": full}, u8,
                            method=lambda m, x: m.encode_image_u8(x))
        logits = feats @ tp["head"]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_vis(tp, o, u8, labels):
        loss, grads = jax.value_and_grad(loss_vis)(tp, u8, labels)
        updates, o = tx.update(grads, o, tp)
        return optax.apply_updates(tp, updates), o, loss

    tp = {"visual": params2["visual"], "head": head}
    o2 = tx.init(tp)
    tp, o2, l = step_vis(tp, o2, u8, labels)
    float(l)

    def run_vis():
        nonlocal tp, o2
        tp, o2, l = step_vis(tp, o2, u8, labels)
        return l

    timeit("step: vision tower + head only", run_vis)
    print("done", flush=True)


if __name__ == "__main__":
    main()
