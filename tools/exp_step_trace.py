"""jax.profiler trace of the composed full-finetune step at bs128 —
per-op device times to locate the gap between the measured 120 ms step
and its ~81 ms FLOP floor (extraction composes to ~87% of roofline; the
step composes to ~71%, so ~25 ms is schedule/shape loss somewhere).

Usage: timeout 2400 python tools/exp_step_trace.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

import uml_tpu  # noqa: F401


def main():
    import optax

    import bench
    from uml_tpu.utils.profiling import trace_and_summarize

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
    opt = tx.init(params)

    def loss_fn(p, u8, labels):
        feats = model.apply({"params": p}, u8,
                            method=lambda m, x: m.encode_image_u8(x))
        logits = feats @ head
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(p, o, u8, labels):
        loss, grads = jax.value_and_grad(loss_fn)(p, u8, labels)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p, o, l = step(params, opt, u8, labels)
    float(l)
    with trace_and_summarize("/tmp/step_trace", iters=3, top=40):
        for _ in range(3):
            p, o, l = step(p, o, u8, labels)
        float(l)


if __name__ == "__main__":
    main()
