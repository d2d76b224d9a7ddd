"""Profile the full-model finetune step (bench.py train_bench shape):
CLIP ViT-B/16 bf16, bs128, fwd+bwd+adamw.  Prints top device ops.

Usage: python tools/profile_train_step.py [trace_dir] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uml_tpu.models.clip import build_clip
from uml_tpu.utils.profiling import trace_and_summarize

ITERS = 3


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/clip_train_trace"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32),
    )
    rng = np.random.default_rng(0)
    u8 = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b, 224 * 224 * 3), dtype=np.uint8)))
    labels = jnp.asarray(rng.integers(0, 100, (b,)), jnp.int32)
    head = jnp.asarray(rng.standard_normal((512, 100)) * 0.01, jnp.float32)
    params = variables["params"]
    tx = optax.adamw(1e-5)
    opt = tx.init(params)

    def loss_fn(p, u8, labels):
        feats = model.apply({"params": p}, u8,
                            method=lambda m, x: m.encode_image_u8(x))
        logits = feats @ head
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    @jax.jit
    def step(p, o, u8, labels):
        loss, grads = jax.value_and_grad(loss_fn)(p, u8, labels)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p, o, l = step(params, opt, u8, labels)
    float(l)
    t0 = time.time()
    for _ in range(5):
        p, o, l = step(p, o, u8, labels)
    float(l)
    dt = (time.time() - t0) / 5
    print(f"step: {dt*1e3:.1f} ms  ({b/dt:.1f} img/s) at bs{b}")

    with trace_and_summarize(trace_dir, iters=ITERS, top=25):
        for _ in range(ITERS):
            p, o, l = step(p, o, u8, labels)
        float(l)


if __name__ == "__main__":
    main()
