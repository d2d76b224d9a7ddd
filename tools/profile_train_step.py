"""Per-phase timing of the full-model finetune step (bench.train_bench's
program): fwd-only, fwd+bwd (no optimizer), and the full step with adamw,
at bs128 — to locate the gap between the measured step and the kernel-sum
floor.  Also times the 12-layer attention/MLP halves in isolation.

Usage: timeout 1500 python tools/profile_train_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import uml_tpu  # noqa: F401


def timeit(label, fn, *args, iters=5, runs=3):
    fn(*args)  # compile if needed (caller pre-compiles for donated fns)
    rates = []
    for _ in range(runs):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        rates.append((time.time() - t0) / iters)
    ms = sorted(rates)[len(rates) // 2] * 1e3
    print(f"{label:44s}: {ms:8.2f} ms", flush=True)
    return ms


def main():
    import bench

    model = bench.build_clip("ViT-B/16", dtype=jnp.bfloat16)
    print("init...", flush=True)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    print("stage...", flush=True)
    u8 = bench.stage_input(128, 224 * 224 * 3)
    print("staged", flush=True)
    b = 128

    import optax

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

    # 1. forward only
    fwd = jax.jit(loss_fn)
    timeit("fwd only (loss)", fwd, params, u8, labels)

    # 2. fwd + bwd, no optimizer
    grad = jax.jit(jax.value_and_grad(loss_fn))
    timeit("fwd+bwd (value_and_grad)", grad, params, u8, labels)

    # 3. optimizer alone (donated)
    import functools

    @functools.partial(jax.jit, donate_argnums=(1,))
    def opt_step(g, o, p):
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o

    _, g0 = jax.block_until_ready(grad(params, u8, labels))
    p1, o1 = jax.block_until_ready(opt_step(g0, opt, params))
    opt = tx.init(params)  # the donated tree above is gone; fresh state

    def opt_only():
        nonlocal o1
        p, o1 = opt_step(g0, o1, params)
        return p

    timeit("adamw update+apply (donated opt)", opt_only)

    # 4. the full donated step (what train_bench times)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(p, o, u8, labels):
        loss, grads = jax.value_and_grad(loss_fn)(p, u8, labels)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p, o, l = step(params, opt, u8, labels)
    float(l)

    def full():
        nonlocal p, o
        p, o, l = step(p, o, u8, labels)
        return l

    ms = timeit("full donated step", full)
    print(f"  -> {128 / ms * 1e3:.1f} img/s")

    # 5. isolated 12-layer halves at [128, 197, 768]
    from uml_tpu.ops.fused_attention import ln_attn_block
    from uml_tpu.ops.ln_matmul import ln_mlp_block

    k, heads, m = 768, 12, 3072
    key = jax.random.key(1)
    with jax.default_device(jax.devices("cpu")[0]):
        x = jax.random.normal(key, (128, 197, k), jnp.bfloat16)
        qkv_w = jax.random.normal(key, (k, 3 * k), jnp.bfloat16) * 0.02
        qkv_b = jnp.zeros((3 * k,), jnp.bfloat16)
        wo = jax.random.normal(key, (k, k), jnp.bfloat16) * 0.02
        bo = jnp.zeros((k,), jnp.bfloat16)
        w1 = jax.random.normal(key, (k, m), jnp.bfloat16) * 0.02
        b1 = jnp.zeros((m,), jnp.bfloat16)
        w2 = jax.random.normal(key, (m, k), jnp.bfloat16) * 0.02
        b2 = jnp.zeros((k,), jnp.bfloat16)
        sc = jnp.ones((k,), jnp.bfloat16)
        bi = jnp.zeros((k,), jnp.bfloat16)
    # host-numpy route before the cross-backend put (see bench.init_on_cpu)
    args = jax.tree.map(np.asarray,
                        (x, qkv_w, qkv_b, wo, bo, w1, b1, w2, b2, sc, bi))
    args = jax.block_until_ready(jax.device_put(args))
    x, qkv_w, qkv_b, wo, bo, w1, b1, w2, b2, sc, bi = args

    attn_w = (sc, bi, qkv_w, qkv_b, wo, bo)
    mlp_w = (sc, bi, w1, b1, w2, b2)

    @jax.jit
    def attn12(x, w):
        for _ in range(12):
            x = ln_attn_block(x, *w, heads=heads, causal=False)
        return x

    @jax.jit
    def mlp12(x, w):
        for _ in range(12):
            x = ln_mlp_block(x, *w, activation="quick_gelu")
        return x

    timeit("12x attn half fwd (bs128)", attn12, x, attn_w)
    timeit("12x mlp half fwd (bs128)", mlp12, x, mlp_w)

    # vjp over x AND the weights — the real step pays the dW matmuls too
    @jax.jit
    def attn12_vjp(x, w):
        y, vjp = jax.vjp(attn12, x, w)
        return vjp(y)[0]

    @jax.jit
    def mlp12_vjp(x, w):
        y, vjp = jax.vjp(mlp12, x, w)
        return vjp(y)[0]

    timeit("12x attn half fwd+bwd (bs128)", attn12_vjp, x, attn_w)
    timeit("12x mlp half fwd+bwd (bs128)", mlp12_vjp, x, mlp_w)
    print("done", flush=True)


if __name__ == "__main__":
    main()
