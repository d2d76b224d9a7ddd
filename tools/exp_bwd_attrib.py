"""Attribute the composed-backward overhead (the ~24%-over-kernel-sum,
~86 ms at bs512) to its owner: dW contractions, Pallas/XLA program
alternation, or the dx chain itself.

Round-3 facts (tools/exp_train_bs512.py, COVERAGE.md): isolated 12-layer
half-block stacks time attn 154.1 + mlp 205.0 = 359.1 ms fwd+bwd at
bs512 while the composed tower times 444.9, and the composed FORWARD is
23 ms FASTER than the fwd-halves sum — so the backward chain alone
carries ~109 ms of composition loss.  Per-op accounting says the dW
contractions alone are ~7.2 ms/layer (~86 ms) of real MXU work, which
is suspiciously close to that gap.  This experiment separates:

  tower_fwd        composed 12-layer forward (sanity / drift control)
  vjp_full         d(tower)/d(x, params)  — the shipping configuration
  vjp_x_only       d(tower)/d(x)          — NO dW contractions at all
  vjp_full_ref     same as vjp_full but every half-block's backward is
                   the jnp twin (no Pallas in the backward): tests the
                   Pallas/XLA alternation hypothesis
  vjp_x_only-delta = dW's true composed cost; compare with its ~86 ms
                   FLOP floor to see if dW runs at floor (then the
                   overhead IS the dW work and the fix is overlap) or
                   above it (then scheduling is the loss)

Usage: timeout 2400 python tools/exp_bwd_attrib.py  [UML_EXP_BATCH=512]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import uml_tpu  # noqa: F401

B = int(os.environ.get("UML_EXP_BATCH", 512))
LAYERS = 12


def timeit(label, fn, *args, iters=5, runs=3):
    jax.block_until_ready(fn(*args))
    rates = []
    for _ in range(runs):
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        # force a scalar fetch: block_until_ready can no-op via the relay
        jax.tree.map(lambda a: float(jnp.asarray(a).sum()),
                     jax.tree.leaves(out)[:1])
        rates.append((time.time() - t0) / iters)
    ms = sorted(rates)[len(rates) // 2] * 1e3
    print(f"{label:36s}: {ms:8.2f} ms", flush=True)
    return ms


def make_params(key, layers, k=768, m=3072, heads=12):
    ws = []
    for i in range(layers):
        key, *sub = jax.random.split(key, 7)
        ws.append(dict(
            ln1_s=jnp.ones((k,), jnp.bfloat16),
            ln1_b=jnp.zeros((k,), jnp.bfloat16),
            qkv_w=jax.random.normal(sub[0], (k, 3 * k), jnp.bfloat16) * 0.02,
            qkv_b=jnp.zeros((3 * k,), jnp.bfloat16),
            out_w=jax.random.normal(sub[1], (k, k), jnp.bfloat16) * 0.02,
            out_b=jnp.zeros((k,), jnp.bfloat16),
            ln2_s=jnp.ones((k,), jnp.bfloat16),
            ln2_b=jnp.zeros((k,), jnp.bfloat16),
            fc_w=jax.random.normal(sub[2], (k, m), jnp.bfloat16) * 0.02,
            fc_b=jnp.zeros((m,), jnp.bfloat16),
            pr_w=jax.random.normal(sub[3], (m, k), jnp.bfloat16) * 0.02,
            pr_b=jnp.zeros((k,), jnp.bfloat16),
        ))
    return ws


def tower(x, params, heads=12, impl="auto"):
    from uml_tpu.ops.fused_attention import ln_attn_block
    from uml_tpu.ops.ln_matmul import ln_mlp_block

    for w in params:
        x = ln_attn_block(x, w["ln1_s"], w["ln1_b"], w["qkv_w"], w["qkv_b"],
                          w["out_w"], w["out_b"], heads=heads, impl=impl)
        x = ln_mlp_block(x, w["ln2_s"], w["ln2_b"], w["fc_w"], w["fc_b"],
                         w["pr_w"], w["pr_b"], activation="quick_gelu",
                         impl=impl)
    return x


def main():
    s, k = 197, 768
    with jax.default_device(jax.devices("cpu")[0]):
        x = jax.random.normal(jax.random.key(0), (B, s, k), jnp.bfloat16)
        params = make_params(jax.random.key(1), LAYERS)
    x, params = jax.block_until_ready(
        jax.device_put(jax.tree.map(np.asarray, (x, params))))

    fwd = jax.jit(lambda x, p: tower(x, p).sum())
    t_fwd = timeit("tower_fwd", fwd, x, params)

    vjp_full = jax.jit(jax.grad(lambda x, p: tower(x, p).sum(),
                                argnums=(0, 1)))
    t_full = timeit("vjp_full (x + params)", vjp_full, x, params)

    vjp_x = jax.jit(jax.grad(lambda x, p: tower(x, p).sum(), argnums=0))
    t_x = timeit("vjp_x_only", vjp_x, x, params)

    flops_dw_per_layer = (  # 2-dim contractions over B*S rows, 2 flops/MAC
        2 * B * s * k * 3 * k       # dw_qkv
        + 2 * B * s * k * k         # dwo
        + 2 * B * s * k * 4 * k     # dw1
        + 2 * B * s * 4 * k * k)    # dw2
    dw_floor_ms = LAYERS * flops_dw_per_layer / 197e12 * 1e3
    print(f"dW true composed cost: {t_full - t_x:8.2f} ms "
          f"(FLOP floor {dw_floor_ms:.2f} ms)")
    print(f"bwd_full = {t_full - t_fwd:.2f} ms, bwd_x_only = "
          f"{t_x - t_fwd:.2f} ms")

    vjp_ref = jax.jit(jax.grad(
        lambda x, p: tower(x, p, impl="reference").sum(), argnums=(0, 1)))
    t_ref = timeit("vjp_full impl=reference", vjp_ref, x, params)
    fwd_ref = jax.jit(lambda x, p: tower(x, p, impl="reference").sum())
    t_fwd_ref = timeit("tower_fwd impl=reference", fwd_ref, x, params)
    print(f"bwd_reference = {t_ref - t_fwd_ref:.2f} ms (all-XLA backward; "
          f"vs shipping bwd {t_full - t_fwd:.2f})")

    t_fwd2 = timeit("tower_fwd (drift control)", fwd, x, params)
    print(f"drift: {t_fwd2 / max(t_fwd, 1e-9):.4f}")


if __name__ == "__main__":
    main()
