"""Decompose the int8 serving gap: 11-layer STACKED half-block timings
(one dispatch per stack, one fetch) so per-dispatch relay overhead can't
pollute the comparison the way tools/exp_int8_dot.py's single-layer
timings do (its isolated half-block 'times' exceed the composed model's
whole per-layer cost — pure fetch overhead).

Measures at bs2048 S=197 K=768 (ViT-B/16 production shape):
  attn bf16 stack | attn int8 stack | mlp bf16 stack | mlp int8 stack
against each stack's analytic MXU floor (projections at 394 TOPS int8 /
197 TFLOPs bf16, attention math always bf16), and prints the implied
composed ceiling.  This decides where the 63%-of-SoL int8 line actually
loses: QKV/out/MLP dots not at the int8 rate, VPU quantize passes, or
composition.

Usage: timeout 2400 python tools/exp_q8_decomp.py [UML_EXP_BATCH=2048]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import uml_tpu  # noqa: F401

B = int(os.environ.get("UML_EXP_BATCH", 2048))
S, K, H, M = 197, 768, 12, 3072
LAYERS = 11


def timeit(label, fn, *args, iters=4, runs=3):
    out = fn(*args)
    float(jnp.sum(out))
    rates = []
    for _ in range(runs):
        t0 = time.time()
        outs = [fn(*args) for _ in range(iters)]
        for o in outs:
            float(jnp.sum(o))
        rates.append((time.time() - t0) / iters)
    ms = sorted(rates)[len(rates) // 2] * 1e3
    print(f"{label:28s}: {ms:8.2f} ms ({ms / LAYERS:6.2f} ms/layer)",
          flush=True)
    return ms


def main():
    from uml_tpu.ops.fused_attention import ln_attn_block
    from uml_tpu.ops.ln_matmul import ln_mlp_block
    from uml_tpu.ops.quant import ln_attn_block_q8, ln_mlp_block_q8

    with jax.default_device(jax.devices("cpu")[0]):
        key = jax.random.key(0)
        x = jax.random.normal(key, (B, S, K), jnp.bfloat16)
        sc = jnp.ones((K,), jnp.float32)
        bi = jnp.zeros((K,), jnp.float32)
        wq = jax.random.normal(key, (K, 3 * K), jnp.bfloat16) * 0.02
        bq = jnp.zeros((3 * K,), jnp.float32)
        wo = jax.random.normal(key, (K, K), jnp.bfloat16) * 0.02
        bo = jnp.zeros((K,), jnp.float32)
        w1 = jax.random.normal(key, (K, M), jnp.bfloat16) * 0.02
        b1 = jnp.zeros((M,), jnp.float32)
        w2 = jax.random.normal(key, (M, K), jnp.bfloat16) * 0.02
        b2 = jnp.zeros((K,), jnp.float32)
    ts = jax.block_until_ready(jax.device_put(jax.tree.map(
        np.asarray, (x, sc, bi, wq, bq, wo, bo, w1, b1, w2, b2))))
    x, sc, bi, wq, bq, wo, bo, w1, b1, w2, b2 = ts

    @jax.jit
    def attn_bf16(x):
        for _ in range(LAYERS):
            x = ln_attn_block(x, sc, bi, wq, bq, wo, bo, heads=H)
        return x.sum()

    @jax.jit
    def attn_q8(x):
        for _ in range(LAYERS):
            x = ln_attn_block_q8(x, sc, bi, wq, bq, wo, bo, heads=H)
        return x.sum()

    @jax.jit
    def mlp_bf16(x):
        for _ in range(LAYERS):
            x = ln_mlp_block(x, sc, bi, w1, b1, w2, b2,
                             activation="quick_gelu")
        return x.sum()

    @jax.jit
    def mlp_q8(x):
        for _ in range(LAYERS):
            x = ln_mlp_block_q8(x, sc, bi, w1, b1, w2, b2,
                                activation="quick_gelu")
        return x.sum()

    # analytic floors (ms for the LAYERS-deep stack at bs B)
    proj_attn = 2 * B * S * K * (3 * K) + 2 * B * S * K * K   # qkv + out
    attn_math = 4 * B * H * S * S * 64                        # scores + PV
    proj_mlp = 4 * B * S * K * M
    fl = lambda f, tops: LAYERS * f / (tops * 1e12) * 1e3
    print(f"floors: attn bf16 {fl(proj_attn, 197) + fl(attn_math, 197):.1f}"
          f" | attn int8 {fl(proj_attn, 394) + fl(attn_math, 197):.1f}"
          f" | mlp bf16 {fl(proj_mlp, 197):.1f}"
          f" | mlp int8 {fl(proj_mlp, 394):.1f} ms")

    t_ab = timeit("attn bf16 stack", attn_bf16, x)
    t_aq = timeit("attn int8 stack", attn_q8, x)
    t_mb = timeit("mlp  bf16 stack", mlp_bf16, x)
    t_mq = timeit("mlp  int8 stack", mlp_q8, x)
    print(f"ratios: attn {t_ab / t_aq:.2f}x | mlp {t_mb / t_mq:.2f}x")
    t_ab2 = timeit("attn bf16 stack (drift)", attn_bf16, x)
    print(f"drift: {t_ab2 / max(t_ab, 1e-9):.4f}")


if __name__ == "__main__":
    main()
