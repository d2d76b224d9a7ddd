"""Microbench the two fused ViT kernels at production shape (bs512, S=197).

Usage: python tools/kernel_bench.py [mlp|attn|all]
Prints ms/layer-call for each kernel, averaged over ITERS timed calls of a
12-deep jitted stack (matching one ViT-B/16 forward's worth of work).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from uml_tpu.ops.fused_attention import ln_attn_block
from uml_tpu.ops.ln_matmul import ln_mlp_block

B, S, K, H = 512, 197, 768, 12
LAYERS = 12
ITERS = 8


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / ITERS / LAYERS * 1e3


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, K)), jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(K), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(K), jnp.float32)

    if which in ("mlp", "all"):
        w1 = jnp.asarray(rng.standard_normal((K, 4 * K)) * 0.02, jnp.bfloat16)
        b1 = jnp.asarray(rng.standard_normal(4 * K), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((4 * K, K)) * 0.02, jnp.bfloat16)
        b2 = jnp.asarray(rng.standard_normal(K), jnp.float32)

        @jax.jit
        def mlp_stack(x):
            for _ in range(LAYERS):
                x = ln_mlp_block(x, scale, bias, w1, b1, w2, b2,
                                 activation="quick_gelu")
            return x

        print(f"mlp_block:  {timed(mlp_stack, x):7.3f} ms/layer")

    if which in ("attn", "all"):
        wq = jnp.asarray(rng.standard_normal((K, 3 * K)) * 0.02, jnp.bfloat16)
        bq = jnp.asarray(rng.standard_normal(3 * K), jnp.float32)
        wo = jnp.asarray(rng.standard_normal((K, K)) * 0.02, jnp.bfloat16)
        bo = jnp.asarray(rng.standard_normal(K), jnp.float32)

        @jax.jit
        def attn_stack(x):
            for _ in range(LAYERS):
                x = ln_attn_block(x, scale, bias, wq, bq, wo, bo, heads=H)
            return x

        print(f"attn_block: {timed(attn_stack, x):7.3f} ms/layer")


if __name__ == "__main__":
    main()
