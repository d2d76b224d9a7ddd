"""Split encode_text into kernel-only vs embed/fold/stack overhead.

exp_text_decomp showed the tail (ln_final/pool/proj) is free; the whole
~80 ms lives in embed + in-jit weight fold/stack + the tower kernel.
This times the tower kernel ALONE on a prebuilt [B,S,K] input with
PRE-STACKED folded weights (what a caching extraction service could
hoist), vs the embed+stack chain, to see whether the ~20% roofline gap
is kernel-internal or overhead the model wrapper adds per call.

Usage: timeout 1200 python tools/exp_text_decomp2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from uml_tpu.models.clip import build_clip
    from uml_tpu.ops.fused_attention import fold_ln_into_matmul
    from uml_tpu.ops.text_tower import text_tower

    model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    toks = bench.stage_tokens(bench.BATCH)
    b = toks.shape[0]

    # pre-stack the folded per-layer weights on host (numpy), one put
    tp = jax.tree.map(np.asarray, jax.device_get(
        variables["params"]["text"]["transformer"]))
    cfg = model.config
    stacks = [[] for _ in range(8)]
    for i in range(cfg.transformer_layers):
        blk = tp[f"resblocks_{i}"]
        w_eff, b_eff = fold_ln_into_matmul(
            jnp.asarray(blk["ln_1"]["ln"]["scale"]),
            jnp.asarray(blk["ln_1"]["ln"]["bias"]),
            jnp.asarray(blk["qkv"]["kernel"], jnp.bfloat16),
            jnp.asarray(blk["qkv"]["bias"]))
        w1_eff, b1_eff = fold_ln_into_matmul(
            jnp.asarray(blk["ln_2"]["ln"]["scale"]),
            jnp.asarray(blk["ln_2"]["ln"]["bias"]),
            jnp.asarray(blk["c_fc"]["kernel"], jnp.bfloat16),
            jnp.asarray(blk["c_fc"]["bias"]))
        parts = (w_eff, b_eff,
                 jnp.asarray(blk["out_proj"]["kernel"], jnp.bfloat16),
                 jnp.asarray(blk["out_proj"]["bias"]),
                 w1_eff, b1_eff,
                 jnp.asarray(blk["c_proj"]["kernel"], jnp.bfloat16),
                 jnp.asarray(blk["c_proj"]["bias"]))
        for s_, p in zip(stacks, parts):
            s_.append(np.asarray(jax.device_get(p)))
    stacked = [jax.device_put(np.stack(s_)) for s_ in stacks]

    x = jax.device_put(np.random.default_rng(0).standard_normal(
        (b, 77, 512)).astype(np.float32).astype(jnp.bfloat16))

    @jax.jit
    def tower_sum(x, *w):
        return text_tower(x, *w, heads=cfg.transformer_heads).sum()

    @jax.jit
    def embed_sum(v, t):
        emb = v["params"]["text"]["token_embedding"]["embedding"]
        pos = v["params"]["text"]["positional_embedding"]
        e = jnp.take(emb, t, axis=0) + pos[: t.shape[1]].astype(emb.dtype)
        return e.sum()

    def run(label, fn, *args, iters=10, runs=3):
        float(fn(*args))
        rates = []
        for _ in range(runs):
            t0 = time.time()
            outs = [fn(*args) for _ in range(iters)]
            _ = [float(o) for o in outs]
            rates.append(b * iters / (time.time() - t0))
        r = sorted(rates)[1]
        print(f"{label:24s} {r:9.1f} sent/s ({b / r * 1e3:6.2f} ms)",
              flush=True)
        return r

    run("tower kernel only", tower_sum, x, *stacked)
    run("embed only", embed_sum, variables, toks)

    @jax.jit
    def full_sum(v, t):
        return model.apply(
            v, t, method=lambda m, tt: m.encode_text(tt)).sum()

    run("full encode_text", full_sum, variables, toks)
    run("tower kernel (drift)", tower_sum, x, *stacked)


if __name__ == "__main__":
    main()
