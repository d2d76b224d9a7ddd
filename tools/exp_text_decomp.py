"""Decompose encode_text's non-tower overhead (VERDICT r5 follow-up on
item 2: tower G=8 measured 25,447 sent/s vs the 25,800 target).

At bs2048 the full encode_text step is ~80 ms; the tower kernel's
analytic floor is ~63.5 ms.  This separates the residual into
  embed   token-embedding gather + pos add        (VPU/HBM gather)
  tower   the whole-tower Pallas kernel alone     (the kernel itself)
  tail    ln_final + EOT pool + text projection   (fp32 epilogue)
by timing nested prefixes of the same jitted pipeline, and A/Bs the
pooled-before-LN tail (models/clip.py) against the per-layer path for
numerics (gather-then-LN must equal LN-then-gather bitwise).

Usage: timeout 1200 python tools/exp_text_decomp.py
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

    model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    toks = bench.stage_tokens(bench.BATCH)

    def enc(v, t):
        return model.apply(v, t, method=lambda m, tt: m.encode_text(tt))

    # time (a) full, (b) tokens path via return_tokens (embed + tower +
    # all-row ln_final — the upper bound of embed+tower), (c) full again
    # (drift control)
    @jax.jit
    def full_sum(v, t):
        return enc(v, t).sum()

    @jax.jit
    def tokens_sum(v, t):
        out = model.apply(
            v, t, method=lambda m, tt: m.encode_text(tt, return_tokens=True))
        return out.sum()

    r_full = bench.device_bench(full_sum, variables, toks, iters=10, runs=3)
    r_tok = bench.device_bench(tokens_sum, variables, toks, iters=10, runs=3)
    r_full2 = bench.device_bench(full_sum, variables, toks, iters=10, runs=3)
    b = toks.shape[0]
    print(f"full encode_text : {r_full:9.1f} sent/s ({b / r_full * 1e3:6.2f} ms)")
    print(f"tokens (allrow LN): {r_tok:9.1f} sent/s ({b / r_tok * 1e3:6.2f} ms)")
    print(f"full drift       : {r_full2:9.1f} sent/s")

    # numerics: tower path vs per-layer path (pooled-before-LN tail must
    # match the two-kernel path's LN-then-pool bitwise at fp32)
    toks_small = jnp.asarray(np.asarray(jax.device_get(toks))[:64])
    a = float(full_sum(variables, toks_small))
    os.environ["UML_TEXT_TOWER"] = "0"
    try:
        model2 = build_clip("ViT-B/16", dtype=jnp.bfloat16)
        b2 = float(jax.jit(
            lambda v, t: model2.apply(
                v, t, method=lambda m, tt: m.encode_text(tt)).sum()
        )(variables, toks_small))
    finally:
        os.environ.pop("UML_TEXT_TOWER", None)
    print(f"tower-vs-perlayer sum: {a:.6f} vs {b2:.6f} "
          f"(rel {abs(a - b2) / max(abs(b2), 1e-9):.2e})")


if __name__ == "__main__":
    main()
