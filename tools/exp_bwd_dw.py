"""Same-window A/B of the in-kernel-accumulated-dW backwards vs the
shipping paths, on the live chip, as 12-layer composed vjp stacks (the
measurement that decides UML_MLP_BWD's default).

Hypothesis (tools/exp_train_bs512.py): the composed backward is
batch-invariant ~20-24% over its kernel-sum floor because every layer
round-trips hidden-width intermediates through HBM — the XLA-autodiff
MLP backward streams its fp32 [S, 4K] hidden, and the attention
backward ships dqkv/xn/attn out so XLA can form dW.  The dw variants
accumulate dW in VMEM across the batch grid instead.

Usage: timeout 2400 python tools/exp_bwd_dw.py  [UML_EXP_BATCH=512]

VERDICT (v5e, bs512, 2026-08-18): hypothesis REFUTED for the MLP —
  xla 205.0 ms   dw 238.7 (1.16x)   dw#g2 275.3   dw#g4 250.4
  (drift control xla#2/xla = 0.9991)
XLA's autodiff beats the VMEM-accumulated-dW kernel: batching the dW
contraction over all B*S rows ([100864 x K] @ [100864 x M], ~1% MXU
pad) is worth more than avoiding the hidden-width HBM round trips,
while the in-kernel per-step dW dots contract over grp*197 rows (pad
to 256: ~30% dead cycles on ALL the dots at grp=1) and larger grp
loses more to VMEM pressure (the fp32 accumulators + temps crowd out
double buffering).  UML_MLP_BWD=dw stays available as the measured
record; the default remains XLA autodiff of the jnp twin.  The
analogous attention-side change was not pursued: same pad economics,
and its baseline already ships bf16 (not fp32) intermediates.
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


def timeit(label, fn, *args, iters=5, runs=3):
    jax.block_until_ready(fn(*args))
    rates = []
    for _ in range(runs):
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        rates.append((time.time() - t0) / iters)
    ms = sorted(rates)[len(rates) // 2] * 1e3
    print(f"{label:40s}: {ms:8.2f} ms", flush=True)
    return ms


def main():
    import bench
    from uml_tpu.ops.ln_matmul import ln_mlp_block

    k, m, s = 768, 3072, 197
    key = jax.random.key(1)
    with jax.default_device(jax.devices("cpu")[0]):
        x = jax.random.normal(key, (B, s, k), jnp.bfloat16)
        w1 = jax.random.normal(key, (k, m), jnp.bfloat16) * 0.02
        b1 = jnp.zeros((m,), jnp.bfloat16)
        w2 = jax.random.normal(key, (m, k), jnp.bfloat16) * 0.02
        b2 = jnp.zeros((k,), jnp.bfloat16)
        sc = jnp.ones((k,), jnp.bfloat16)
        bi = jnp.zeros((k,), jnp.bfloat16)
    args = jax.tree.map(np.asarray, (x, sc, bi, w1, b1, w2, b2))
    args = jax.block_until_ready(jax.device_put(args))
    x, sc, bi, w1, b1, w2, b2 = args
    mlp_w = (sc, bi, w1, b1, w2, b2)

    @jax.jit
    def mlp12_vjp(x, w):
        def stack(x, w):
            for _ in range(12):
                x = ln_mlp_block(x, *w, activation="quick_gelu")
            return x
        y, vjp = jax.vjp(stack, x, w)
        return vjp(y)[0]

    results = {}
    for mode in ("xla", "dw", "dw#g2", "dw#g4", "xla#2"):
        env = mode.split("#")[0]
        os.environ["UML_MLP_BWD"] = env
        os.environ["UML_MLP_BWD_G"] = mode[-1] if "#g" in mode else "1"
        jax.clear_caches()
        results[mode] = timeit(f"12x mlp fwd+bwd bs{B} [{mode}]",
                               mlp12_vjp, x, mlp_w)
    base = results["xla"]
    print(f"drift control xla#2/xla: {results['xla#2'] / base:.4f}")
    for mode in ("dw", "dw#g2", "dw#g4"):
        print(f"{mode}/xla: {results[mode] / base:.4f}")


if __name__ == "__main__":
    main()
