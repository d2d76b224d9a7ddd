"""Clean raw int8-vs-bf16 MXU rate measurement (the decisive premise
check for the 10503 img/s int8 speed-of-light claim).

tools/exp_int8_dot.py part (1) timed single small dots per dispatch —
through the relay the per-dispatch/fetch overhead (~60 ms) swamps a
~0.1 ms dot, so its '0.2 TOPS' lines measure the tunnel, not the MXU.
This chains DEPTH dependent dots inside ONE jitted program per dtype
(each dot feeds the next, so XLA can't elide any) and fetches once.

Shapes are MXU-native ([4096, 2048] x [2048, 2048]) with no Pallas and
no quantize passes — pure XLA dots, so the measured ratio is the MXU's
int8:bf16 rate on this jaxlib, nothing else.

Usage: timeout 1800 python tools/exp_int8_rate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import uml_tpu  # noqa: F401

N, K, M, DEPTH = 4096, 2048, 2048, 24


def main():
    rng = np.random.default_rng(0)
    xb = jax.device_put(jnp.asarray(
        rng.standard_normal((N, K)), jnp.bfloat16))
    wb = jax.device_put(jnp.asarray(
        rng.standard_normal((K, M)) * 0.02, jnp.bfloat16))
    xq = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (N, K)), jnp.int8))
    wq = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (K, M)), jnp.int8))
    jax.block_until_ready((xb, wb, xq, wq))

    @jax.jit
    def chain_bf16(x, w):
        for _ in range(DEPTH):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            x = y.astype(jnp.bfloat16) * 1e-3  # keep finite, feed next
        return x.sum()

    @jax.jit
    def chain_int8(x, w):
        for _ in range(DEPTH):
            y = jax.lax.dot_general(
                x, w, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # cheap re-quantize: shift back into int8 range (elementwise,
            # same per-dot epilogue weight as bf16's scale+cast)
            x = (y // (1 << 14)).astype(jnp.int8)
        return x.sum()

    flops = 2 * N * K * M * DEPTH

    def timeit(label, fn, *args, iters=5, runs=3):
        float(fn(*args))
        rates = []
        for _ in range(runs):
            t0 = time.time()
            outs = [fn(*args) for _ in range(iters)]
            for o in outs:
                float(o)
            rates.append((time.time() - t0) / iters)
        ms = sorted(rates)[len(rates) // 2] * 1e3
        print(f"{label:14s}: {ms:8.2f} ms = {flops / ms / 1e9:7.1f} "
              f"T(FL)OPS", flush=True)
        return ms

    t_b = timeit("bf16 chain", chain_bf16, xb, wb)
    t_q = timeit("int8 chain", chain_int8, xq, wq)
    t_b2 = timeit("bf16 (drift)", chain_bf16, xb, wb)
    print(f"int8/bf16 rate ratio: {t_b / t_q:.3f}x (drift "
          f"{t_b2 / max(t_b, 1e-9):.4f})")


if __name__ == "__main__":
    main()
