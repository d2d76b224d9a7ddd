"""The decisive int8 MXU rate measurement: DEPTH dependent dots chained
INSIDE one Pallas kernel on VMEM-resident operands — no XLA scheduling,
no HBM traffic in the loop, one dispatch, one fetch.  Whatever ratio
this prints is the true Mosaic int8:bf16 matmul rate on this chip, and
therefore the correct physics constant for the int8 serving mode's
speed-of-light (which currently assumes the v5e spec-sheet 394 TOPS =
2x bf16).

Chain body: x <- f(x @ w) where f is the cheapest epilogue keeping the
dtype closed (bf16: scale+cast; int8: shift+cast) — a [N, 128-lane]
elementwise pass per step, identical weight in both chains.

Usage: timeout 1500 python tools/exp_int8_rate_pallas.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import uml_tpu  # noqa: F401

N, K, DEPTH = 512, 2048, 48  # w: [2048, 2048] -> 4 MB int8 / 8 MB bf16


def _chain_kernel(x_ref, w_ref, o_ref, *, depth, int8):
    x = x_ref[:]
    for _ in range(depth):
        if int8:
            acc = jax.lax.dot_general(
                x, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            x = (acc >> 14).astype(jnp.int8)
        else:
            acc = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
            x = (acc * 1e-3).astype(jnp.bfloat16)
    o_ref[:] = x


@functools.partial(jax.jit, static_argnames=("int8",))
def chain(x, w, int8):
    return pl.pallas_call(
        functools.partial(_chain_kernel, depth=DEPTH, int8=int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, K), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K * K * DEPTH,
            bytes_accessed=N * K * 4 + K * K,
            transcendentals=0),
    )(x, w)


def timeit(label, fn, x, w, int8, iters=64, runs=3):
    """Each call's OUTPUT feeds the next call's input, so the device
    serializes the dispatches and ONE fetch ends the run — through the
    relay a fetch costs ~30 ms, which would swamp a ~1 ms program if
    fetched per call (the first revision of this tool measured exactly
    that: 6.9 "TFLOPS" of pure fetch overhead)."""
    y = fn(x, w, int8)
    float(jnp.asarray(y, jnp.float32).sum())
    rates = []
    flops = 2 * N * K * K * DEPTH
    for _ in range(runs):
        y = x
        t0 = time.time()
        for _ in range(iters):
            y = fn(y, w, int8)
        float(jnp.asarray(y, jnp.float32).sum())
        rates.append((time.time() - t0) / iters)
    ms = sorted(rates)[len(rates) // 2] * 1e3
    print(f"{label:14s}: {ms:8.3f} ms = {flops / ms / 1e9:7.1f} T(FL)OPS",
          flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    xb = jax.device_put(jnp.asarray(
        rng.standard_normal((N, K)), jnp.bfloat16))
    wb = jax.device_put(jnp.asarray(
        rng.standard_normal((K, K)) * 0.02, jnp.bfloat16))
    xq = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (N, K)), jnp.int8))
    wq = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (K, K)), jnp.int8))
    jax.block_until_ready((xb, wb, xq, wq))

    t_b = timeit("bf16 in-kernel", chain, xb, wb, False)
    t_q = timeit("int8 in-kernel", chain, xq, wq, True)
    t_b2 = timeit("bf16 (drift)", chain, xb, wb, False)
    print(f"int8/bf16 MXU rate ratio: {t_b / t_q:.3f}x "
          f"(drift {t_b2 / max(t_b, 1e-9):.4f})")


if __name__ == "__main__":
    main()
