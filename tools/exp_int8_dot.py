"""A/B the int8 (W8A8) half-block kernels against bf16 on the live chip.

Run (TPU): python tools/exp_int8_dot.py  [UML_Q8_BATCH=512]

Measures, at ViT-B/16 production shape ([B, 197, 768]):
  1. a raw int8 vs bf16 [2048, 768] x [768, 3072] Pallas dot (does Mosaic
     lower int8 matmuls to the 394-TOPS MXU path on this jaxlib at all?),
  2. the attention half-block: ln_attn_block (bf16) vs ln_attn_block_q8,
  3. the MLP half-block: ln_mlp_block (bf16) vs ln_mlp_block_q8,
  4. the full 12-layer extraction forward: build_clip quant none vs int8.

Timing rule (relay): enqueue ITERS dispatches, fetch all results at the
end (block_until_ready on compute is a no-op through the tunnel).
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

B = int(os.environ.get("UML_Q8_BATCH", 512))
S, K, H = 197, 768, 12
ITERS = 20


def timeit(fn, *args, iters=ITERS):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # real sync
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        float(jnp.sum(o[0] if isinstance(o, tuple) else o))
    return (time.time() - t0) / iters


def _dot_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=o_ref.dtype).astype(o_ref.dtype)


def raw_dot(n=2048, k=768, m=3072, dtype=jnp.bfloat16, acc=jnp.float32):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 128, (n, k)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 128, (k, m)), jnp.int8)
    else:
        x = jnp.asarray(rng.standard_normal((n, k)), dtype)
        w = jnp.asarray(rng.standard_normal((k, m)), dtype)

    @jax.jit
    def run(x, w):
        # single-block program: x(3) + w(4.5) + out(25.2 fp32) MB exceeds
        # Mosaic's 16 MB scoped default -> explicit raise (v5e: 128 MB)
        return pl.pallas_call(
            _dot_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, m), acc),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20),
        )(x, w)

    dt = timeit(run, x, w)
    tflops = 2 * n * k * m / dt / 1e12
    print(f"  raw [{n},{k}]x[{k},{m}] {jnp.dtype(dtype).name}: "
          f"{dt*1e3:.3f} ms = {tflops:.1f} T(FL)OPS")
    return dt


def half_blocks():
    from uml_tpu.ops.fused_attention import ln_attn_block
    from uml_tpu.ops.ln_matmul import ln_mlp_block
    from uml_tpu.ops.quant import ln_attn_block_q8, ln_mlp_block_q8

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, K)) * 0.5, jnp.bfloat16)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(K), jnp.float32)
    bias = jnp.asarray(0.05 * rng.standard_normal(K), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, 3 * K)) * K**-0.5, jnp.bfloat16)
    kb = jnp.asarray(0.02 * rng.standard_normal(3 * K), jnp.float32)
    wo = jnp.asarray(rng.standard_normal((K, K)) * K**-0.5, jnp.bfloat16)
    bo = jnp.asarray(0.02 * rng.standard_normal(K), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((K, 4 * K)) * K**-0.5, jnp.bfloat16)
    b1 = jnp.asarray(0.02 * rng.standard_normal(4 * K), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((4 * K, K)) * (4 * K)**-0.5,
                     jnp.bfloat16)
    b2 = jnp.asarray(0.02 * rng.standard_normal(K), jnp.float32)

    attn_f = jax.jit(functools.partial(ln_attn_block, heads=H))
    attn_q = jax.jit(functools.partial(ln_attn_block_q8, heads=H))
    mlp_f = jax.jit(functools.partial(ln_mlp_block, activation="quick_gelu"))
    mlp_q = jax.jit(functools.partial(ln_mlp_block_q8,
                                      activation="quick_gelu"))
    tf = timeit(attn_f, x, scale, bias, w, kb, wo, bo)
    tq = timeit(attn_q, x, scale, bias, w, kb, wo, bo)
    print(f"  attn half-block bs{B}: bf16 {tf*1e3:.2f} ms | int8 "
          f"{tq*1e3:.2f} ms ({tf/tq:.2f}x)")
    tf = timeit(mlp_f, x, scale, bias, w1, b1, w2, b2)
    tq = timeit(mlp_q, x, scale, bias, w1, b1, w2, b2)
    print(f"  mlp  half-block bs{B}: bf16 {tf*1e3:.2f} ms | int8 "
          f"{tq*1e3:.2f} ms ({tf/tq:.2f}x)")


def full_forward():
    from uml_tpu.models.clip import build_clip

    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (B, 224 * 224 * 3), dtype=np.uint8))
    for quant in ("none", "int8"):
        model = build_clip("ViT-B/16", dtype=jnp.bfloat16, quant=quant)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = jax.jit(lambda: model.init(
                jax.random.key(0),
                jnp.zeros((1, 224, 224, 3), jnp.float32),
                jnp.zeros((1, 77), jnp.int32)))()
        variables = jax.device_put(jax.tree.map(np.asarray, variables),
                                   jax.devices()[0])
        jax.block_until_ready(variables)

        @jax.jit
        def run(v, u8):
            return model.apply(v, u8,
                               method=lambda m, x: m.encode_image_u8(x))

        dt = timeit(run, variables, u8, iters=10)
        print(f"  ViT-B/16 forward bs{B} quant={quant}: {dt*1e3:.2f} ms = "
              f"{B/dt:.1f} img/s")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    print("[1] raw Pallas dots")
    raw_dot(dtype=jnp.bfloat16)
    raw_dot(dtype=jnp.int8, acc=jnp.int32)
    print("[2] half-blocks")
    half_blocks()
    print("[3] full extraction forward")
    full_forward()
