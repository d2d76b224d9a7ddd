"""Attribute the int8 serving mode's composition gap per half-block
family, on the live chip, with composed forwards (isolated single-kernel
timings through the relay carry a ~25 ms fixed dispatch round-trip that
swamps 5-10 ms kernels — tools/exp_int8_dot.py's [1]/[2] sections; a
composed 12-layer forward amortizes it to noise).

Variants of the ViT-B/16 extraction forward at the headline batch:
  none       every half-block bf16 (the headline path)
  int8       every projection int8 (the current --quant int8 path)
  mlp-only   int8 MLP half-blocks, bf16 attention half-blocks
  attn-only  int8 attention half-blocks, bf16 MLP half-blocks

tools/exp_int8_dot.py measured (bs512, isolated + composed):
  attn half-block int8/bf16 = 0.96x  (int8 SLOWER)
  mlp  half-block int8/bf16 = 1.22x
so if mlp-only >= int8 composed, the int8 attention block is a net
loss and the serving mode should quantize only the MLPs (plus QKV?) —
this experiment decides that with same-window drift control.

VERDICT (v5e chip, bs2048, 2026-08-18): the composed forward says the
opposite of the isolated timing — every quantized half helps:
  none      4987.0 img/s   (drift control none#2: 0.9993)
  int8      6562.1 img/s   1.316x
  mlp_only  5914.3 img/s   1.186x
  attn_only 5453.4 img/s   1.094x
The isolated attn "0.96x" was a dispatch-window artifact; in
composition the int8 attention half still removes half the projection
MXU time and the scores pipeline across layer boundaries.  The serving
default therefore stays quant='int8' (both halves); int8_mlp/int8_attn
remain as measured fallbacks for fidelity-sensitive deployments.

VERDICT 2 (v5e chip, bs2048, 2026-08-19, UML_EXP_FAST decision run):
the qkv-only candidate — int8 QKV + bf16 out-proj, skipping the
attention-output quantize (quant='int8_qkv', ops.quant q8_out=False) —
measured 6437.0 img/s (1.2952x) vs full int8's 6553.8 (1.3187x),
drift control 1.0040.  Composed, the out-projection's int8 MXU saving
beats its quantize overhead, so the serving default KEEPS both
projections int8; 'int8_qkv' stays as a measured mode (slightly higher
fidelity, ~2% slower).

Usage: timeout 3600 python tools/exp_q8_mix.py  [UML_EXP_BATCH=2048]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("UML_EXP_BATCH", 2048))


def main():
    import jax

    import bench

    variants = ("none", "int8", "qkv_mlp", "mlp_only", "attn_only",
                "none#2")
    if os.environ.get("UML_EXP_FAST") == "1":
        # decision run for the qkv_mlp candidate: headline mode + the
        # candidate + drift control only
        variants = ("none", "int8", "qkv_mlp", "none#2")
    u8 = bench.stage_input(B, 224 * 224 * 3)
    rates = {}
    for tag in variants:
        quant = {"none": "none", "none#2": "none", "int8": "int8",
                 "qkv_mlp": "int8_qkv",
                 "mlp_only": "int8_mlp", "attn_only": "int8_attn"}[tag]
        from uml_tpu.models.clip import build_clip

        model = build_clip("ViT-B/16", dtype=jax.numpy.bfloat16, quant=quant)
        variables = bench.init_on_cpu(lambda: model.init(
            jax.random.key(0),
            jax.numpy.zeros((1, 224, 224, 3), jax.numpy.float32),
            jax.numpy.zeros((1, 77), jax.numpy.int32)))

        @jax.jit
        def fwd(v, x):
            return model.apply(
                v, x, method=lambda m, y: m.encode_image_u8(y)).sum()

        rates[tag] = bench.device_bench(fwd, variables, u8, iters=5)
        print(f"{tag:10s}: {rates[tag]:8.1f} img/s", flush=True)
    base = rates["none"]
    print(f"drift control none#2/none: {rates['none#2'] / base:.4f}")
    for tag in variants:
        if tag in ("none", "none#2"):
            continue
        print(f"{tag}/none: {rates[tag] / base:.4f}")


if __name__ == "__main__":
    main()
