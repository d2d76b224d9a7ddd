"""Roofline accounting for the ViT-B/16 extraction forward on v5e.

Times each phase of the forward in isolation at the production batch and
prints exact-FLOP floors against the chip's bf16 peak, so the headline
number's distance to speed-of-light is a measured statement, not a
convention.  (Published "17.6 GFLOPs" for ViT-B/16 counts multiply-adds
as one op; the MXU peak of 197 TF/s counts them as two.  The same
convention must be used on both sides: real FLOPs are ~34 GF/img.)

Usage: timeout 1500 python tools/roofline_clip.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_TFS = 197.0  # v5e bf16 dense peak (2 flops per MAC)
B = int(os.environ.get("UML_ROOFLINE_BATCH", 2048))
S, K, H, M = 197, 768, 12, 3072
PATCH = 16


def timeit(fn, *args, iters=5, runs=3):
    out = fn(*args)
    out.block_until_ready()
    rates = []
    for _ in range(runs):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        out.block_until_ready()
        rates.append((time.time() - t0) / iters)
    return sorted(rates)[len(rates) // 2] * 1e3


def row(label, ms, gflop):
    floor = gflop / PEAK_TFS
    pct = 100 * floor / ms if ms else 0
    print(f"{label:34s}: {ms:8.2f} ms   floor {floor:7.2f} ms   "
          f"({pct:5.1f}% of roofline)", flush=True)
    return ms, floor


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from uml_tpu.ops.fused_attention import ln_attn_block, ln_attn_block_cls
    from uml_tpu.ops.ln_matmul import ln_mlp_block

    model = bench.build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    u8 = bench.stage_input(B, 224 * 224 * 3)

    rng = np.random.default_rng(0)

    def dev(a):
        d = jnp.asarray(a.astype(np.float32), jnp.bfloat16)
        d.block_until_ready()
        return d

    x = dev(rng.standard_normal((B, S, K)) * 0.02)
    qkv_w = dev(rng.standard_normal((K, 3 * K)) * 0.02)
    wo = dev(rng.standard_normal((K, K)) * 0.02)
    w1 = dev(rng.standard_normal((K, M)) * 0.02)
    w2 = dev(rng.standard_normal((M, K)) * 0.02)
    qkv_b = jnp.zeros((3 * K,), jnp.bfloat16)
    bo = jnp.zeros((K,), jnp.bfloat16)
    b1 = jnp.zeros((M,), jnp.bfloat16)
    b2 = jnp.zeros((K,), jnp.bfloat16)
    sc = jnp.ones((K,), jnp.bfloat16)
    bi = jnp.zeros((K,), jnp.bfloat16)

    attn1 = jax.jit(lambda x: ln_attn_block(
        x, sc, bi, qkv_w, qkv_b, wo, bo, heads=H, causal=False))
    mlp1 = jax.jit(lambda x: ln_mlp_block(
        x, sc, bi, w1, b1, w2, b2, activation="quick_gelu"))
    cls1 = jax.jit(lambda x: ln_attn_block_cls(
        x, sc, bi, qkv_w, qkv_b, wo, bo, heads=H))

    # exact real-FLOP counts per layer at batch B (2 flops/MAC);
    # the pair-packed kernel computes scores for head pairs -> 2x the
    # score+AV term is the ALGORITHM'S cost on a 128-lane MXU with d=64
    # (an unpacked layout pads the contraction 64->128 at the same cost)
    gf_qkv = 2 * B * S * K * 3 * K / 1e9
    gf_sc = 2 * 2 * B * H * S * S * 64 / 1e9   # scores, pair-packed (2x)
    gf_av = 2 * 2 * B * H * S * S * 64 / 1e9   # A@V, pair-packed (2x)
    gf_out = 2 * B * S * K * K / 1e9
    gf_attn = gf_qkv + gf_sc + gf_av + gf_out
    gf_mlp = 2 * 2 * B * S * K * M / 1e9
    # CLS-only final block, counted as the kernel actually computes it
    # (ops/fused_attention._block_cls_kernel): K/V for all S rows but Q
    # for only CLS_ROWS=8, 8-row scores+AV, 8-row out-projection.  (An
    # earlier revision counted a full 3K QKV here and a full final MLP
    # below — overstating real work ~2.0 GF/img and flattering the
    # roofline fraction 92% -> the honest ~87%.)
    gf_cls = (2 * B * S * K * 2 * K        # K,V for all S rows
              + 2 * B * 8 * K * K          # Q for 8 rows
              + 2 * 2 * B * H * 8 * S * 64  # 8-row scores + A@V
              + 2 * B * 8 * K * K) / 1e9   # 8-row out-proj
    gf_mlp_cls = 2 * 2 * B * 8 * K * M / 1e9  # final MLP runs on 8 rows

    ms_attn, fl_attn = row("attn half-block (1 layer)",
                           timeit(attn1, x), gf_attn)
    ms_mlp, fl_mlp = row("mlp half-block (1 layer)",
                         timeit(mlp1, x), gf_mlp)
    ms_cls, fl_cls = row("CLS final attn block", timeit(cls1, x), gf_cls)

    ext = bench.make_extract(model)
    full = timeit(lambda u: ext(variables, u), u8)

    # layer 12's 8-row MLP is below isolated-timing noise; the phase sum
    # carries its GF but no timing term
    layers = 11 * (ms_attn + ms_mlp) + ms_cls
    gf_patch = 2 * B * (S - 1) * (PATCH * PATCH * 3) * K / 1e9
    gf_total = 11 * (gf_attn + gf_mlp) + gf_cls + gf_mlp_cls + gf_patch
    print("-" * 76)
    row("sum of kernel phases (11+CLS)", layers, gf_total - gf_patch)
    ms_full, fl_full = row("FULL extraction forward", full, gf_total)
    print(f"\nthroughput: {B / ms_full * 1e3:7.1f} img/s   "
          f"speed-of-light at 100% roofline: "
          f"{B / fl_full * 1e3:.0f} img/s", flush=True)
    print(f"real FLOPs/img: {gf_total / B * 1e3:.1f} MF x {B}", flush=True)

    # --- train-step roofline at the bench's bs128 shape ---------------
    # backward MXU work per FULL layer (2 flops/MAC), hand-counted from
    # ops/fused_attention._block_bwd_kernel + the XLA weight-grad dots +
    # ops/ln_matmul's 5-matmul backward:
    #   attn: qkv recompute + dattn + 6 pair-dot units + dxn (kernel)
    #         + dW_eff + dwo (XLA)                 = 1636M MAC/img
    #   mlp:  5 matmul units x 465M (recompute + dW2/dh/dW1/dxn)
    #                                              = 2325M MAC/img
    bt = 128
    gf_fwd = gf_total / B * bt
    gf_attn_bwd = 2 * 1.636 * bt   # per-image GF x batch
    gf_mlp_bwd = 2 * 2.325 * bt
    gf_cls_bwd = 2 * 1.4 * bt      # qkv recompute + K/V grads, approx
    gf_patch_bwd = 2 * 0.23 * bt   # dW only (input needs no grad)
    # layer 12 trains through the CLS path: its MLP fwd+bwd are 8-row
    gf_step = (gf_fwd + 11 * (gf_attn_bwd + gf_mlp_bwd)
               + gf_mlp_bwd * 8 / S + gf_cls_bwd + gf_patch_bwd)
    u8t = bench.stage_input(bt, 224 * 224 * 3)
    rate = bench.train_bench(model, variables, [u8t])[0]
    row(f"train step bs{bt} (fwd+bwd+adamw)", bt / rate * 1e3, gf_step)
    print(f"train throughput: {rate:.1f} img/s   speed-of-light: "
          f"{bt / (gf_step / PEAK_TFS) * 1e3:.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
