"""Whole-tower W8A8 kernel (ops.tower_q8): interpret-mode kernel vs the
jnp twin, twin vs the composed per-layer int8 path, and the model-level
collect/fold/quantize wiring.

The oracle chain: tower_q8_reference must reproduce the per-layer
simulated-int8 references (ops.quant.ln_attn_block_q8_reference +
ln_mlp_block_q8_reference) composed over layers — including the bf16
residual round-trips the per-layer path pays through HBM — and the
Pallas kernel (interpret mode) must match the twin."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uml_tpu.ops.quant import (
    ln_attn_block_q8_reference,
    ln_mlp_block_q8_reference,
    quantize_weight,
)
from uml_tpu.ops.fused_attention import fold_ln_into_matmul
from uml_tpu.ops.tower_q8 import (
    supports_tower_q8,
    tower_q8,
    tower_q8_reference,
)

pytestmark = pytest.mark.fast

B, S, K, HEADS, M, LAYERS = 4, 24, 128, 2, 512, 3


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def _layers(rng):
    """Per-layer raw params (the shapes ResidualAttentionBlock owns)."""
    out = []
    for _ in range(LAYERS):
        out.append(dict(
            scale=jnp.asarray(1 + 0.1 * rng.standard_normal(K), jnp.float32),
            bias=jnp.asarray(0.05 * rng.standard_normal(K), jnp.float32),
            w=jnp.asarray(rng.standard_normal((K, 3 * K)) * K**-0.5,
                          jnp.float32),
            kb=jnp.asarray(0.02 * rng.standard_normal(3 * K), jnp.float32),
            wo=jnp.asarray(rng.standard_normal((K, K)) * K**-0.5,
                           jnp.bfloat16),
            bo=jnp.asarray(0.02 * rng.standard_normal(K), jnp.float32),
            scale2=jnp.asarray(1 + 0.1 * rng.standard_normal(K), jnp.float32),
            bias2=jnp.asarray(0.05 * rng.standard_normal(K), jnp.float32),
            w1=jnp.asarray(rng.standard_normal((K, M)) * K**-0.5,
                           jnp.float32),
            b1=jnp.asarray(0.02 * rng.standard_normal(M), jnp.float32),
            w2=jnp.asarray(rng.standard_normal((M, K)) * M**-0.5,
                           jnp.bfloat16),
            b2=jnp.asarray(0.02 * rng.standard_normal(K), jnp.float32),
        ))
    return out


def _stack_q8(layers):
    """The model's collect path: fold fp32, quantize, stack per layer."""
    q8 = []
    for p in layers:
        w_eff, b_eff = fold_ln_into_matmul(p["scale"], p["bias"],
                                           p["w"], p["kb"])
        w1_eff, b1_eff = fold_ln_into_matmul(p["scale2"], p["bias2"],
                                             p["w1"], p["b1"])
        wq, wsc = quantize_weight(w_eff)
        woq, wosc = quantize_weight(p["wo"])
        w1q, w1sc = quantize_weight(w1_eff)
        w2q, w2sc = quantize_weight(p["w2"])
        q8.append((wq, wsc, b_eff, woq, wosc, bo_ := p["bo"],
                   w1q, w1sc, b1_eff, w2q, w2sc, p["b2"]))
    return [jnp.stack(t) for t in zip(*q8)]


def test_twin_matches_composed_per_layer_references():
    """tower_q8_reference == the per-layer simulated-int8 chain."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, K)) * 0.5, jnp.bfloat16)
    layers = _layers(rng)

    ref = x
    for p in layers:
        ref = ln_attn_block_q8_reference(
            ref, p["scale"], p["bias"], p["w"], p["kb"], p["wo"], p["bo"],
            heads=HEADS, causal=False)
        ref = ln_mlp_block_q8_reference(
            ref, p["scale2"], p["bias2"], p["w1"], p["b1"], p["w2"], p["b2"],
            activation="quick_gelu")

    tower = tower_q8_reference(x, *_stack_q8(layers), heads=HEADS)
    # the chains compute the same integer math, but compilation mode
    # alone (eager vs jit/scan) changes fp32 contraction enough to flip
    # occasional quantization integers — measured: a JITTED per-layer
    # reference agrees with its own EAGER run on only ~16% of bf16
    # outputs while rel err stays ~1e-2.  Cross-mode comparisons are
    # therefore tolerance-based, the same 2e-2 the per-layer q8
    # kernel-vs-reference tests use.
    assert _rel(tower, ref) < 2e-2, _rel(tower, ref)


def test_kernel_interpret_matches_twin():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, S, K)) * 0.5, jnp.bfloat16)
    stacked = _stack_q8(_layers(rng))
    twin = tower_q8_reference(x, *stacked, heads=HEADS)
    kern = tower_q8(x, *stacked, heads=HEADS, impl="pallas")
    assert _rel(kern, twin) < 2e-2, _rel(kern, twin)


def test_kernel_interpret_g_grouping():
    os.environ["UML_TOWER_Q8_G"] = "2"
    try:
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((B, S, K)) * 0.5, jnp.bfloat16)
        stacked = _stack_q8(_layers(rng))
        twin = tower_q8_reference(x, *stacked, heads=HEADS)
        kern = tower_q8(x, *stacked, heads=HEADS, impl="pallas")
        assert _rel(kern, twin) < 2e-2
    finally:
        os.environ.pop("UML_TOWER_Q8_G", None)


def test_supports_gate():
    assert supports_tower_q8(768, 12, 64, 197, 3072)     # ViT-B/16
    assert not supports_tower_q8(768, 12, 32, 197, 3072)  # head_dim != 64
    assert not supports_tower_q8(760, 12, 64, 197, 3072)  # lane-misaligned


def test_model_tower_matches_per_layer_int8():
    """build_clip(quant='int8') with the tower forced ON equals the
    per-layer int8 path (both reference impls on CPU): validates the
    collect/fold/quantize wiring end to end, incl. the final bf16
    cls_only block."""
    from uml_tpu.models.clip import build_clip

    toks = jnp.zeros((2, 77), jnp.int32)
    pix = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 224, 224, 3)), jnp.float32)
    model = build_clip("ViT-B/16", dtype=jnp.bfloat16, quant="int8")
    variables = jax.jit(model.init)(jax.random.key(0), pix[:1], toks[:1])

    def encode(v, p):
        return model.apply(v, p, method=lambda m, px: m.encode_image(px))

    os.environ["UML_TOWER_Q8"] = "0"
    try:
        base = encode(variables, pix)
    finally:
        os.environ["UML_TOWER_Q8"] = "1"
    try:
        towered = encode(variables, pix)
    finally:
        os.environ.pop("UML_TOWER_Q8", None)
    assert _rel(towered, base) < 2e-2, _rel(towered, base)
