"""Int8 (W8A8) serving kernels: quantization math, kernel-vs-reference
agreement (interpret mode), and full-model feature fidelity vs bf16.

The reference has no quantized path (fp16 CUDA via torch,
engine/clip/model.py:381-402); ops.quant is net-new serving capability, so
the oracle is this framework's own bf16 math plus the simulated-int8 jnp
twins (which share the exact quantize -> int dot -> dequant recipe with
the Pallas kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uml_tpu.ops.fused_attention import ln_attn_block_reference
from uml_tpu.ops.ln_matmul import mlp_block_reference
from uml_tpu.ops.quant import (
    _quantize_rows,
    ln_attn_block_q8,
    ln_attn_block_q8_reference,
    ln_mlp_block_q8,
    ln_mlp_block_q8_reference,
    quantize_weight,
)


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def _cos(a, b):
    a = np.asarray(a, np.float64).reshape(a.shape[0], -1)
    b = np.asarray(b, np.float64).reshape(b.shape[0], -1)
    num = np.sum(a * b, -1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
    return float(np.min(num / den))


def _attn_setup(rng, b=2, s=24, k=256, heads=4):
    x = jnp.asarray(rng.standard_normal((b, s, k)) * 0.5, jnp.bfloat16)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(k), jnp.float32)
    bias = jnp.asarray(0.05 * rng.standard_normal(k), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, 3 * k)) * k**-0.5, jnp.float32)
    kb = jnp.asarray(0.02 * rng.standard_normal(3 * k), jnp.float32)
    wo = jnp.asarray(rng.standard_normal((k, k)) * k**-0.5, jnp.bfloat16)
    bo = jnp.asarray(0.02 * rng.standard_normal(k), jnp.float32)
    return x, scale, bias, w, kb, wo, bo


def test_quantize_weight_roundtrip():
    """Symmetric per-channel quant: the per-column absmax element maps to
    exactly +-127, and dequantized values sit within half a step."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8
    qn = np.asarray(q, np.int32)
    assert np.max(np.abs(qn)) == 127
    deq = qn * np.asarray(s)[None, :]
    np.testing.assert_allclose(deq, np.asarray(w), atol=float(np.max(s)) / 2)
    # column scale = column absmax / 127
    np.testing.assert_allclose(np.asarray(s) * 127.0,
                               np.max(np.abs(np.asarray(w)), axis=0),
                               rtol=1e-6)


def test_quantize_rows_zero_row_is_safe():
    x = jnp.zeros((4, 16), jnp.float32)
    q, s = _quantize_rows(x)
    assert np.all(np.asarray(q) == 0)
    assert np.all(np.isfinite(np.asarray(s)))


@pytest.mark.heavy
@pytest.mark.parametrize("causal", [False, True])
def test_attn_q8_kernel_matches_q8_reference(causal):
    """Pallas kernel (interpret) vs the simulated-int8 jnp twin.  Not
    bit-identical (the kernel applies the QKV bias via the softmax-
    invariant trickery of _pair_attention; the twin adds it to qkv), so
    the tolerance is the documented bf16 attention-path agreement."""
    rng = np.random.default_rng(1)
    x, scale, bias, w, kb, wo, bo = _attn_setup(rng)
    got = ln_attn_block_q8(x, scale, bias, w, kb, wo, bo, heads=4,
                           causal=causal, impl="pallas")
    want = ln_attn_block_q8_reference(x, scale, bias, w, kb, wo, bo,
                                      heads=4, causal=causal)
    assert _rel(got, want) < 3e-2
    assert _cos(got, want) > 0.999


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.heavy
def test_attn_q8qkv_kernel_matches_q8qkv_reference(causal):
    """qkv-only variant (q8_out=False): Pallas kernel (interpret) vs its
    simulated-int8 twin (int8 QKV dot, bf16 out-projection)."""
    from uml_tpu.ops.quant import ln_attn_block_q8qkv_reference

    rng = np.random.default_rng(3)
    x, scale, bias, w, kb, wo, bo = _attn_setup(rng)
    got = ln_attn_block_q8(x, scale, bias, w, kb, wo, bo, heads=4,
                           causal=causal, impl="pallas", q8_out=False)
    want = ln_attn_block_q8qkv_reference(x, scale, bias, w, kb, wo, bo,
                                         heads=4, causal=causal)
    assert _rel(got, want) < 3e-2
    assert _cos(got, want) > 0.999


def test_attn_q8qkv_closer_to_bf16_than_full_q8():
    """Quantizing a strict subset of the projections (QKV only) must
    track the bf16 block at least as closely as the full int8 block."""
    rng = np.random.default_rng(4)
    x, scale, bias, w, kb, wo, bo = _attn_setup(rng)
    f = ln_attn_block_reference(x, scale, bias, w.astype(jnp.bfloat16), kb,
                                wo, bo, heads=4)
    full = _cos(ln_attn_block_q8(x, scale, bias, w, kb, wo, bo, heads=4), f)
    qkv = _cos(ln_attn_block_q8(x, scale, bias, w, kb, wo, bo, heads=4,
                                q8_out=False), f)
    assert qkv > 0.998
    assert qkv >= full - 1e-3


def test_attn_q8_close_to_bf16():
    rng = np.random.default_rng(2)
    x, scale, bias, w, kb, wo, bo = _attn_setup(rng)
    f = ln_attn_block_reference(x, scale, bias, w.astype(jnp.bfloat16), kb,
                                wo, bo, heads=4)
    q = ln_attn_block_q8(x, scale, bias, w, kb, wo, bo, heads=4)
    assert _cos(q, f) > 0.998


@pytest.mark.heavy
@pytest.mark.parametrize("activation", [None, "quick_gelu", "gelu_exact"])
def test_mlp_q8_kernel_matches_q8_reference(activation):
    rng = np.random.default_rng(3)
    k = 256
    x = jnp.asarray(rng.standard_normal((2, 24, k)) * 0.5, jnp.bfloat16)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(k), jnp.float32)
    bias = jnp.asarray(0.05 * rng.standard_normal(k), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((k, 4 * k)) * k**-0.5, jnp.float32)
    b1 = jnp.asarray(0.02 * rng.standard_normal(4 * k), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((4 * k, k)) * (4 * k)**-0.5,
                     jnp.bfloat16)
    b2 = jnp.asarray(0.02 * rng.standard_normal(k), jnp.float32)
    got = ln_mlp_block_q8(x, scale, bias, w1, b1, w2, b2,
                          activation=activation, impl="pallas")
    want = ln_mlp_block_q8_reference(x, scale, bias, w1, b1, w2, b2,
                                     activation=activation)
    # gelu_exact: the kernel's sigmoid-form GELU vs the twin's XLA erf
    # differ by <=7.8e-5 absolute on the hidden, within the int8 noise
    assert _rel(got, want) < 2e-2
    f = mlp_block_reference(x, scale, bias, w1.astype(jnp.bfloat16), b1,
                            w2, b2, activation=activation)
    assert _cos(got, f) > 0.998


@pytest.mark.heavy
def test_clip_int8_feature_fidelity():
    """Full CLIP with quant='int8' (every non-final block W8A8) stays
    within ~1e-3 cosine of the bf16 model on both towers."""
    from uml_tpu.models.clip import CLIP, ClipConfig

    cfg = ClipConfig(64, 32, 3, 128, 8, context_length=16, vocab_size=64,
                     transformer_width=128, transformer_heads=2,
                     transformer_layers=2)
    m_f = CLIP(cfg, dtype=jnp.bfloat16)
    m_q = CLIP(cfg, dtype=jnp.bfloat16, quant="int8")
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    tok = jnp.asarray(rng.integers(1, 63, (4, 16)), jnp.int32)
    v = m_f.init(jax.random.key(0), px, tok)

    f_img = m_f.apply(v, px, method=lambda m, p: m.encode_image(p))
    q_img = m_q.apply(v, px, method=lambda m, p: m.encode_image(p))
    assert q_img.shape == f_img.shape
    assert _cos(q_img, f_img) > 0.995

    f_txt = m_f.apply(v, tok, method=lambda m, t: m.encode_text(t))
    q_txt = m_q.apply(v, tok, method=lambda m, t: m.encode_text(t))
    assert _cos(q_txt, f_txt) > 0.995

    u8 = jnp.asarray(rng.integers(0, 256, (4, 32 * 32 * 3), dtype=np.uint8))
    f_u8 = m_f.apply(v, u8, method=lambda m, x: m.encode_image_u8(x))
    q_u8 = m_q.apply(v, u8, method=lambda m, x: m.encode_image_u8(x))
    assert _cos(q_u8, f_u8) > 0.995


@pytest.mark.heavy
def test_dino_int8_feature_fidelity():
    """DinoViT with quant='int8' (layerscale folded before quantization)
    stays within ~1e-3 cosine of the bf16 tower."""
    from uml_tpu.models.dino import DinoConfig, DinoViT

    cfg = DinoConfig(hidden_size=128, num_layers=2, num_heads=2,
                     mlp_ratio=4, image_size=32, patch_size=8,
                     layerscale=True)
    m_f = DinoViT(cfg, dtype=jnp.bfloat16)
    m_q = DinoViT(cfg, dtype=jnp.bfloat16, quant="int8")
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    v = m_f.init(jax.random.key(0), px)
    f = m_f.apply(v, px)
    q = m_q.apply(v, px)
    assert q.shape == f.shape
    assert _cos(q, f) > 0.995


@pytest.mark.heavy
def test_q8_noslab_matches_slab(monkeypatch):
    """UML_Q8_SLAB=0 (per-image int8 dots, the A/B fallback) must produce
    bit-identical outputs to the default slab path: the slab only batches
    rows through the same int dot, so quantize -> dot -> dequant is
    row-for-row the same math.  Env is read at trace time, so the jit
    caches are cleared between variants."""
    rng = np.random.default_rng(5)
    x, scale, bias, w, kb, wo, bo = _attn_setup(rng, b=4, s=28)
    w1 = jnp.asarray(rng.standard_normal((256, 1024)) * 256**-0.5,
                     jnp.float32)
    b1 = jnp.asarray(0.02 * rng.standard_normal(1024), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((1024, 256)) * 1024**-0.5,
                     jnp.bfloat16)
    b2 = jnp.asarray(0.02 * rng.standard_normal(256), jnp.float32)

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("UML_Q8_SLAB", flag)
        jax.clear_caches()
        attn = ln_attn_block_q8(x, scale, bias, w, kb, wo, bo, heads=4,
                                impl="pallas")
        mlp = ln_mlp_block_q8(x, scale, bias, w1, b1, w2, b2,
                              activation="quick_gelu", impl="pallas")
        outs[flag] = (np.asarray(attn), np.asarray(mlp))
    np.testing.assert_array_equal(outs["0"][0], outs["1"][0])
    np.testing.assert_array_equal(outs["0"][1], outs["1"][1])


@pytest.mark.heavy
def test_clip_encoder_quant_api():
    """ClipEncoder(quant='int8') runs the extraction API end to end."""
    from uml_tpu.models.encoders import ClipEncoder

    enc = ClipEncoder("ViT-B/32", allow_random_init=True, quant="int8")
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 224, 224, 3), dtype=np.uint8)
    feats = enc.encode_images(imgs)
    assert feats.shape == (2, 512)
    assert np.all(np.isfinite(feats))
    txt, eot = enc.encode_texts(["a photo of a cat.", "a photo of a dog."])
    assert txt.shape == (2, 512)
    assert np.all(np.isfinite(txt))

@pytest.mark.heavy
def test_clip_mixed_quant_modes():
    """quant='int8_mlp'/'int8_attn' (one half-block family W8A8, the
    other bf16 — tools/exp_q8_mix.py's mixed serving modes) produce
    features at least as close to bf16 as the full int8 mode, since they
    quantize a strict subset of its projections."""
    from uml_tpu.models.clip import CLIP, ClipConfig

    cfg = ClipConfig(64, 32, 3, 128, 8, context_length=16, vocab_size=64,
                     transformer_width=128, transformer_heads=2,
                     transformer_layers=2)
    rng = np.random.default_rng(7)
    px = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    m_f = CLIP(cfg, dtype=jnp.bfloat16)
    v = m_f.init(jax.random.key(0), px,
                 jnp.asarray(rng.integers(1, 63, (4, 16)), jnp.int32))
    f = m_f.apply(v, px, method=lambda m, p: m.encode_image(p))

    def cos_for(quant):
        m = CLIP(cfg, dtype=jnp.bfloat16, quant=quant)
        q = m.apply(v, px, method=lambda m_, p: m_.encode_image(p))
        assert q.shape == f.shape
        return _cos(q, f)

    full = cos_for("int8")
    for mode in ("int8_mlp", "int8_attn", "int8_qkv"):
        c = cos_for(mode)
        assert c > 0.995
        assert c >= full - 1e-3, (mode, c, full)


def test_build_clip_rejects_unknown_quant():
    from uml_tpu.models.clip import build_clip

    with pytest.raises(ValueError, match="quant"):
        build_clip("ViT-B/16", quant="int4")


def test_quant_flag_accepts_all_serving_modes():
    """Every build_clip quant mode is reachable from the CLI --quant flag
    (the TP lesson from round 2: a mode that exists only on the library
    API is not a shipped capability)."""
    from uml_tpu.core.flags import build_shared_parser

    for mode in ("none", "int8", "int8_mlp", "int8_attn", "int8_qkv"):
        args = build_shared_parser().parse_args(["--quant", mode])
        assert args.quant == mode


def test_features_cli_rejects_mixed_quant_for_dino_early():
    """ADVICE r3: a DINO run with a CLIP-only mixed quant mode must fail
    at entry, not minutes later inside load_dino after dataset setup."""
    import pytest

    from uml_tpu.cli import features
    from uml_tpu.core.flags import build_shared_parser

    args = build_shared_parser().parse_args(
        ["--dataset", "caltech101", "--vision_model",
         "vit_base_patch14_dinov2.lvd142m", "--quant", "int8_qkv"])
    with pytest.raises(SystemExit, match="int8_qkv"):
        features.main(args)
