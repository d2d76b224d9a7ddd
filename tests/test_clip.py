"""CLIP stack tests: tokenizer parity, flash attention, architecture parity
with the reference's vendored torch CLIP via the weight porter."""

import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uml_tpu.models.tokenizer import ClipTokenizer, tokenize
from uml_tpu.ops.attention import flash_attention, mha_reference, multi_head_attention

REFERENCE = "/root/reference/vision_language"


# --------------------------------------------------------------------------
# tokenizer
# --------------------------------------------------------------------------

TEXTS = [
    "a photo of a cat.",
    "A bad photo of the Boeing 737-800, an aircraft!",
    "itap of a {} texture &amp; pattern",
    "the 2012 Tesla Model S sedan",
    "pelican crossing...   weird  spacing\tand\nnewlines",
    "naïve café résumé — em-dash",
    "ImageNet-R(endition) robustness 100%",
    "don't can't won't it's we're I'll I'd I've I'm",
]


def test_tokenize_shape_and_framing():
    toks = tokenize(["a photo of a dog.", "hello world"])
    assert toks.shape == (2, 77) and toks.dtype == np.int32
    tk = ClipTokenizer()
    assert toks[0, 0] == tk.sot_token
    # EOT is the max id in each row (the pooling contract)
    assert (toks.argmax(-1) == [7, 3]).all()
    assert toks[0, toks[0].argmax()] == tk.eot_token


def test_tokenize_truncation():
    long = "x " * 200
    with pytest.raises(RuntimeError):
        tokenize(long)
    toks = tokenize(long, truncate=True)
    tk = ClipTokenizer()
    assert toks.shape == (1, 77) and toks[0, -1] == tk.eot_token


def test_tokenizer_roundtrip():
    tk = ClipTokenizer()
    assert tk.decode(tk.encode("a photo of a cat.")).strip() == "a photo of a cat ."


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_tokenizer_parity_with_reference():
    inject_stub = "ftfy" not in sys.modules
    if inject_stub:
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda t: t
        sys.modules["ftfy"] = ftfy
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_tok", f"{REFERENCE}/engine/clip/simple_tokenizer.py"
        )
        ref_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_mod)
        ref = ref_mod.SimpleTokenizer()
    finally:
        if inject_stub:
            # a spec-less stub poisons transformers' importlib probing later
            sys.modules.pop("ftfy", None)
    ours = ClipTokenizer()
    assert len(ref.encoder) == len(ours.encoder) == 49408
    for t in TEXTS:
        assert ref.encode(t) == ours.encode(t), t


# --------------------------------------------------------------------------
# flash attention
# --------------------------------------------------------------------------


@pytest.mark.parametrize("shape,causal", [
    ((1, 2, 77, 64), True),
    ((2, 2, 50, 64), False),
    ((1, 1, 130, 64), True),   # non-multiple of block -> padding path
])
def test_flash_attention_matches_reference(shape, causal):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3))
    out_p = flash_attention(q, k, v, causal=causal)
    out_r = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), atol=2e-5)


@pytest.mark.heavy
def test_attention_grad_path():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 64, 64)), jnp.float32)
    g_pallas = jax.grad(
        lambda q: multi_head_attention(q, q, q, causal=True, impl="pallas").sum()
    )(q)
    g_ref = jax.grad(lambda q: mha_reference(q, q, q, causal=True).sum())(q)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref), atol=1e-5)


def test_causal_masking_is_real():
    # output at position t must not depend on future keys
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 1, 8, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, 8, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, 8, 64)), jnp.float32)
    base = mha_reference(q, k, v, causal=True)
    k2 = k.at[:, :, 5:, :].set(99.0)
    v2 = v.at[:, :, 5:, :].set(99.0)
    out = mha_reference(q, k2, v2, causal=True)
    np.testing.assert_allclose(np.asarray(base[:, :, :5]), np.asarray(out[:, :, :5]),
                               atol=1e-6)


# --------------------------------------------------------------------------
# CLIP architecture parity (ported weights vs reference torch CLIP)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_clip_pair():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "ref_clip_model", f"{REFERENCE}/engine/clip/model.py"
    )
    ref_model = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_model)
    torch.manual_seed(0)
    ref = ref_model.CLIP(64, 32, 2, 128, 16, 77, 49408, 128, 2, 2).float().eval()

    from uml_tpu.models.clip import CLIP
    from uml_tpu.models.port_torch import config_from_state_dict, port_clip_state_dict

    sd = ref.state_dict()
    variables = port_clip_state_dict(sd)
    model = CLIP(config_from_state_dict(sd), attn_impl="reference")
    return ref, model, variables


def test_clip_image_parity(ref_clip_pair):
    torch = pytest.importorskip("torch")
    ref, model, variables = ref_clip_pair
    imgs = np.random.default_rng(0).standard_normal((3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        expected = ref.encode_image(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
        expected_tok = ref.encode_image(
            torch.from_numpy(imgs).permute(0, 3, 1, 2), return_tokens=True
        ).numpy()
    got = model.apply(variables, jnp.asarray(imgs), method=lambda m, x: m.encode_image(x))
    got_tok = model.apply(
        variables, jnp.asarray(imgs),
        method=lambda m, x: m.encode_image(x, return_tokens=True),
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_tok), expected_tok, atol=1e-4)


def test_clip_text_parity(ref_clip_pair):
    torch = pytest.importorskip("torch")
    ref, model, variables = ref_clip_pair
    toks = tokenize(TEXTS[:4])
    with torch.no_grad():
        expected, ref_eot = ref.encode_text(
            torch.from_numpy(toks.astype(np.int64)), return_eot=True
        )
    got, got_eot = model.apply(
        variables, jnp.asarray(toks),
        method=lambda m, t: m.encode_text(t, return_eot=True),
    )
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_eot), ref_eot.numpy())


@pytest.mark.heavy
def test_clip_contrastive_forward(ref_clip_pair):
    torch = pytest.importorskip("torch")
    ref, model, variables = ref_clip_pair
    imgs = np.random.default_rng(1).standard_normal((3, 32, 32, 3)).astype(np.float32)
    toks = tokenize(TEXTS[:3])
    with torch.no_grad():
        e_li, e_lt = ref(torch.from_numpy(imgs).permute(0, 3, 1, 2),
                         torch.from_numpy(toks.astype(np.int64)))
    g_li, g_lt = model.apply(variables, jnp.asarray(imgs), jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(g_li), e_li.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_lt), e_lt.numpy(), atol=1e-3)


def test_build_clip_names():
    from uml_tpu.models.clip import build_clip

    m = build_clip("ViT-B/16")
    assert m.config.vision_patch_size == 16 and m.config.embed_dim == 512
    rn = build_clip("RN50")  # ModifiedResNet variant (tested in test_clip_resnet)
    assert rn.embed_dim == 1024
    with pytest.raises(ValueError):
        build_clip("ViT-H/99")


@pytest.mark.fast
def test_clip_sha256_verification(tmp_path, monkeypatch):
    """Local-checkpoint integrity check (reference downloads by
    SHA256-addressed URL and verifies the digest, engine/clip/clip.py:
    29-39,65; zero-egress moves the check to load time)."""
    import hashlib

    from uml_tpu.models.encoders import verify_clip_sha256

    p = tmp_path / "ViT-B-16.pt"
    p.write_bytes(b"not the real checkpoint")
    with pytest.raises(RuntimeError, match="SHA256"):
        verify_clip_sha256("ViT-B/16", str(p))
    # opt-out for deliberately patched checkpoints
    monkeypatch.setenv("UML_CLIP_VERIFY_SHA", "0")
    verify_clip_sha256("ViT-B/16", str(p))
    monkeypatch.delenv("UML_CLIP_VERIFY_SHA")
    # unknown names have no digest to check
    verify_clip_sha256("ViT-NOT-A-MODEL/1", str(p))
    # a file matching its digest passes
    from uml_tpu.models import encoders

    digest = hashlib.sha256(p.read_bytes()).hexdigest()
    monkeypatch.setitem(encoders.CLIP_SHA256, "ViT-B/16", digest)
    verify_clip_sha256("ViT-B/16", str(p))
