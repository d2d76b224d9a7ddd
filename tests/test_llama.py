"""LLaMA-architecture text encoder: HF parity + tensor parallelism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uml_tpu.models.llama import (
    LLAMA_TP_RULES,
    LlamaConfig,
    LlamaEncoder,
    port_hf_llama,
)

TINY = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=112,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=2)


def _tokens(rng, b=3, s=11, vocab=128):
    ids = rng.integers(1, vocab, (b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[1, 7:] = 0   # padded row
    ids[1, 7:] = 0
    return ids, mask


@pytest.mark.heavy
def test_matches_hf_torch():
    """Port a tiny random HF LlamaModel; hidden states must match."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaModel

    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, attn_implementation="eager")
    torch.manual_seed(0)
    hf = LlamaModel(hf_cfg).eval()

    cfg = LlamaConfig.from_hf(hf_cfg)
    model = LlamaEncoder(cfg)
    params = port_hf_llama(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids, mask = _tokens(rng)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids).long(),
                  attention_mask=torch.from_numpy(mask).long()
                  ).last_hidden_state.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(ids),
                                 jnp.asarray(mask)))
    # padded positions: HF computes garbage there, we don't pool them
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], atol=2e-4, rtol=2e-4)


def test_tp_sharded_matches_unsharded():
    """TP over the 'model' axis: identical pooled embeddings (VERDICT #6)."""
    from uml_tpu.core.meshes import create_mesh
    from uml_tpu.parallel import apply_tp_sharding

    model = LlamaEncoder(TINY)
    rng = np.random.default_rng(1)
    ids, mask = _tokens(rng)
    params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(ids),
                                 jnp.asarray(mask))

    def pooled(p, ids, mask):
        hidden = model.apply(p, ids, mask)
        m = mask[..., None].astype(hidden.dtype)
        return (hidden * m).sum(1) / m.sum(1)

    base = jax.jit(pooled)(params, jnp.asarray(ids), jnp.asarray(mask))

    mesh = create_mesh(n_data=2, n_model=4)
    sharded = apply_tp_sharding(params, mesh, rules=LLAMA_TP_RULES)
    # verify the rules actually shard the block matmuls over 'model'
    q_sh = sharded["params"]["layers_0"]["q_proj"]["kernel"].sharding
    dn_sh = sharded["params"]["layers_0"]["down_proj"]["kernel"].sharding
    assert "model" in str(q_sh.spec) and "model" in str(dn_sh.spec)
    with mesh:
        tp = jax.jit(pooled)(sharded, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(base), np.asarray(tp),
                               atol=1e-5, rtol=1e-5)


def _save_tiny_llama(d, hidden_size=32, heads=4):
    """Save a tiny random HF LlamaModel + word-level tokenizer to ``d``
    (the dir name must contain 'llama' so TextModel picks the native
    backend)."""
    import torch
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaModel, PreTrainedTokenizerFast

    hf_cfg = HFConfig(
        vocab_size=64, hidden_size=hidden_size,
        intermediate_size=hidden_size * 2 - 8,
        num_hidden_layers=2, num_attention_heads=heads,
        num_key_value_heads=heads,
        max_position_embeddings=64, attn_implementation="eager")
    torch.manual_seed(1)
    LlamaModel(hf_cfg).save_pretrained(d)

    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i, w in enumerate(["a", "photo", "of", "cat", "dog", "the"]):
        vocab[w] = 3 + i
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>").save_pretrained(d)


@pytest.mark.heavy
def test_textmodel_native_backend_matches_torch(tmp_path):
    """TextModel 'native' backend (in-house LlamaEncoder) pools identically
    to the HF torch backend on a locally-saved tiny checkpoint."""
    pytest.importorskip("torch")

    d = str(tmp_path / "tiny-llama")
    _save_tiny_llama(d)

    from uml_tpu.models.languagemodel import TextModel

    texts = ["a photo of cat", "the dog"]
    native = TextModel(d, backend="native")
    assert native.backend == "native"
    feats_native, idx = native.encode(texts)

    ref = TextModel(d, backend="torch")
    feats_torch, _ = ref.encode(texts)
    np.testing.assert_allclose(feats_native, feats_torch,
                               atol=2e-4, rtol=2e-4)
    assert feats_native.shape == (2, 32)


def test_features_cli_text_tp_matches_unsharded(tmp_path):
    """The features CLI's text path (VERDICT r2 #4): a llama-family LM
    constructed by _HFEncoderAdapter receives the mesh, runs the native
    backend tensor-parallel over the 'model' axis, and produces the same
    per-class template features as the unsharded run."""
    pytest.importorskip("torch")
    from uml_tpu.cli.features import _HFEncoderAdapter, text_features
    from uml_tpu.core.meshes import create_mesh

    d = str(tmp_path / "tiny-llama")
    _save_tiny_llama(d)

    lab2cname = {0: "cat", 1: "dog"}
    base = _HFEncoderAdapter(language_model=d)
    want = text_features(base, "caltech101", lab2cname, "vanilla")

    mesh = create_mesh(n_data=2, n_model=4)
    tp = _HFEncoderAdapter(language_model=d, mesh=mesh)
    assert tp.text_model.backend == "native"
    assert tp.text_model.mesh is mesh
    q_sh = tp.text_model._params["params"]["layers_0"]["q_proj"][
        "kernel"].sharding
    assert "model" in str(q_sh.spec)
    got = text_features(tp, "caltech101", lab2cname, "vanilla")

    np.testing.assert_allclose(got["features"], want["features"],
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_array_equal(got["labels"], want["labels"])
    np.testing.assert_array_equal(got["eot_indices"], want["eot_indices"])


def test_features_cli_mixed_quant_maps_to_weight_only_text(tmp_path):
    """Every CLI --quant int8* mode reaching the HF text path maps to the
    weight-only int8 text quantization (the only LLM quant scheme); the
    CLIP-specific mixed modes must not crash the text encoder."""
    pytest.importorskip("torch")
    from uml_tpu.cli.features import _HFEncoderAdapter

    d = str(tmp_path / "tiny-llama")
    _save_tiny_llama(d)
    enc = _HFEncoderAdapter(language_model=d, quant="int8_qkv")
    assert enc.text_model.quant == "int8_w"
    enc_none = _HFEncoderAdapter(language_model=d, quant="none")
    assert enc_none.text_model.quant == "none"


def test_gqa_repeat_and_padding_invariance():
    model = LlamaEncoder(TINY)
    rng = np.random.default_rng(2)
    ids, mask = _tokens(rng)
    params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(ids),
                                 jnp.asarray(mask))
    out = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    # mutate padded tokens: valid positions must not change
    ids2 = ids.copy()
    ids2[1, 7:] = 5
    out2 = model.apply(params, jnp.asarray(ids2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out[1, :7]), np.asarray(out2[1, :7]),
                               atol=1e-5)


@pytest.mark.heavy
def test_int8w_close_to_float_and_halves_weight_bytes():
    """Weight-only int8 (Q8Dense + quantize_llama_params): pooled
    embeddings stay ~1e-3-cosine of the float model, and projection
    weight bytes halve — the property that puts OpenLLaMA-13B on ONE
    16 GB v5e chip instead of 2-chip TP."""
    from uml_tpu.models.llama import quantize_llama_params

    model = LlamaEncoder(TINY)
    model_q = LlamaEncoder(TINY, quant="int8_w")
    rng = np.random.default_rng(2)
    ids, mask = _tokens(rng)
    params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(ids),
                                 jnp.asarray(mask))
    qparams = quantize_llama_params(params)

    def pooled(m, p):
        hidden = m.apply(p, jnp.asarray(ids), jnp.asarray(mask))
        w = jnp.asarray(mask)[..., None].astype(hidden.dtype)
        return np.asarray((hidden * w).sum(1) / w.sum(1))

    f = pooled(model, params)
    q = pooled(model_q, qparams)
    cos = np.sum(f * q, -1) / (np.linalg.norm(f, axis=-1)
                               * np.linalg.norm(q, axis=-1))
    assert np.min(cos) > 0.995

    def proj_bytes(tree):
        total = 0
        for lname, layer in tree["params"].items():
            if not lname.startswith("layers_"):
                continue
            for mod in layer.values():
                for leaf in (mod.values() if isinstance(mod, dict) else []):
                    total += leaf.size * leaf.dtype.itemsize
        return total

    fb, qb = proj_bytes(params), proj_bytes(qparams)
    assert qb < 0.27 * fb  # fp32 kernels -> int8 + tiny scales

    # random init of the quant model produces the same param STRUCTURE
    # (so checkpointing / sharding trees line up)
    init_q = jax.jit(model_q.init)(jax.random.key(0), jnp.asarray(ids),
                                   jnp.asarray(mask))
    assert (jax.tree_util.tree_structure(init_q)
            == jax.tree_util.tree_structure(qparams))


@pytest.mark.heavy
def test_int8w_tp_sharded_matches_unsharded():
    """The TP rules shard kernel_q8 like kernel and col-scales like
    col-biases; sharded == unsharded through the quantized forward."""
    from uml_tpu.core.meshes import create_mesh
    from uml_tpu.models.llama import quantize_llama_params
    from uml_tpu.parallel import apply_tp_sharding

    model = LlamaEncoder(TINY)
    model_q = LlamaEncoder(TINY, quant="int8_w")
    rng = np.random.default_rng(3)
    ids, mask = _tokens(rng)
    params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(ids),
                                 jnp.asarray(mask))
    qparams = quantize_llama_params(params)

    def pooled(p, ids, mask):
        hidden = model_q.apply(p, ids, mask)
        m = mask[..., None].astype(hidden.dtype)
        return (hidden * m).sum(1) / m.sum(1)

    base = jax.jit(pooled)(qparams, jnp.asarray(ids), jnp.asarray(mask))

    mesh = create_mesh(n_data=2, n_model=4)
    sharded = apply_tp_sharding(qparams, mesh, rules=LLAMA_TP_RULES)
    q_mod = sharded["params"]["layers_0"]["q_proj"]
    dn_mod = sharded["params"]["layers_0"]["down_proj"]
    assert "model" in str(q_mod["kernel_q8"].sharding.spec)
    assert "model" in str(q_mod["scale"].sharding.spec)      # col: split
    assert "model" in str(dn_mod["kernel_q8"].sharding.spec)
    assert "model" not in str(dn_mod["scale"].sharding.spec)  # row: repl
    with mesh:
        tp = jax.jit(pooled)(sharded, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(base), np.asarray(tp),
                               atol=1e-5, rtol=1e-5)


def test_textmodel_int8w_close_to_float(tmp_path):
    """TextModel(quant='int8_w') loads the native backend with quantized
    projections (the --quant int8 features-CLI path for llama-family
    LMs) and pools within ~1e-3 cosine of the float native backend."""
    pytest.importorskip("torch")

    d = str(tmp_path / "tiny-llama")
    _save_tiny_llama(d)

    from uml_tpu.models.languagemodel import TextModel

    texts = ["a photo of cat", "the dog", "a photo of the dog"]
    base = TextModel(d, backend="native")
    f, _ = base.encode(texts)
    q8 = TextModel(d, backend="native", quant="int8_w")
    assert q8.backend == "native"
    qp = q8._params["params"]["layers_0"]["q_proj"]
    assert "kernel_q8" in qp and qp["kernel_q8"].dtype == jnp.int8
    q, _ = q8.encode(texts)
    cos = np.sum(f * q, -1) / (np.linalg.norm(f, axis=-1)
                               * np.linalg.norm(q, axis=-1))
    assert np.min(cos) > 0.995
