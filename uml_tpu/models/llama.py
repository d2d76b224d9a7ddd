"""LLaMA-architecture text encoder, TPU-native and tensor-parallel-ready.

The reference runs its large text encoders (OpenLLaMA-3B/7B/13B,
Mistral-7B, engine/models/languagemodel.py:10-62 + config LANGUAGE_MODELS)
through torch on a single GPU.  Here the decoder stack is implemented
in-house so the mesh 'model' axis reaches it: parameter names follow the
Megatron column/row convention used by uml_tpu.parallel.tensor_parallel
(q/k/v/gate/up column-parallel, o/down row-parallel), and the whole
forward is one jittable program over a (data, model) mesh.

Numerics match HF's LlamaModel exactly (see
tests/test_llama.py::test_matches_hf_torch): RMSNorm in fp32, half-split
rotary embeddings, grouped-query attention, SwiGLU MLP.  Mistral uses the
identical block (its sliding-window size far exceeds any reference
sequence length).

Weights load from a local HF checkpoint via ``port_hf_llama``
(zero-egress: TRANSFORMERS_OFFLINE honored by the caller).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from uml_tpu.ops.attention import mha_reference


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0

    @classmethod
    def from_hf(cls, hf_config) -> "LlamaConfig":
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            num_key_value_heads=getattr(hf_config, "num_key_value_heads",
                                        hf_config.num_attention_heads),
            rms_norm_eps=hf_config.rms_norm_eps,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        )


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        return (y * w).astype(x.dtype)


def _rope(q, k, positions, theta):
    """HF half-split rotary convention. q/k: [B, H, S, D]."""
    d = q.shape[-1]
    inv_freq = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    freqs = positions[:, None].astype(jnp.float32) * jnp.asarray(
        inv_freq, jnp.float32)[None, :]                       # [S, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)            # [S, D]
    cos = jnp.cos(emb)[None, None]
    sin = jnp.sin(emb)[None, None]

    def rot_half(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    return ((qf * cos + rot_half(qf) * sin).astype(q.dtype),
            (kf * cos + rot_half(kf) * sin).astype(k.dtype))


class Q8Dense(nn.Module):
    """Weight-only int8 Dense (no bias): ``kernel_q8`` int8 [in, out] +
    per-output-channel fp32 ``scale``, y = (x @ q) * scale.

    The scale rides the OUTPUT (exact: sum_k x_k q_km s_m == s_m sum_k
    x_k q_km), so the dequantized weight never materializes — the int8
    tensor is what lives in HBM, halving weight bytes vs bf16.  That is
    the capability win: OpenLLaMA-13B's ~26 GB of bf16 weights need
    2-chip tensor parallelism on 16 GB v5e chips; int8 (~13 GB) fits ONE
    chip (languagemodel.py:72-73 is the reference's single-GPU analog).

    Real checkpoints arrive via quantize_llama_params; the random init
    here (uniform int8 + a lecun-scaled constant) only serves smoke
    tests.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kq = self.param(
            "kernel_q8",
            lambda key: jax.random.randint(
                key, (in_features, self.features), -127, 128, jnp.int8))
        scale = self.param(
            "scale",
            lambda key: jnp.full((self.features,),
                                 3.0 / (127.0 * in_features**0.5),
                                 jnp.float32))
        y = jnp.dot(x.astype(self.dtype), kq.astype(self.dtype),
                    preferred_element_type=jnp.float32)
        return (y * scale[None, :]).astype(self.dtype)


_Q8_PROJS = ("q_proj", "k_proj", "v_proj", "o_proj",
             "gate_proj", "up_proj", "down_proj")


def quantize_llama_params(variables):
    """Ported bf16/fp32 LlamaEncoder params -> the Q8Dense layout:
    every projection's {kernel} becomes {kernel_q8 int8, scale f32}
    (symmetric per-output-channel, ops.quant.quantize_weight).  Embed
    and norms stay in float.  Use with LlamaEncoder(quant='int8_w')."""
    from uml_tpu.ops.quant import quantize_weight

    def walk(tree, name):
        if isinstance(tree, dict):
            if name in _Q8_PROJS and "kernel" in tree:
                q, s = quantize_weight(tree["kernel"])
                return {"kernel_q8": q, "scale": s}
            return {k: walk(v, k) for k, v in tree.items()}
        return tree

    return walk(variables, "")


class LlamaBlock(nn.Module):
    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x, mask, positions):
        cfg = self.config
        b, s, _ = x.shape
        h = cfg.num_attention_heads
        kvh = cfg.num_key_value_heads
        d = cfg.hidden_size // h

        if self.quant == "int8_w":
            def dense(features, name):
                return Q8Dense(features, dtype=self.dtype, name=name)
        else:
            def dense(features, name):
                return nn.Dense(features, use_bias=False, dtype=self.dtype,
                                name=name)

        y = RMSNorm(cfg.rms_norm_eps, name="input_norm")(x)
        q = dense(h * d, "q_proj")(y)
        k = dense(kvh * d, "k_proj")(y)
        v = dense(kvh * d, "v_proj")(y)
        q = q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, kvh, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, kvh, d).transpose(0, 2, 1, 3)
        q, k = _rope(q, k, positions, cfg.rope_theta)
        if kvh != h:  # grouped-query attention: repeat kv heads
            rep = h // kvh
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        attn = mha_reference(q, k, v, mask=mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        x = x + dense(cfg.hidden_size, "o_proj")(attn)

        y = RMSNorm(cfg.rms_norm_eps, name="post_attn_norm")(x)
        gate = dense(cfg.intermediate_size, "gate_proj")(y)
        up = dense(cfg.intermediate_size, "up_proj")(y)
        down = dense(cfg.hidden_size, "down_proj")(nn.silu(gate) * up)
        return x + down


class LlamaEncoder(nn.Module):
    """Decoder-only stack -> last hidden states (the text-encoder use).

    ``quant='int8_w'``: weight-only int8 projections (Q8Dense) — halves
    weight HBM so OpenLLaMA-13B fits a single 16 GB v5e chip; pair with
    quantize_llama_params on ported checkpoints."""

    config: LlamaConfig
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.config
        b, s = input_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                     dtype=self.dtype, name="embed_tokens")(input_ids)

        neg = jnp.float32(-1e30)
        causal = jnp.where(jnp.tril(jnp.ones((s, s), bool)), 0.0, neg)
        mask = causal[None, None]                                # [1,1,S,S]
        if attention_mask is not None:
            pad = jnp.where(attention_mask.astype(bool), 0.0, neg)
            mask = mask + pad[:, None, None, :]
        positions = jnp.arange(s)

        for i in range(cfg.num_hidden_layers):
            x = LlamaBlock(cfg, self.dtype, self.quant,
                           name=f"layers_{i}")(x, mask, positions)
        return RMSNorm(cfg.rms_norm_eps, name="norm")(x)


LLAMA_TP_RULES = [
    (r"\bq_proj\b|\bk_proj\b|\bv_proj\b", "col"),
    (r"\bgate_proj\b|\bup_proj\b", "col"),
    (r"\bo_proj\b|\bdown_proj\b", "row"),
]


def port_hf_llama(hf_state_dict, config: LlamaConfig, dtype=jnp.float32):
    """HF LlamaModel state_dict (torch tensors or numpy) -> flax params."""

    def arr(key, transpose=False):
        t = hf_state_dict[key]
        t = t.numpy() if hasattr(t, "numpy") else np.asarray(t)
        return jnp.asarray(t.T if transpose else t, dtype)

    params = {"embed_tokens": {"embedding": arr("embed_tokens.weight")},
              "norm": {"weight": arr("norm.weight")}}
    for i in range(config.num_hidden_layers):
        p = f"layers.{i}"
        params[f"layers_{i}"] = {
            "input_norm": {"weight": arr(f"{p}.input_layernorm.weight")},
            "post_attn_norm": {
                "weight": arr(f"{p}.post_attention_layernorm.weight")},
            "q_proj": {"kernel": arr(f"{p}.self_attn.q_proj.weight", True)},
            "k_proj": {"kernel": arr(f"{p}.self_attn.k_proj.weight", True)},
            "v_proj": {"kernel": arr(f"{p}.self_attn.v_proj.weight", True)},
            "o_proj": {"kernel": arr(f"{p}.self_attn.o_proj.weight", True)},
            "gate_proj": {"kernel": arr(f"{p}.mlp.gate_proj.weight", True)},
            "up_proj": {"kernel": arr(f"{p}.mlp.up_proj.weight", True)},
            "down_proj": {"kernel": arr(f"{p}.mlp.down_proj.weight", True)},
        }
    return {"params": params}
