"""HuggingFace language-model wrapper with reference pooling semantics.

Capability parity with engine/models/languagemodel.py:10-62:
  * encoder family (BERT/RoBERTa/DeBERTa)  -> CLS-token embedding
  * decoder family (LLaMA/Mistral/GPT-2/OPT/Bloom) -> attention-masked
    mean-pool of the last hidden state; pad token := eos
  * ``forward(batch, return_tokens=...)`` returning token-level states with
    pads zeroed when requested

TPU-first: prefers the Flax port of the model (runs on TPU under jit); falls
back to torch CPU when no Flax port exists for the family.  Zero-egress
environments must have the model in the local HF cache
(TRANSFORMERS_OFFLINE honored).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_ENCODER_KEYS = ("bert", "roberta", "deberta")
_DECODER_KEYS = ("llama", "mistral", "gpt2", "opt", "bloom")

MODEL_ALIASES = {
    "bloom0.56b": "bigscience/bloom-560m",
    "bloom1.1b": "bigscience/bloom-1b1",
    "bloom1.7b": "bigscience/bloom-1b7",
    "bloom3b": "bigscience/bloom-3b",
    "openllama3b": "openlm-research/open_llama_3b_v2",
    "openllama7b": "openlm-research/open_llama_7b",
    "openllama13b": "openlm-research/open_llama_13b",
    "mistral7b": "mistralai/Mistral-7B-v0.1",
}


def model_family(model_name: str) -> str:
    name = model_name.lower()
    if any(k in name for k in _ENCODER_KEYS):
        return "encoder"
    if any(k in name for k in _DECODER_KEYS):
        return "decoder"
    raise ValueError(f"Unsupported model type: {model_name!r}")


class TextModel:
    """Tokenizer + model + pooling, backend-agnostic.

    Backends, in ``auto`` preference order:
      * ``native``: the in-house TPU LlamaEncoder (LLaMA/Mistral families
        only) — jitted, bf16-capable, and tensor-parallel over a mesh's
        'model' axis (pass ``mesh``); this is the §2.4 large-text-encoder
        path the reference runs single-GPU (languagemodel.py:72-73)
      * ``flax``: HF Flax port (jitted, unsharded)
      * ``torch``: HF torch on CPU (last resort)
    """

    def __init__(self, model_name: str, backend: str = "auto", mesh=None,
                 dtype=jnp.float32, quant: str = "none"):
        from transformers import AutoTokenizer

        self.model_name = MODEL_ALIASES.get(model_name, model_name)
        self.model_type = model_family(self.model_name)
        self.mesh = mesh
        self.dtype = dtype
        # 'int8_w': weight-only int8 projections on the native backend
        # (models.llama.Q8Dense) — halves weight HBM so OpenLLaMA-13B
        # fits one 16 GB v5e chip; ignored by the flax/torch fallbacks
        self.quant = quant
        self.tokenizer = AutoTokenizer.from_pretrained(self.model_name)
        if self.model_type == "decoder" and self.tokenizer.pad_token is None:
            self.tokenizer.pad_token = self.tokenizer.eos_token

        self.backend = self._load_model(backend)

    def _is_llama_family(self) -> bool:
        name = self.model_name.lower()
        return any(k in name for k in ("llama", "mistral"))

    def _load_native(self):
        """Local HF checkpoint -> in-house LlamaEncoder (+ optional TP)."""
        from transformers import AutoConfig, AutoModel

        from uml_tpu.models.llama import (
            LLAMA_TP_RULES,
            LlamaConfig,
            LlamaEncoder,
            port_hf_llama,
        )

        hf_cfg = AutoConfig.from_pretrained(self.model_name)
        cfg = LlamaConfig.from_hf(hf_cfg)
        hf = AutoModel.from_pretrained(self.model_name)
        self.model = LlamaEncoder(cfg, dtype=self.dtype, quant=self.quant)
        # Port (and for int8_w, quantize) HOST-SIDE: jnp.asarray on the
        # TPU default device would materialize the full float tree in
        # HBM first — for OpenLLaMA-13B that is ~26 GB bf16 on a 16 GB
        # chip, OOMing before quantization could halve it.  Only the
        # final (possibly int8) tree is transferred, synced (staged_put:
        # a lazy first-dispatch transfer rides the relay's slow path).
        with jax.default_device(jax.devices("cpu")[0]):
            self._params = port_hf_llama(hf.state_dict(), cfg,
                                         dtype=self.dtype)
            if self.quant == "int8_w":
                from uml_tpu.models.llama import quantize_llama_params

                self._params = quantize_llama_params(self._params)
        del hf
        self._config = hf_cfg
        if self.mesh is not None:
            from uml_tpu.parallel import apply_tp_sharding

            self._params = apply_tp_sharding(self._params, self.mesh,
                                             rules=LLAMA_TP_RULES)
        else:
            from uml_tpu.core.meshes import staged_put

            self._params = staged_put(self._params)

    def _load_model(self, backend: str) -> str:
        if backend in ("auto", "native") and self._is_llama_family():
            try:
                self._load_native()
                print(f"=> Native TPU LlamaEncoder for {self.model_name}"
                      + (f" (TP over {dict(self.mesh.shape)})"
                         if self.mesh is not None else ""))
                return "native"
            except Exception as e:
                if backend == "native":
                    raise
                print(f"=> No native path for {self.model_name} ({e})")
        if backend in ("auto", "flax"):
            try:
                from transformers import FlaxAutoModel

                self.model = FlaxAutoModel.from_pretrained(self.model_name)
                return "flax"
            except Exception as e:
                if backend == "flax":
                    raise
                print(f"=> No flax port for {self.model_name} ({e}); using torch")
        from transformers import AutoModel

        self.model = AutoModel.from_pretrained(self.model_name)
        self.model.eval()
        return "torch"

    @property
    def hidden_size(self) -> int:
        if self.backend == "native":
            return self._config.hidden_size
        return self.model.config.hidden_size

    def _last_hidden(self, input_ids: np.ndarray, attention_mask: np.ndarray):
        if self.backend == "native":
            if not hasattr(self, "_jitted"):
                import jax

                self._jitted = jax.jit(
                    lambda p, ids, mask: self.model.apply(p, ids, mask))
            if self.mesh is not None:
                from uml_tpu.core.meshes import maybe_shard_batch

                input_ids, attention_mask = maybe_shard_batch(
                    self.mesh, (jnp.asarray(input_ids),
                                jnp.asarray(attention_mask)))
                with self.mesh:
                    out = self._jitted(self._params, input_ids,
                                       attention_mask)
            else:
                out = self._jitted(self._params, jnp.asarray(input_ids),
                                   jnp.asarray(attention_mask))
            return np.asarray(out, np.float32)
        if self.backend == "flax":
            if not hasattr(self, "_jitted"):
                import jax

                # HF flax models run eagerly by default — op-by-op dispatch
                # costs ~30ms/op through a remote TPU relay
                self._jitted = jax.jit(
                    lambda ids, mask: self.model(
                        input_ids=ids, attention_mask=mask
                    ).last_hidden_state
                )
            return np.asarray(self._jitted(jnp.asarray(input_ids),
                                           jnp.asarray(attention_mask)))
        import torch

        with torch.no_grad():
            out = self.model(
                input_ids=torch.from_numpy(input_ids),
                attention_mask=torch.from_numpy(attention_mask),
            )
        return out.last_hidden_state.numpy()

    def encode(self, texts: list[str], return_tokens: bool = False):
        """texts -> (features, indices).

        indices parity with features.py:74-76: token-count per sequence when
        return_tokens else len(text) in characters (the reference's quirk).
        """
        batch = self.tokenizer(texts, padding=True, truncation=True,
                               return_tensors="np")
        input_ids = np.asarray(batch["input_ids"])
        attention_mask = np.asarray(batch["attention_mask"])
        hidden = self._last_hidden(input_ids, attention_mask)  # [B, T, D]

        if self.model_type == "encoder":
            if return_tokens:
                return hidden, attention_mask.sum(-1).astype(np.int64)
            return hidden[:, 0, :], np.asarray([len(t) for t in texts])

        mask = attention_mask[..., None].astype(hidden.dtype)
        if return_tokens:
            return hidden * mask, attention_mask.sum(-1).astype(np.int64)
        pooled = (hidden * mask).sum(1) / mask.sum(1)
        return pooled, np.asarray([len(t) for t in texts])
