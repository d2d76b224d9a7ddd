"""Offline text (re-)embedding for affect datasets.

Capability parity with MultiBench/datasets/affect/get_bert_embedding.py and
the GloVe re-embedding inside the robust_test path (get_data.py:332-347):
turn raw sentences into fixed-length [N, T, D] word-embedding arrays that
slot into the affect pickle schema's ``text`` modality.

``embed_texts`` uses any HF model through
:class:`uml_tpu.models.languagemodel.TextModel` (flax backend on TPU):
  * contextual=True  -> last hidden state per token (BERT contextual mode)
  * contextual=False -> input embedding table lookups (word-embedding mode,
    the reference's default)

The typical use with the robustness suite:

    from uml_tpu.data.robustness import add_text_noise
    noisy = add_text_noise(raw_sentences, level / 10)
    arr = embed_texts(noisy, model_name="bert-base-uncased", max_len=50)
"""

from __future__ import annotations

import numpy as np


def embed_texts(texts, model_name="bert-base-uncased", contextual=False,
                batch_size=256, max_len=None) -> np.ndarray:
    """list[str] -> float32 [N, max_len, hidden]."""
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_name)
    if max_len is None:
        max_len = max(
            len([w for w in s.split() if w]) for s in texts
        )

    if contextual:
        from uml_tpu.models.languagemodel import TextModel

        tm = TextModel(model_name)
        out = []
        for i in range(0, len(texts), batch_size):
            hidden, _ = tm.encode(texts[i : i + batch_size], return_tokens=True)
            t = hidden.shape[1]
            if t < max_len:
                hidden = np.pad(hidden, ((0, 0), (0, max_len - t), (0, 0)))
            out.append(hidden[:, :max_len].astype(np.float32))
        return np.concatenate(out)

    # word-embedding mode: raw input-embedding lookups (no transformer pass)
    import torch
    from transformers import AutoModel

    model = AutoModel.from_pretrained(model_name)
    table = model.get_input_embeddings().weight.detach().numpy()
    out = np.zeros((len(texts), max_len, table.shape[1]), np.float32)
    for i in range(0, len(texts), batch_size):
        batch = tokenizer(texts[i : i + batch_size], padding="max_length",
                          truncation=True, max_length=max_len,
                          return_tensors="np")
        ids = np.asarray(batch["input_ids"])
        mask = np.asarray(batch["attention_mask"])[..., None]
        out[i : i + len(ids)] = table[ids] * mask
    return out


def reembed_noisy_text(raw_sentences, noise_levels=10, model_name=None,
                       embed_fn=None, max_len=50, seed=0):
    """Noisy-text robustness arrays: for each level l/10, typo-corrupt the
    raw sentences and re-embed them (affect get_data.py:332-347 with the
    embedder pluggable instead of hardwired GloVe)."""
    from uml_tpu.data.robustness import add_text_noise

    if embed_fn is None:
        embed_fn = lambda ts: embed_texts(ts, model_name or "bert-base-uncased",
                                          max_len=max_len)
    rng = np.random.RandomState(seed)
    out = []
    for level in range(noise_levels):
        noisy = add_text_noise(raw_sentences, level / 10, rng=rng)
        out.append(embed_fn(noisy))
    return out
