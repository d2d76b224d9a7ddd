"""Text re-embedding tests (HF cache unavailable -> plugged embedder).

The GloVe A/B block synthesizes a tiny GloVe-format vector file and pins
the noisy-text re-embedding path (reference get_data.py:332-347 +
_glove_embeddings :132-155) against a line-faithful numpy replica of the
reference's lookup: word2id over the noisy text, torchtext
``get_vecs_by_tokens(lower_case_backup=True)`` semantics (missing ->
lower-case -> zeros), truncate-to-50, zero padding.  Our embedder
back-pads where the reference front-pads (its own Affectdataset trims
the leading zeros again; our consumers carry explicit length tensors),
so the A/B compares the valid region word-for-word.
"""

import numpy as np

from uml_tpu.data.text_embed import reembed_noisy_text


def test_reembed_noisy_text_with_plugged_embedder():
    def fake_embed(texts):
        # deterministic hash embedding, [N, 5, 4]
        return np.stack([
            np.random.default_rng(abs(hash(t)) % 2**32)
            .standard_normal((5, 4)).astype(np.float32)
            for t in texts
        ])

    raw = ["the quick brown fox jumps", "hello world example sentence"]
    levels = reembed_noisy_text(raw, noise_levels=3, embed_fn=fake_embed)
    assert len(levels) == 3
    assert levels[0].shape == (2, 5, 4)
    # level 0 = no corruption... but normalization still lowercases etc.;
    # higher levels must differ from level 0 for typo-able words
    assert not np.allclose(levels[0], levels[2])


# --------------------------------------------------------------------------
# GloVe A/B: synthetic vector file vs a reference-faithful replica
# --------------------------------------------------------------------------

_VOCAB = {
    "the": 0.1, "cat": 0.2, "sat": 0.3, "on": 0.4, "mat": 0.5,
    "dog": 0.6, "barked": 0.7, "loudly": 0.8, "Paris": 0.9, "night": 1.0,
    "quick": 1.1, "brown": 1.2, "fox": 1.3, "jumps": 1.4, "again": 1.5,
}
_DIM = 6


def _write_glove(tmp_path):
    """Tiny GloVe-format file: 'word v1 v2 ...' per line (840B layout)."""
    p = tmp_path / "glove.tiny.txt"
    lines = []
    for w, base in _VOCAB.items():
        vec = base + 0.01 * np.arange(_DIM)
        lines.append(w + " " + " ".join(f"{v:.4f}" for v in vec))
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _reference_glove_embeddings(text_data, vectors, paddings=50, dim=_DIM):
    """Line-faithful numpy replica of the reference pipeline
    (get_data.py:94-155): _get_word2id builds ids over the NOISY words,
    _get_word_embeddings looks every vocab word up with torchtext's
    lower_case_backup (miss -> w.lower() -> zeros), _glove_embeddings
    truncates to the first ``paddings`` words and zero-pads at the FRONT."""
    word2id, looks_up = {}, []

    def wid(w):
        if w not in word2id:
            word2id[w] = len(word2id)
            vec = vectors.get(w)
            if vec is None:
                vec = vectors.get(w.lower())
            looks_up.append(np.zeros(dim, np.float32) if vec is None
                            else np.asarray(vec, np.float32))
        return word2id[w]

    out = []
    for sent in text_data:
        ids = [wid(w) for w in sent.split()]
        rows = [looks_up[x] for x in ids[:paddings]]
        pad = [np.zeros(dim, np.float32)] * (paddings - len(rows))
        out.append(np.asarray(pad + rows))   # front padding
    return np.asarray(out)


def test_word_vector_embedder_matches_reference_replica(tmp_path):
    """Clean + typo'd sentences through our embedder == the reference
    replica on the valid region, word for word (incl. OOV zeros and the
    lower-case backup), with only the padding side differing."""
    from uml_tpu.data.robustness import add_text_noise
    from uml_tpu.data.text_embed import (WordVectorEmbedder,
                                         load_word_vectors)

    emb = WordVectorEmbedder(load_word_vectors(_write_glove(tmp_path)))
    assert emb.dim == _DIM
    raw = ["the cat sat on the mat",
           "the dog barked loudly in Paris at night",   # 'in'/'at' OOV
           "PARIS the QUICK brown fox jumps again"]     # lower-case backup
    rng = np.random.RandomState(3)
    for level in (0.0, 0.5, 1.0):
        noisy = add_text_noise(raw, level, rng=rng)
        ours = emb(noisy, 50)
        ref = _reference_glove_embeddings(noisy, emb.vectors)
        for i, sent in enumerate(noisy):
            n = min(len(sent.split()), 50)
            np.testing.assert_array_equal(
                ours[i, :n], ref[i, 50 - n:],
                err_msg=f"level {level} row {i}: {sent!r}")
            assert not ours[i, n:].any()    # back padding is zeros
            assert not ref[i, :50 - n].any()  # front padding is zeros


def test_oov_and_lowercase_backup_semantics(tmp_path):
    """Directly pin the two torchtext behaviors the robust path rides on:
    typo-corrupted words miss the vocabulary and embed to ZEROS, and a
    cased miss falls back to its lower-cased vector."""
    from uml_tpu.data.text_embed import (WordVectorEmbedder,
                                         load_word_vectors)

    emb = WordVectorEmbedder(load_word_vectors(_write_glove(tmp_path)))
    out = emb(["the ct sat", "CAT Mat paris"], 4)
    assert out[0, 0].any() and out[0, 2].any()
    assert not out[0, 1].any()          # 'ct' (typo of 'cat') -> zeros
    assert not out[0, 3].any()          # padding
    # 'CAT'/'Mat' -> lower-case backup; 'paris' misses 'Paris' (backup
    # only lowers the QUERY, exactly like torchtext)
    np.testing.assert_array_equal(out[1, 0], emb.vectors["cat"])
    np.testing.assert_array_equal(out[1, 1], emb.vectors["mat"])
    assert not out[1, 2].any()


def test_hash_vocab_embedder_tracks_glove_oov_structure(tmp_path):
    """A/B the zero-egress hash-vocab fallback against the real-GloVe
    path on the SAME noise stream: identical zero/nonzero support
    (which words survive each noise level is the degradation signal);
    the vector VALUES differ by design (documented deviation)."""
    from uml_tpu.data.robustness import add_text_noise
    from uml_tpu.data.text_embed import (HashVocabEmbedder,
                                         WordVectorEmbedder,
                                         load_word_vectors)

    raw = ["the cat sat on the mat", "the dog barked loudly again"]
    glove = WordVectorEmbedder(load_word_vectors(_write_glove(tmp_path)))
    hashv = HashVocabEmbedder(raw, dim=_DIM)
    for level in (0.0, 0.4, 0.9):
        noisy = add_text_noise(raw, level, rng=np.random.RandomState(7))
        a = glove(noisy, 12)
        b = hashv(noisy, 12)
        np.testing.assert_array_equal(a.any(axis=-1), b.any(axis=-1),
                                      err_msg=f"level {level}")


def test_reembed_noisy_text_with_glove_file(tmp_path):
    """End-to-end reembed_noisy_text over the synthetic GloVe file:
    level 0 must equal the clean embedding (noise_level=0 corrupts
    nothing); deep levels corrupt some word of some sentence."""
    from uml_tpu.data.text_embed import (WordVectorEmbedder,
                                         load_word_vectors)

    emb = WordVectorEmbedder(load_word_vectors(_write_glove(tmp_path)))
    raw = ["the cat sat on the mat", "the dog barked loudly again"]
    levels = reembed_noisy_text(raw, noise_levels=10,
                                embed_fn=lambda ts: emb(ts, 50), seed=1)
    assert len(levels) == 10
    clean = emb([s.lower() for s in raw], 50)
    np.testing.assert_array_equal(levels[0], clean)
    assert any(not np.array_equal(lv, clean) for lv in levels[5:])


def test_hash_vocab_covers_normalized_cased_corpus():
    """A cased/punctuated corpus must not miss its own uncorrupted
    (level-0) words: the vocabulary is built through the same
    normalization add_text_noise applies."""
    from uml_tpu.data.robustness import add_text_noise
    from uml_tpu.data.text_embed import HashVocabEmbedder

    raw = ["The Cat sat, on THE mat!", "A Dog barked... Loudly"]
    hashv = HashVocabEmbedder(raw, dim=8)
    level0 = add_text_noise(raw, 0.0)
    out = hashv(level0, 16)
    for i, sent in enumerate(level0):
        n = len(sent.split())
        assert out[i, :n].any(axis=-1).all(), (sent, out[i].any(axis=-1))
