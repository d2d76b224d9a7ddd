"""Text re-embedding tests (HF cache unavailable -> plugged embedder)."""

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
