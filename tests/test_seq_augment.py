"""Sequence-augmentation library tests (MultiBench utilis.py parity)."""

import numpy as np
import pytest

from uml_tpu.data.seq_augment import (
    augment,
    augment_embed_single,
    augment_mimic,
    augment_single,
    drop,
    mixup,
    noise,
    permute,
)


def test_transforms_shapes_and_semantics():
    rng = np.random.RandomState(0)
    x = np.arange(20, dtype=np.float32).reshape(10, 2)
    p = permute(x, rng)
    assert sorted(p[:, 0].tolist()) == x[:, 0].tolist()
    n = noise(x, rng)
    assert n.shape == x.shape and not np.allclose(n, x)
    d = drop(x, rng)
    assert (d == 0).all(axis=1).sum() == 2  # 10 // 5 steps zeroed
    m = mixup(x, rng)
    assert m.shape == x.shape


def test_augment_views_differ():
    rng = np.random.RandomState(0)
    batch = np.random.default_rng(0).standard_normal((4, 10, 3)).astype(np.float32)
    v1, v2 = augment(batch.copy(), rng)
    assert v1.shape == v2.shape == batch.shape
    assert not np.allclose(v1, v2)
    single = augment_single(batch.copy(), rng)
    assert single.shape == batch.shape


def test_augment_mimic_dispatch():
    rng = np.random.RandomState(0)
    static = np.ones((6, 5), np.float32)
    seq = np.ones((6, 24, 12), np.float32)
    assert augment_mimic(static, rng).shape == static.shape
    assert augment_mimic(seq, rng).shape == seq.shape
    assert augment_embed_single(static, rng).shape == static.shape


def test_text_feature_set_with_prompts():
    from uml_tpu.data.fewshot import TextFeatureSetWithPrompts

    feats = np.zeros((4, 2), np.float32)
    labels = np.array([0, 0, 1, 1])
    eots = np.arange(4)
    prompts = {0: ["a", "b"], 1: ["c", "d"]}
    ds = TextFeatureSetWithPrompts(feats, labels, eots, prompts)
    assert ds.prompts == ["a", "b", "c", "d"]
    with pytest.raises(IndexError):
        TextFeatureSetWithPrompts(feats, np.array([0, 0, 0, 1]), eots, prompts)
