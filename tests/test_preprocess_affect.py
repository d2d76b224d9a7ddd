"""hdf5 -> MultiBench-pickle offline preprocessing (get_raw_data.py port)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from uml_tpu.data.preprocess_affect import (
    build_affect_pickle,
    detect_entry_fold,
    embed_left_padded,
    get_rawtext,
    lpad,
)


def _make_hdf5(path, n_per_fold=4, T=6):
    rng = np.random.default_rng(0)
    words = ["hello", "world", "good", "day", "sp"]
    folds = [[], [], []]
    with h5py.File(path, "w") as f:
        gw = f.create_group("words")
        ga = f.create_group("COVAREP")
        gv = f.create_group("FACET_4.2")
        gl = f.create_group("Opinion Segment Labels")
        idx = 0
        for fold_i in range(3):
            for j in range(n_per_fold):
                vid = f"video{idx}[{j}]"
                folds[fold_i].append(f"video{idx}")
                seq = rng.choice(words, size=T)
                gw.create_group(vid).create_dataset(
                    "features",
                    data=np.asarray([[w.encode()] for w in seq], dtype="S16"))
                ga.create_group(vid).create_dataset(
                    "features", data=rng.standard_normal((T, 5)))
                gv.create_group(vid).create_dataset(
                    "features", data=rng.standard_normal((T, 4)))
                gl.create_group(vid).create_dataset(
                    "features", data=rng.standard_normal((1, 1)))
                idx += 1
    return folds


def test_lpad_and_folds():
    a = np.ones((3, 2))
    p = lpad(a, 5)
    assert p.shape == (5, 2) and np.all(p[:2] == 0) and np.all(p[2:] == 1)
    assert lpad(np.ones((8, 2)), 5).shape == (5, 2)  # truncates to last 5
    assert detect_entry_fold("video3[1]", [["video3"], [], []]) == 0
    assert detect_entry_fold("videoX[0]", [["video3"], [], []]) is None


def test_build_affect_pickle_roundtrip(tmp_path):
    h5 = str(tmp_path / "mosi.hdf5")
    folds = _make_hdf5(h5)
    out = str(tmp_path / "mosi_raw.pkl")
    data = build_affect_pickle(h5, out, folds, seq_len=8)

    for fold in ("train", "valid", "test"):
        assert data[fold]["vision"].shape == (4, 8, 4)
        assert data[fold]["audio"].shape == (4, 8, 5)
        assert data[fold]["text"].shape == (4, 8, 300)
        assert data[fold]["labels"].shape == (4, 1, 1)
        assert len(data[fold]["id"]) == 4

    # 'sp' pause tokens are dropped from the raw text
    raw, vids = get_rawtext(h5, [data["train"]["id"][0]])
    assert "sp" not in raw[0].split()

    # text is LEFT-padded: leading rows zero, trailing rows embedded
    t = data["train"]["text"][0]
    n_words = len(raw[0].split())
    assert np.all(t[: 8 - n_words] == 0)
    assert np.any(t[-1] != 0)

    # the produced pickle loads through the affect pipeline
    from uml_tpu.data.affect import load_affect

    splits = load_affect(out)
    assert len(splits["train"]) <= 4  # drop_entry may drop none or some
    assert splits["train"].text.shape[-1] == 300


def test_embed_left_padded_glove_file(tmp_path):
    glove = tmp_path / "vecs.txt"
    glove.write_text("hello 1.0 0.0\nworld 0.0 1.0\n")
    from uml_tpu.data.text_embed import WordVectorEmbedder, load_word_vectors

    emb = WordVectorEmbedder(load_word_vectors(str(glove)))
    out = embed_left_padded(["hello world", "world oov"], emb, paddings=3)
    assert out.shape == (2, 3, 2)
    np.testing.assert_array_equal(out[0, 1], [1.0, 0.0])
    np.testing.assert_array_equal(out[0, 2], [0.0, 1.0])
    np.testing.assert_array_equal(out[0, 0], [0.0, 0.0])   # left pad
    np.testing.assert_array_equal(out[1, 2], [0.0, 0.0])   # OOV -> zeros
