"""MultiBench self-supervised UML stack tests."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uml_tpu.data.affect import (
    AffectBatchStream,
    AffectSplit,
    drop_entry,
    load_affect,
    map_labels,
)
from uml_tpu.models.seq_autoencoder import (
    SeqTransformer,
    TorchEncoderLayer,
    length_mask,
    make_seq_uml,
    masked_mse,
    sequence_info_nce,
)


def make_affect_pickle(path, n=64, T=12, dx=6, dy=10):
    rng = np.random.default_rng(0)

    def split(n):
        latent = rng.standard_normal((n, 3))
        vision = np.repeat(latent @ rng.standard_normal((3, dx)), T, 0).reshape(n, T, dx) \
            + 0.2 * rng.standard_normal((n, T, dx))
        text = np.repeat(latent @ rng.standard_normal((3, dy)), T, 0).reshape(n, T, dy) \
            + 0.2 * rng.standard_normal((n, T, dy))
        audio = rng.standard_normal((n, T, 4))
        text[0] = 0.0  # exercises drop_entry
        text[2, :4] = 0.0  # exercises leading-zero trim
        labels = np.sign(latent[:, 0]).reshape(n, 1)
        return {"vision": vision, "audio": audio, "text": text,
                "labels": labels, "id": np.arange(n).reshape(n, 1)}

    data = {"train": split(n), "valid": split(24), "test": split(24)}
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return data


@pytest.fixture(scope="module")
def affect_pickle(tmp_path_factory):
    path = tmp_path_factory.mktemp("affect") / "mosi_data.pkl"
    make_affect_pickle(str(path))
    return str(path)


def test_drop_entry_and_trim(affect_pickle):
    splits = load_affect(affect_pickle)
    tr = splits["train"]
    assert len(tr) == 63  # one all-zero-text row dropped
    # trimmed row: its length is shorter than T
    assert tr.lengths["text"].min() < 12
    assert tr.text.shape[0] == 63 and tr.text.shape[2] == 10


def test_label_maps():
    y = np.array([[-2.0], [0.0], [1.5]])
    np.testing.assert_array_equal(map_labels(y, "mosi"), [0, 1, 1])
    y2 = np.array([-1.0, 1.0, -1.0])
    np.testing.assert_array_equal(map_labels(y2, "sarcasm"), [0, 1, 0])
    with pytest.raises(NotImplementedError):
        map_labels(y2, "unknown")


def test_affect_stream_independent_shuffles(affect_pickle):
    splits = load_affect(affect_pickle)
    s1 = AffectBatchStream(splits["train"], 16, seed=42)
    s2 = AffectBatchStream(splits["train"], 43, seed=43)
    b1 = next(iter(s1.epoch()))
    b2 = next(iter(s2.epoch()))
    # different shuffles -> unpaired batches
    assert not np.array_equal(b1[2], b2[2])
    assert b1[0]["vision"].shape == (16, 12, 6)
    assert b1[1]["text"].shape == (16,)


def test_masked_mse():
    pred = jnp.ones((2, 3, 2))
    tgt = jnp.zeros((2, 3, 2))
    mask = jnp.asarray([[True, True, False], [True, False, False]])
    # 3 valid steps x 2 dims, each err 1 -> mean 1.0
    assert float(masked_mse(pred, tgt, mask)) == pytest.approx(1.0)
    assert float(masked_mse(pred, tgt)) == pytest.approx(1.0)


def test_sequence_info_nce_prefers_aligned():
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((2, 4, 8)), jnp.float32)
    mask = jnp.ones((2, 4), bool)
    aligned = float(sequence_info_nce(t, t, mask))
    shuffled = float(sequence_info_nce(t, t[::-1], mask))
    assert aligned < shuffled


@pytest.mark.heavy
def test_seq_transformer_causality():
    model = SeqTransformer(8, 10, nhead=5, num_layers=2, out_last=False)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 6, 8)),
                    jnp.float32)
    v = model.init(jax.random.key(0), x)
    base = model.apply(v, x, deterministic=True)
    x2 = x.at[:, 4:, :].set(99.0)  # change the future
    out = model.apply(v, x2, deterministic=True)
    np.testing.assert_allclose(np.asarray(base[:, :4]), np.asarray(out[:, :4]),
                               atol=1e-5)


@pytest.mark.heavy
def test_seq_transformer_out_last_gathers_valid():
    model = SeqTransformer(8, 10, nhead=5, num_layers=1, out_last=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 6, 8)),
                    jnp.float32)
    v = model.init(jax.random.key(0), x)
    lengths = jnp.asarray([3, 6])
    out = model.apply(v, x, lengths=lengths, deterministic=True)
    full = model.apply(v, x, lengths=lengths, deterministic=True)
    assert out.shape == (2, 10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full))


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="no reference")
def test_encoder_layer_parity_with_torch():
    """Port torch nn.TransformerEncoderLayer weights -> TorchEncoderLayer,
    compare eval-mode outputs (validates post-LN order, packed QKV, FF)."""
    torch = pytest.importorskip("torch")
    d, h, ff = 20, 5, 64
    torch.manual_seed(0)
    ref = torch.nn.TransformerEncoderLayer(d_model=d, nhead=h,
                                           dim_feedforward=ff,
                                           batch_first=True).eval()
    layer = TorchEncoderLayer(d, h, dim_feedforward=ff)
    sd = ref.state_dict()
    params = {"params": {
        "qkv": {"kernel": sd["self_attn.in_proj_weight"].numpy().T,
                "bias": sd["self_attn.in_proj_bias"].numpy()},
        "out_proj": {"kernel": sd["self_attn.out_proj.weight"].numpy().T,
                     "bias": sd["self_attn.out_proj.bias"].numpy()},
        "linear1": {"kernel": sd["linear1.weight"].numpy().T,
                    "bias": sd["linear1.bias"].numpy()},
        "linear2": {"kernel": sd["linear2.weight"].numpy().T,
                    "bias": sd["linear2.bias"].numpy()},
        "norm1": {"scale": sd["norm1.weight"].numpy(),
                  "bias": sd["norm1.bias"].numpy()},
        "norm2": {"scale": sd["norm2.weight"].numpy(),
                  "bias": sd["norm2.bias"].numpy()},
    }}
    x = np.random.default_rng(0).standard_normal((2, 7, d)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    got = layer.apply(params, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5)


@pytest.mark.heavy
def test_seq_uml_y_encoder_unmasked_parity_quirk():
    """The reference encodes y WITHOUT key-padding (models.py:233) while x
    is masked (models.py:201); zy must therefore change when padded steps
    change, zx must not."""
    model = make_seq_uml(4, 6, 10)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 4)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 6, 6)), jnp.float32)
    lx = ly = jnp.asarray([4, 4])
    v = model.init(jax.random.key(0), x, y, lx, ly)
    base = model.apply(v, x, y, lx, ly, deterministic=True)
    x2 = x.at[:, 4:, :].set(7.0)  # mutate padded steps
    y2 = y.at[:, 4:, :].set(7.0)
    out = model.apply(v, x2, y2, lx, ly, deterministic=True)
    # x: masked encoder -> valid-step zx unchanged
    np.testing.assert_allclose(np.asarray(base["zx"][:, :4]),
                               np.asarray(out["zx"][:, :4]), atol=1e-5)
    # y: unmasked encoder (reference quirk) -> zy at valid steps CAN change
    # only via future positions... causal masking means steps <4 attend only
    # to steps <=3, so valid zy also unchanged; check padded-step zy differs
    assert not np.allclose(np.asarray(base["zy"][:, 4:]),
                           np.asarray(out["zy"][:, 4:]))


@pytest.mark.heavy
def test_seq_uml_forward_losses(affect_pickle):
    splits = load_affect(affect_pickle)
    model = make_seq_uml(6, 10, 10)
    s = AffectBatchStream(splits["train"], 8, seed=0)
    data, lengths, _ = next(iter(s.epoch()))
    x, y = jnp.asarray(data["vision"]), jnp.asarray(data["text"])
    lx, ly = jnp.asarray(lengths["vision"]), jnp.asarray(lengths["text"])
    v = model.init(jax.random.key(0), x, y, lx, ly)
    out = model.apply(v, x, y, lx, ly, deterministic=True)
    for k in ("loss_x", "loss_y", "loss_private", "zx", "zy", "x_proj",
              "y_proj", "x_recon", "y_recon", "diff_next_x", "diff_next_y"):
        assert k in out
    assert np.isfinite(float(out["loss_x"])) and float(out["loss_x"]) > 0
    assert out["x_recon"].shape == x.shape and out["y_recon"].shape == y.shape
    # y-only mode
    out_y = model.apply(v, None, y, None, ly, deterministic=True)
    assert float(out_y["loss_x"]) == 0.0 and float(out_y["loss_private"]) == 0.0
    # embeddings
    ex, ey = model.apply(v, x, y, method=model.get_embedding)
    assert ex.shape == (8, 10) and ey.shape == (8, 10)


def test_mimic_loader(tmp_path):
    from uml_tpu.data.mimic import load_mimic, make_robust_tests

    n = 60
    rng = np.random.default_rng(0)
    adm_labels = np.zeros((n, 6))
    adm_labels[:10, 1] = 1  # class 1 mortality
    datafile = {
        "ep_tdata": rng.standard_normal((n, 24, 12)),
        "adm_features_all": rng.standard_normal((n, 5)),
        "adm_labels_all": adm_labels,
        "y_icd9": rng.integers(0, 2, (n, 20)),
    }
    datafile["ep_tdata"][0, 0, 0] = np.inf  # exercises cleanup
    path = tmp_path / "im.pk"
    with open(path, "wb") as f:
        pickle.dump(datafile, f)

    splits = load_mimic(str(path), task=-1)
    assert len(splits["valid"]["labels"]) == 6
    assert len(splits["test"]["labels"]) == 6
    assert len(splits["train"]["labels"]) == 48
    assert np.isfinite(splits["train"]["timeseries"]).all()
    splits7 = load_mimic(str(path), task=7)
    assert set(np.unique(splits7["train"]["labels"])) <= {0, 1}

    robust = make_robust_tests(splits["test"], levels=3)
    assert len(robust) == 3
    # level 0 = no noise
    np.testing.assert_allclose(robust[0]["timeseries"],
                               splits["test"]["timeseries"], atol=1e-6)


def test_robustness_noise():
    from uml_tpu.data.robustness import (
        add_tabular_noise, add_text_noise, add_timeseries_noise)

    rng = np.random.RandomState(0)
    data = [np.ones((5, 3)) for _ in range(4)]
    noisy = add_timeseries_noise([data], 0.5, rng=rng)[0]
    assert len(noisy) == 4 and noisy[0].shape == (5, 3)
    assert not np.allclose(np.stack(noisy), 1.0)
    # level 0 leaves data intact up to gaussian(std=0)
    clean = add_timeseries_noise([data], 0.0, rng=rng)[0]
    np.testing.assert_allclose(np.stack(clean), 1.0)

    tab = add_tabular_noise(np.ones((6, 4)), 0.9, rng=rng)
    assert (tab == 0).any()

    texts = ["the quick brown fox jumps over the lazy dog"]
    noisy_text = add_text_noise(texts, 1.0, rng=rng)
    assert noisy_text[0] != texts[0]
    assert add_text_noise(texts, 0.0, rng=rng)[0] == texts[0]


@pytest.mark.heavy
def test_selfsup_train_smoke(affect_pickle):
    from uml_tpu.train.selfsup import SelfSupTrainer, train_selfsup
    from uml_tpu.cli.multibench import _affect_streams

    splits = load_affect(affect_pickle)
    s1, s2, evals = _affect_streams(splits, None, 16)
    model = make_seq_uml(6, 10, 10)
    trainer = SelfSupTrainer(model, lr=1e-3, seed=0)
    variables, score, _ = train_selfsup(
        trainer, s1, s2, evals, mode="xy", num_epochs=2, step_k=0,
        ds_name="mosi", eval_freq=100, capture=True)
    for k in ("test/score_x", "test/score_y", "test/score_xy",
              "val/score_x_raw", "val/modality_separate"):
        assert k in score
        assert 0.0 <= score[k] <= 1.0


@pytest.mark.heavy
def test_selfsup_checkpoint_resume(affect_pickle, tmp_path):
    from uml_tpu.core.checkpoint import TrainCheckpointer
    from uml_tpu.train.selfsup import SelfSupTrainer, train_selfsup
    from uml_tpu.cli.multibench import _affect_streams
    import jax
    import numpy as np

    splits = load_affect(affect_pickle)

    def run(ckpt_dir, epochs):
        s1, s2, evals = _affect_streams(splits, None, 16)
        model = make_seq_uml(6, 10, 10)
        trainer = SelfSupTrainer(model, lr=1e-3, seed=0)
        ck = TrainCheckpointer(ckpt_dir) if ckpt_dir else None
        variables, score, _ = train_selfsup(
            trainer, s1, s2, evals, mode="xy", num_epochs=epochs,
            ds_name="mosi", eval_freq=1000, capture=False, checkpointer=ck)
        if ck:
            ck.close()
        return jax.tree.map(np.asarray, variables)

    ref = run(None, 3)
    ckdir = str(tmp_path / "mbck")
    run(ckdir, 2)            # "crashes" after epoch 2
    resumed = run(ckdir, 3)  # resumes epoch 3 only
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(resumed)):
        np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.heavy
def test_selfsup_deterministic_reruns(affect_pickle):
    """Two identical runs must produce identical scores: the eval-side
    shuffle uses an explicit generator, not ambient global RNG state."""
    from uml_tpu.train.selfsup import SelfSupTrainer, train_selfsup
    from uml_tpu.cli.multibench import _affect_streams

    splits = load_affect(affect_pickle)

    def run():
        # perturb the global RNG differently each run: results must not move
        np.random.standard_normal(int(np.random.randint(1, 50)))
        s1, s2, evals = _affect_streams(splits, None, 16)
        model = make_seq_uml(6, 10, 10)
        trainer = SelfSupTrainer(model, lr=1e-3, seed=0)
        _, score, _ = train_selfsup(
            trainer, s1, s2, evals, mode="xy", num_epochs=1,
            ds_name="mosi", eval_freq=1000, capture=False)
        return score

    a, b = run(), run()
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], (k, a[k], b[k])


@pytest.mark.heavy
def test_selfsup_resume_past_completion(affect_pickle, tmp_path):
    """Resuming a run whose checkpoint is already at num_epochs must still
    return the finished score (not None)."""
    from uml_tpu.core.checkpoint import TrainCheckpointer
    from uml_tpu.train.selfsup import SelfSupTrainer, train_selfsup
    from uml_tpu.cli.multibench import _affect_streams

    splits = load_affect(affect_pickle)
    ckdir = str(tmp_path / "mbdone")

    def run(epochs):
        s1, s2, evals = _affect_streams(splits, None, 16)
        model = make_seq_uml(6, 10, 10)
        trainer = SelfSupTrainer(model, lr=1e-3, seed=0)
        ck = TrainCheckpointer(ckdir)
        _, score, _ = train_selfsup(
            trainer, s1, s2, evals, mode="xy", num_epochs=epochs,
            ds_name="mosi", eval_freq=1000, capture=False, checkpointer=ck)
        ck.close()
        return score

    first = run(2)
    resumed = run(2)  # checkpoint already at epoch 2: loop body never runs
    assert resumed is not None
    for k in ("test/score_x", "test/score_y", "test/score_xy"):
        assert resumed[k] == first[k], (k, resumed[k], first[k])


@pytest.mark.heavy
def test_robust_evaluate_text_curves(affect_pickle):
    """--robust_test with raw sentences: text-modality degradation curves
    appear (VERDICT #7; reference affect get_data.py:332-347)."""
    from uml_tpu.cli.multibench import _affect_streams, robust_evaluate
    from uml_tpu.train.selfsup import SelfSupTrainer, train_selfsup

    splits = load_affect(affect_pickle)
    # text arrays are 10-dim in the fixture; raw sentences per retained row
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rng = np.random.default_rng(0)
    raw_text = [" ".join(rng.choice(words, size=6)) for _ in
                range(len(splits["test"]))]

    s1, s2, evals = _affect_streams(splits, None, 16)
    model = make_seq_uml(6, 10, 10)
    trainer = SelfSupTrainer(model, lr=1e-3, seed=0)
    variables, _, _ = train_selfsup(
        trainer, s1, s2, evals, mode="xy", num_epochs=1,
        ds_name="mosi", eval_freq=1000, capture=False)

    curves = robust_evaluate(trainer, variables, splits, 16, "mosi",
                             levels=3, raw_text=raw_text)
    assert set(curves) == {"vision", "timeseries", "text"}
    assert len(curves["text"]) == 3
    for entry in curves["text"]:
        for k in ("test/score_x", "test/score_y", "test/score_xy"):
            assert 0.0 <= entry[k] <= 1.0


def test_hash_vocab_embedder_glove_semantics():
    from uml_tpu.data.text_embed import HashVocabEmbedder, WordVectorEmbedder

    emb = HashVocabEmbedder(["the cat sat", "a dog ran"], dim=16)
    out = emb(["the cat", "xqzt cat"], max_len=4)
    assert out.shape == (2, 4, 16)
    # deterministic per word
    np.testing.assert_array_equal(out[0, 1], out[1, 1])
    # OOV (typo) -> zeros, like GloVe lookups in the reference
    assert np.all(out[1, 0] == 0.0)
    assert np.any(out[0, 0] != 0.0)
    # padding rows zero
    assert np.all(out[:, 2:] == 0.0) or np.all(out[0, 2] == 0.0)

    wv = WordVectorEmbedder({"cat": np.ones(4, np.float32)})
    o = wv(["cat dog"], max_len=3)
    np.testing.assert_array_equal(o[0, 0], np.ones(4))
    assert np.all(o[0, 1] == 0.0)


def test_make_robust_tests_levels(affect_pickle):
    from uml_tpu.data.affect import make_robust_tests

    splits = load_affect(affect_pickle)
    noisy = make_robust_tests(splits["test"], levels=3)
    assert set(noisy) == {"vision", "audio", "timeseries"}
    assert len(noisy["vision"]) == 3
    # level 0 = no noise
    np.testing.assert_allclose(noisy["vision"][0], splits["test"].vision,
                               atol=1e-6)
    # higher levels perturb
    assert not np.allclose(noisy["vision"][2], splits["test"].vision)
    v, a, t = noisy["timeseries"][2]
    assert v.shape == splits["test"].vision.shape
    assert t.shape == splits["test"].text.shape
