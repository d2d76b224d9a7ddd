"""End-to-end test of the Gaussian UML experiment (CPU-fast).

This is the permanent integration test for config -> data -> jitted train
-> metrics -> save (SURVEY.md §7 step 2; BASELINE.json config #1).
"""

import json
import numpy as np
import jax.numpy as jnp
import pytest

from uml_tpu.data.gaussian import generate_data, sample_latent, UnpairedIndexStream
from uml_tpu.train.gaussian import make_model, train_gaussian


def _cfg(seed, n, attenuate=True, dist="gaussian"):
    return {
        "seed": seed, "num_samples": n, "dim_c": 5, "dim_x": 10, "dim_y": 10,
        "dim_obs": 50, "noise_std": 0.1, "attenuate_x": attenuate,
        "attenuation": 0.05, "shared_latent_distribution_type": dist,
    }


def test_dgp_deterministic_and_shaped():
    d1 = generate_data(_cfg(42, 256))
    d2 = generate_data(_cfg(42, 256))
    assert d1["x"].shape == (256, 50) and d1["y"].shape == (256, 50)
    np.testing.assert_array_equal(d1["x"], d2["x"])
    d3 = generate_data(_cfg(43, 256))
    assert not np.allclose(d1["x"], d3["x"])


def test_dgp_attenuation_mask():
    # with full attenuation=0 and no noise/private dims, X depends only on
    # the first 10% of shared dims
    cfg = _cfg(0, 128)
    cfg.update(noise_std=0.0, dim_x=1, dim_y=1, dim_c=10, attenuation=0.0)
    d = generate_data(cfg)
    assert np.isfinite(d["x"]).all()


def test_sample_latent_types():
    rng = np.random.default_rng(0)
    g = sample_latent(rng, 100, 4, "gaussian")
    assert np.allclose(g.mean(0), 0, atol=1e-6)  # centered
    m = sample_latent(np.random.default_rng(0), 100, 4, "gmm")
    assert np.allclose(m.mean(0), 0, atol=1e-6)
    l = sample_latent(np.random.default_rng(0), 100, 4, "laplace")
    assert l.shape == (100, 4)
    with pytest.raises(ValueError):
        sample_latent(rng, 10, 2, "cauchy")


def test_unpaired_stream_modulo_and_droplast():
    s = UnpairedIndexStream(10, 7, batch_size=4, seed=0)
    batches = list(s.batches())
    assert len(batches) == 2  # 10 // 4, drop_last
    for ix, iy in batches:
        assert ix.max() < 10 and iy.max() < 7


@pytest.mark.heavy
def test_train_xy_learns_and_aligns():
    train = generate_data(_cfg(42, 2048))
    val = generate_data(_cfg(43, 256, attenuate=False))
    model = make_model(50, 64, 32)
    res = train_gaussian(
        model,
        {"x": train["x"][:1024], "y": train["y"][1024:]},
        jnp.asarray(val["x"]), jnp.asarray(val["y"]),
        mode="xy", lr=1e-3, batch_size=128, num_steps=60, seed=0, chunk=20,
    )
    first_loss = res.history["val/loss"][0]
    last_loss = res.history["val/loss"][-1]
    assert last_loss < first_loss, (first_loss, last_loss)
    assert np.isfinite(res.final_cka) and -1 <= res.final_cka <= 1
    assert 0 <= res.final_mknn <= 1


@pytest.mark.heavy
def test_train_x_mode_only_optimizes_x():
    train = generate_data(_cfg(42, 1024))
    train2 = generate_data(_cfg(44, 1024, dist="laplace"))
    val = generate_data(_cfg(43, 256, attenuate=False))
    model = make_model(50, 64, 32)
    res = train_gaussian(
        model,
        {"x": train["x"], "y": train2["y"]},
        jnp.asarray(val["x"]), jnp.asarray(val["y"]),
        mode="x", lr=1e-3, batch_size=128, num_steps=40, seed=0, chunk=20,
    )
    assert res.history["val/loss_x"][-1] < res.history["val/loss_x"][0]


@pytest.mark.heavy
def test_train_determinism():
    train = generate_data(_cfg(42, 512))
    val = generate_data(_cfg(43, 128, attenuate=False))
    outs = []
    for _ in range(2):
        model = make_model(50, 32, 16)
        res = train_gaussian(
            model, {"x": train["x"], "y": train["y"]},
            jnp.asarray(val["x"]), jnp.asarray(val["y"]),
            mode="xy", batch_size=64, num_steps=10, seed=0, chunk=5,
        )
        outs.append(res.history["train/loss"])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)


def test_cli_end_to_end(tmp_path):
    from uml_tpu.cli.gaussian import build_parser, main

    args = build_parser().parse_args([
        "--train_num_samples", "512", "--val_num_samples", "128",
        "--num_steps", "20", "--dim_common", "32", "--dim_latent", "16",
        "--batch_size", "64", "--outdir", str(tmp_path),
    ])
    summary = main(args)
    run_dir = tmp_path / "mode_xy-seed_0-tag_default"
    assert (run_dir / "results.json").exists()
    assert (run_dir / "metrics.jsonl").exists()
    saved = json.loads((run_dir / "results.json").read_text())
    assert saved["val_loss_x"] == pytest.approx(summary["val_loss_x"])
    # metrics.jsonl has one row per step plus config header
    lines = (run_dir / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 21
