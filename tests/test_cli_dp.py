"""Data-parallel wiring: CLI-reachable paths must match single-device.

These run on the 8-virtual-CPU-device mesh (tests/conftest.py); the same
code path scales over ICI on real multi-chip TPU.
"""

import jax
import numpy as np
import pytest

from uml_tpu.core.meshes import create_mesh, maybe_shard_batch


def test_mesh_from_flag():
    from uml_tpu.core.meshes import mesh_from_flag

    mesh = mesh_from_flag("auto")
    assert mesh is not None and mesh.shape["data"] == 8
    assert mesh_from_flag("off") is None


def test_maybe_shard_batch_handles_ragged_and_scalars():
    mesh = create_mesh()
    tree = (np.zeros((16, 3)), np.zeros((7, 2)), np.float32(1.0))
    a, b, c = maybe_shard_batch(mesh, tree)
    assert "data" in str(a.sharding.spec)
    assert b.sharding.is_fully_replicated  # 7 % 8 != 0 -> replicated
    assert c.sharding.is_fully_replicated
    assert maybe_shard_batch(None, tree) is tree


def _toy(seed=0, n=128, d=16, classes=4):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((classes, d))
    labels = rng.integers(0, classes, n)
    feats = (w[labels] + 0.1 * rng.standard_normal((n, d))).astype(np.float32)
    return feats, labels.astype(np.int64)


@pytest.mark.heavy
def test_supervised_train_dp_matches_single_device():
    from uml_tpu.models.uml_head import UMLHead
    from uml_tpu.train.optim import build_optimizer, build_schedule
    from uml_tpu.train.supervised import CyclicBatcher, eval_batches, train

    def run(mesh):
        img, img_lab = _toy(seed=0)
        txt, txt_lab = _toy(seed=1)
        model = UMLHead(feat_dim=16, num_classes=4, logit_scale=0.0)
        opt = build_optimizer("adamw", build_schedule(0.01, "cosine", 0, 100),
                              0.0)
        val = eval_batches(img[:40], img_lab[:40], 16)
        out = train(model, CyclicBatcher(img, img_lab, 16, seed=0),
                    CyclicBatcher(txt, txt_lab, 16, seed=1), val,
                    optimizer=opt, max_iters=60, alpha=1.0, eval_freq=30,
                    patience=10, mesh=mesh)
        return out

    single = run(None)
    dp = run(create_mesh())
    assert dp["val_acc"] == pytest.approx(single["val_acc"], abs=1e-6)
    for a, b in zip(jax.tree.leaves(single["model"]),
                    jax.tree.leaves(dp["model"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.heavy
def test_selfsup_train_dp_matches_single_device(tmp_path):
    from tests.test_multibench import make_affect_pickle
    from uml_tpu.cli.multibench import _affect_streams
    from uml_tpu.data.affect import load_affect
    from uml_tpu.models.seq_autoencoder import make_seq_uml
    from uml_tpu.train.selfsup import SelfSupTrainer, train_selfsup

    path = str(tmp_path / "mosi_data.pkl")
    make_affect_pickle(path)
    splits = load_affect(path)

    def run(mesh):
        s1, s2, evals = _affect_streams(splits, None, 16)
        model = make_seq_uml(6, 10, 10)
        trainer = SelfSupTrainer(model, lr=1e-3, seed=0)
        _, score, _ = train_selfsup(
            trainer, s1, s2, evals, mode="xy", num_epochs=1,
            ds_name="mosi", eval_freq=1000, capture=False, mesh=mesh)
        return score

    single = run(None)
    dp = run(create_mesh())
    for k in ("test/score_x", "test/score_y", "test/score_xy"):
        assert dp[k] == pytest.approx(single[k], abs=0.02), k


@pytest.mark.heavy
def test_clip_encoder_dp_matches_single_device():
    from uml_tpu.models.encoders import ClipEncoder
    import jax.numpy as jnp

    imgs = np.random.default_rng(0).integers(
        0, 256, (16, 32, 32, 3), dtype=np.uint8)
    # tiny random-init config via monkeypatched build: use ViT-B/32 at full
    # size would be slow on CPU; use the real encoder with a tiny batch
    enc_single = ClipEncoder("ViT-B/32", dtype=jnp.float32,
                             allow_random_init=True, mesh=None)
    enc_dp = ClipEncoder("ViT-B/32", dtype=jnp.float32,
                         allow_random_init=True, mesh=create_mesh())
    imgs224 = np.random.default_rng(0).integers(
        0, 256, (16, 224, 224, 3), dtype=np.uint8)
    a = enc_single.encode_images(imgs224)
    b = enc_dp.encode_images(imgs224)
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4)
