"""Checkpoint/resume tests: interrupted training resumes to the same result."""

import numpy as np
import pytest

from uml_tpu.core.checkpoint import TrainCheckpointer
from uml_tpu.models.uml_head import UMLHead
from uml_tpu.train.optim import build_optimizer, build_schedule
from uml_tpu.train.supervised import CyclicBatcher, eval_batches, train


def _toy(n=80, d=8, c=3, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((c, d)) * 3
    labels = np.repeat(np.arange(c), n // c)
    feats = centers[labels] + rng.standard_normal((len(labels), d))
    return feats.astype(np.float32), labels.astype(np.int64)


@pytest.mark.heavy
def test_checkpointer_roundtrip(tmp_path):
    ck = TrainCheckpointer(str(tmp_path / "ck"))
    state = {"a": np.arange(6.0).reshape(2, 3), "step": 7}
    ck.save(7, state)
    assert ck.latest_step() == 7
    step, restored = ck.restore_latest(state)
    assert step == 7
    np.testing.assert_array_equal(restored["a"], state["a"])
    ck.close()
    # disabled checkpointer is a no-op
    off = TrainCheckpointer(None)
    assert not off.enabled
    assert off.restore_latest(state) == (None, None)


@pytest.mark.heavy
def test_train_resume_matches_uninterrupted(tmp_path):
    feats, labels = _toy()
    val = eval_batches(feats[:30], labels[:30], 16)

    def run(ckpt_dir, max_iters, resume=False):
        model = UMLHead(feat_dim=8, num_classes=3, logit_scale=0.0)
        opt = build_optimizer("adamw", build_schedule(0.01, "cosine", 0, 60), 0.0)
        ck = TrainCheckpointer(ckpt_dir) if ckpt_dir else None
        return train(
            model,
            CyclicBatcher(feats, labels, 16, seed=0),
            CyclicBatcher(feats, labels, 16, seed=1),
            val,
            optimizer=opt, max_iters=max_iters, eval_freq=20, patience=100,
            checkpointer=ck, ckpt_every=10,
        )

    # uninterrupted 60-iter run
    ref = run(None, 60)

    # run 30 iters with checkpointing, then "restart" and run to 60
    ckdir = str(tmp_path / "resume")
    run(ckdir, 30)
    resumed = run(ckdir, 60)

    assert resumed["val_acc"] == pytest.approx(ref["val_acc"], abs=1e-6)
    for k in ref["model"]:
        np.testing.assert_allclose(resumed["model"][k], ref["model"][k],
                                   atol=1e-5)
