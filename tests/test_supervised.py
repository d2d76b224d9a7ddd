"""Supervised UML finetune pipeline tests (feature-space path, CPU-fast)."""

import json
import os

import numpy as np
import pytest

from uml_tpu.models.uml_head import UMLHead
from uml_tpu.train.optim import HYPER_DICT, build_optimizer, build_schedule
from uml_tpu.train.supervised import CyclicBatcher, eval_batches, make_validate, train


def test_schedule_warmup_and_cosine():
    sched = build_schedule(lr=0.1, lr_scheduler="cosine", warmup_iter=10,
                           max_iter=100, warmup_type="linear", warmup_lr=1e-5)
    assert float(sched(0)) == pytest.approx(1e-5)
    assert float(sched(5)) == pytest.approx(0.1 * 5 / 10)
    assert float(sched(10)) == pytest.approx(0.1)  # cosine step 0
    assert float(sched(60)) == pytest.approx(0.1 * 0.5 * (1 + np.cos(np.pi * 0.5)),
                                             abs=1e-6)
    lin = build_schedule(0.1, "linear", 0, 100)
    assert float(lin(50)) == pytest.approx(0.05)
    with pytest.raises(ValueError):
        build_schedule(0.1, "exp", 0, 10)


def test_hyper_dict_has_reference_grids():
    for name in ("full_ds_full_model_finetune", "clip_linear", "linear", "audio"):
        assert name in HYPER_DICT
        assert HYPER_DICT[name]["warmup_iter"] == 50


def test_cyclic_batcher_pads_and_reshuffles():
    x = np.arange(10, dtype=np.float32).reshape(10, 1)
    y = np.arange(10, dtype=np.int64)
    it = iter(CyclicBatcher(x, y, batch_size=4, seed=0))
    seen = []
    for _ in range(3):  # one epoch: 4+4+2(padded)
        xb, yb, wb = next(it)
        assert xb.shape == (4, 1) and wb.shape == (4,)
        seen.extend(yb[wb > 0].tolist())
    assert sorted(seen) == list(range(10))
    # second epoch is a different order
    second = []
    for _ in range(3):
        _, yb, wb = next(it)
        second.extend(yb[wb > 0].tolist())
    assert sorted(second) == list(range(10))
    assert second != seen


def test_uml_head_zero_shot_init_and_scales():
    model = UMLHead(feat_dim=8, num_classes=3, logit_scale=float(np.log(1 / 0.07)))
    params = model.init_params()
    text_feats = np.eye(8, dtype=np.float32)[:6]
    labels = np.array([0, 0, 1, 1, 2, 2])
    params = model.zero_shot_init(params, text_feats, labels)
    w = np.asarray(params["head_w"])  # [8, 3]
    np.testing.assert_allclose(np.linalg.norm(w, axis=0), 1.0, atol=1e-5)
    # forward scales by exp(logit_scale)
    img_logits, txt_logits = model.forward(params, text_feats[:2], text_feats[:2])
    assert img_logits.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(img_logits), np.asarray(txt_logits),
                               atol=1e-5)


def test_uml_head_img_proj():
    model = UMLHead(feat_dim=8, num_classes=3, text_indim=4)
    params = model.init_params()
    assert params["img_proj_w"].shape == (8, 4)
    assert params["head_w"].shape == (4, 3)
    logits, _ = model.forward(params, np.ones((2, 8), np.float32))
    assert logits.shape == (2, 3)


def _toy_problem(n_per_class=30, n_classes=4, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_classes, dim)) * 3
    feats, labels = [], []
    for c in range(n_classes):
        feats.append(centers[c] + rng.standard_normal((n_per_class, dim)))
        labels.append(np.full(n_per_class, c))
    return (np.concatenate(feats).astype(np.float32),
            np.concatenate(labels).astype(np.int64), centers)


def test_train_crossmodal_learns():
    img, img_lab, centers = _toy_problem(seed=0)
    txt, txt_lab, _ = _toy_problem(n_per_class=10, seed=1)
    # make text features live in the same space (same centers)
    txt = (centers[txt_lab] +
           0.5 * np.random.default_rng(2).standard_normal(txt.shape)).astype(np.float32)

    model = UMLHead(feat_dim=16, num_classes=4, logit_scale=0.0)
    sched = build_schedule(0.01, "cosine", 5, 300)
    opt = build_optimizer("adamw", sched, 0.0)
    val = eval_batches(img[:40], img_lab[:40], 16)

    out = train(
        model,
        CyclicBatcher(img, img_lab, 16, seed=0),
        CyclicBatcher(txt, txt_lab, 16, seed=1),
        val,
        optimizer=opt, max_iters=300, alpha=1.0, eval_freq=50, patience=10,
    )
    assert out["val_acc"] > 0.9
    assert out["iter"] is not None and out["model"] is not None


def test_train_text_only_mode_works():
    # the reference crashes on modality='text' (finetune.py:181); we support it
    txt, txt_lab, _ = _toy_problem(seed=3)
    model = UMLHead(feat_dim=16, num_classes=4, logit_scale=0.0)
    opt = build_optimizer("adamw", build_schedule(0.01, "cosine", 0, 100), 0.0)
    val = eval_batches(txt[:40], txt_lab[:40], 16)
    out = train(model, None, CyclicBatcher(txt, txt_lab, 16, seed=0), val,
                optimizer=opt, max_iters=100, eval_freq=25, patience=10)
    assert out["val_acc"] > 0.9


def test_validate_counts_only_real_samples():
    model = UMLHead(feat_dim=4, num_classes=2, logit_scale=0.0)
    params = model.init_params()
    feats = np.random.default_rng(0).standard_normal((5, 4)).astype(np.float32)
    labels = np.array([0, 1, 0, 1, 0], dtype=np.int64)
    batches = eval_batches(feats, labels, 4)  # 4 + 1 padded to 4
    validate = make_validate(model, 4)
    _, acc = validate(params, batches)
    assert 0.0 <= acc <= 1.0


def run_finetune_cli_e2e(root, encoder="ViT-B/32"):
    """generate_fewshot -> features -> finetune CLIs on the synthetic
    caltech fixture with a random-init encoder.  Shared by this test and
    tools/tpu_smoke.py (which drives the same flow on the live backend)
    so CLI-flag changes only need one update.
    Returns (results, best_val, best_test)."""
    from tests.test_data_fewshot import make_caltech_fixture
    from uml_tpu.cli import features as feat
    from uml_tpu.cli import finetune as ft
    from uml_tpu.cli import generate_fewshot as gf

    make_caltech_fixture(root)
    gf.main(gf.build_parser().parse_args([
        "--data_dir", root, "--indices_dir", f"{root}/indices",
        "--dataset", "caltech101", "--train-shot", "3", "--seed", "1"]))

    common = ["--data_dir", root, "--indices_dir", f"{root}/indices",
              "--feature_dir", f"{root}/features", "--dataset", "caltech101",
              "--clip-encoder", encoder, "--train-shot", "3", "--seed", "1",
              "--allow-random-init"]
    args = feat.build_parser().parse_args(
        common + ["--text-augmentation", "hand_crafted", "--batch-size", "16"])
    args.overwrite = False
    args.force_rerun = False
    feat.main(args)

    args = ft.build_parser().parse_args(
        common + ["--result_dir", f"{root}/experiments",
                  "--text_type", "hand_crafted", "--modality", "crossmodal",
                  "--alpha", "0.5", "--hyperparams", "smoke"])
    args.overwrite = False
    args.force_rerun = False
    return ft.main(args)


@pytest.mark.slow
def test_finetune_cli_end_to_end(tmp_path):
    """Full CLI path on a synthetic fixture with random-init ViT-B/32."""
    root = str(tmp_path)
    results, best_val, best_test = run_finetune_cli_e2e(root)
    assert 0.0 <= best_val <= 1.0 and len(results["val_acc"]) == 1

    # artifacts in the reference scheme
    exp = (f"{root}/experiments/caltech101-shot_3-seed_1/ViT-B-32/"
           "finetune-text_hand_crafted-image_crop_-alpha_0.5/zeroshot")
    assert os.path.exists(f"{exp}/results.pth")
    assert os.path.exists(f"{exp}/log.txt")
    sub = [d for d in os.listdir(exp) if d.startswith("optim_")]
    assert len(sub) == 1
    assert os.path.exists(f"{exp}/{sub[0]}/test_result.pth")

    # idempotent rerun skips (features .pth and test_result.pth exist)
    run_finetune_cli_e2e(root)

    # collect_results reads the artifacts
    from uml_tpu.cli.collect_results import collect_results
    summary = collect_results(
        datasets="caltech101", seeds=1, encoders="ViT-B-32", train_shots=3,
        init_types="zeroshot",
        modality_types="finetune-text_hand_crafted-image_crop_-alpha_0.5",
        experiments_dir=f"{root}/experiments")
    assert len(summary) == 1
    info = next(iter(summary.values()))
    assert info["n_seeds"] == 1 and 0.0 <= info["mean_test_acc"] <= 1.0


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not present")
def test_reference_collect_results_ingests_our_artifacts(tmp_path):
    """Drop-in artifact interop: the REFERENCE's own collect_results.py
    (vision_language/collect_results.py:14-129) ingests the artifact
    tree OUR finetune CLI writes and reproduces our best-val selection —
    the torch-format results.pth schema, the experiments/ path scheme,
    AND the hparam_str reconstruction of the per-combo subdir all have
    to line up for its best_path to resolve."""
    import importlib.util

    root = str(tmp_path)
    results, best_val, best_test = run_finetune_cli_e2e(root)

    spec = importlib.util.spec_from_file_location(
        "ref_collect_results",
        "/root/reference/vision_language/collect_results.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    summary = ref.collect_results(
        datasets="caltech101", seeds=1, encoders="ViT-B-32",
        train_shots=3, init_types="zeroshot",
        modality_types="finetune-text_hand_crafted-image_crop_-alpha_0.5",
        experiments_dir=f"{root}/experiments")
    assert len(summary) == 1
    info = next(iter(summary.values()))
    # the reference's best-val selection reproduces the CLI's own report
    assert info["n_seeds"] == 1 and info["best_seed"] == 1
    np.testing.assert_allclose(info["mean_val_acc"], best_val, atol=1e-8)
    np.testing.assert_allclose(info["mean_test_acc"], best_test, atol=1e-8)
    # its hparam_str reconstruction must resolve to OUR saved artifact
    assert os.path.isfile(info["best_path"]), info["best_path"]

    # and OUR collect_results agrees with the reference's on the same tree
    from uml_tpu.cli.collect_results import collect_results
    ours = collect_results(
        datasets="caltech101", seeds=1, encoders="ViT-B-32",
        train_shots=3, init_types="zeroshot",
        modality_types="finetune-text_hand_crafted-image_crop_-alpha_0.5",
        experiments_dir=f"{root}/experiments")
    mine = next(iter(ours.values()))
    for k in ("mean_val_acc", "std_val_acc", "mean_test_acc",
              "std_test_acc", "n_seeds", "best_seed"):
        np.testing.assert_allclose(mine[k], info[k], atol=1e-12, err_msg=k)
