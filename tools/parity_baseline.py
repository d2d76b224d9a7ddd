"""BASELINE.json parity harness.

Runs the BASELINE configs end-to-end on an environment that has pretrained
weights (UML_CLIP_WEIGHTS_DIR and/or the HF cache) and real datasets, and
prints the accuracy numbers next to the reference targets.  In the
zero-egress build container this exits early with a clear report of what is
missing — the point is that parity measurement is ONE command once assets
exist.

    python tools/parity_baseline.py --data_dir /data --indices_dir indices

Configs covered (BASELINE.json):
  #1 Gaussian synthetic (always runnable, CPU ok)
  #2 Caltech101/OxfordPets 16-shot linear probe over cached ViT-B/16 features
  #3 ImageNet 16-shot UML finetune with CUPL descriptors
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_assets(args):
    missing = []
    from uml_tpu.models.encoders import clip_weights_path

    if clip_weights_path("ViT-B/16") is None:
        missing.append("CLIP ViT-B/16 weights (set UML_CLIP_WEIGHTS_DIR)")
    for ds in args.datasets:
        from uml_tpu.data.registry import dataset_classes

        try:
            dataset_classes[ds](args.data_dir)
        except Exception as e:
            missing.append(f"dataset {ds}: {type(e).__name__} {e}")
    return missing


def run_gaussian():
    """BASELINE config #1: always runnable."""
    import jax.numpy as jnp

    from uml_tpu.data.gaussian import generate_data
    from uml_tpu.train.gaussian import make_model, train_gaussian

    cfg = dict(dim_c=10, dim_x=5, dim_y=5, dim_obs=50, noise_std=0.09,
               attenuate_x=True, attenuation=0.05,
               shared_latent_distribution_type="gaussian")
    train = generate_data({"seed": 42, "num_samples": 10000, **cfg})
    val = generate_data({"seed": 43, "num_samples": 2000, **cfg,
                         "attenuate_x": False})
    out = {}
    for mode in ("xy", "x"):
        n = 10000
        pools = ({"x": train["x"][: n // 2], "y": train["y"][: n - n // 2]}
                 if mode == "xy" else {"x": train["x"], "y": train["y"]})
        res = train_gaussian(
            make_model(50, 128, 10), pools,
            jnp.asarray(val["x"]), jnp.asarray(val["y"]),
            mode=mode, num_steps=2000, batch_size=512, seed=0)
        out[mode] = dict(val_loss_x=res.final_val_loss_x, cka=res.final_cka,
                         mknn=res.final_mknn)
    print("[gaussian] xy vs x val_loss_x:",
          round(out["xy"]["val_loss_x"], 4), "vs",
          round(out["x"]["val_loss_x"], 4),
          "| xy cka:", round(out["xy"]["cka"], 4))
    return out


def run_fewshot_probe(args, dataset, dry_run=False):
    """BASELINE config #2/#3: features + 16-shot crossmodal finetune.

    ``dry_run``: random-init encoder + smoke hyperparams — the plumbing
    proof (generate_fewshot -> features -> finetune -> accuracy) on an
    environment without pretrained weights; accuracies are meaningless,
    completing without error is the point."""
    from uml_tpu.cli import features as feat
    from uml_tpu.cli import finetune as ft
    from uml_tpu.cli import generate_fewshot as gf

    shot = "3" if dry_run else "16"
    common = ["--data_dir", args.data_dir, "--indices_dir", args.indices_dir,
              "--feature_dir", args.feature_dir, "--dataset", dataset,
              "--clip-encoder", "ViT-B/16", "--train-shot", shot,
              "--seed", str(args.seed)]
    if dry_run:
        common.append("--allow-random-init")

    a = gf.build_parser().parse_args(
        ["--data_dir", args.data_dir, "--indices_dir", args.indices_dir,
         "--dataset", dataset, "--train-shot", shot,
         "--seed", str(args.seed)])
    gf.main(a)

    a = feat.build_parser().parse_args(
        common + ["--text-augmentation", "hand_crafted"]
        + ([] if dry_run else ["--descriptor_type", "gpt3_cupl"]))
    a.overwrite, a.force_rerun = False, False
    feat.main(a)

    text_type = "hand_crafted" if dry_run else "gpt3_cupl"
    hyper = "smoke" if dry_run else "clip_linear"
    a = ft.build_parser().parse_args(
        common + ["--result_dir", args.result_dir, "--text_type", text_type,
                  "--modality", "crossmodal", "--alpha", "1.0",
                  "--hyperparams", hyper, "--eval_test"])
    a.overwrite, a.force_rerun = False, False
    _, best_val, best_test = ft.main(a)
    tag = " (dry-run: random-init, accuracy meaningless)" if dry_run else ""
    print(f"[{dataset}] {shot}-shot crossmodal: val {best_val:.4f} "
          f"test {best_test:.4f}{tag}")
    return best_test


def run_dry(args):
    """--dry_run: prove the whole accuracy-parity plumbing WITHOUT assets.

    Synthesizes a tiny caltech-layout image fixture (the same one the
    test suite uses), then runs run_fewshot_probe on it with a
    random-init ViT-B/16 — exactly the code path that will compute the
    BASELINE.md +-0.3%% check the day real weights/data are mounted."""
    import tempfile

    from tests.test_data_fewshot import make_caltech_fixture

    root = tempfile.mkdtemp(prefix="uml_parity_dry_")
    make_caltech_fixture(root)
    args.data_dir = root
    args.indices_dir = os.path.join(root, "indices")
    args.feature_dir = os.path.join(root, "features")
    args.result_dir = os.path.join(root, "experiments")
    run_fewshot_probe(args, "caltech101", dry_run=True)
    print("[dry-run] plumbing OK: generate_fewshot -> features -> "
          "finetune -> collect completed on the synthetic fixture")


def main():
    p = argparse.ArgumentParser(description="BASELINE parity harness")
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--indices_dir", default="./indices")
    p.add_argument("--feature_dir", default="./features")
    p.add_argument("--result_dir", default="./experiments")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--datasets", nargs="+",
                   default=["caltech101", "oxford_pets", "imagenet"])
    p.add_argument("--skip_gaussian", action="store_true")
    p.add_argument("--dry_run", action="store_true",
                   help="prove the parity plumbing on a synthetic fixture "
                        "with random-init weights (no assets needed)")
    args = p.parse_args()

    if args.dry_run:
        run_dry(args)
        return

    if not args.skip_gaussian:
        run_gaussian()

    missing = check_assets(args)
    if missing:
        print("Cannot run the accuracy-parity configs here; missing assets:")
        for m in missing:
            print("  -", m)
        print("Populate them and re-run; everything else is one command.")
        return
    for ds in args.datasets:
        run_fewshot_probe(args, ds)


if __name__ == "__main__":
    main()
