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


def run_fewshot_probe(args, dataset):
    """BASELINE config #2/#3: features + 16-shot crossmodal finetune."""
    from uml_tpu.cli import features as feat
    from uml_tpu.cli import finetune as ft
    from uml_tpu.cli import generate_fewshot as gf

    common = ["--data_dir", args.data_dir, "--indices_dir", args.indices_dir,
              "--feature_dir", args.feature_dir, "--dataset", dataset,
              "--clip-encoder", "ViT-B/16", "--train-shot", "16",
              "--seed", str(args.seed)]

    a = gf.build_parser().parse_args(
        ["--data_dir", args.data_dir, "--indices_dir", args.indices_dir,
         "--dataset", dataset, "--train-shot", "16", "--seed", str(args.seed)])
    gf.main(a)

    a = feat.build_parser().parse_args(
        common + ["--text-augmentation", "hand_crafted",
                  "--descriptor_type", "gpt3_cupl"])
    a.overwrite, a.force_rerun = False, False
    feat.main(a)

    a = ft.build_parser().parse_args(
        common + ["--result_dir", args.result_dir, "--text_type", "gpt3_cupl",
                  "--modality", "crossmodal", "--alpha", "1.0",
                  "--hyperparams", "clip_linear", "--eval_test"])
    a.overwrite, a.force_rerun = False, False
    _, best_val, best_test = ft.main(a)
    print(f"[{dataset}] 16-shot crossmodal: val {best_val:.4f} "
          f"test {best_test:.4f}")
    return best_test


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
    args = p.parse_args()

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
