"""End-to-end smoke of all three experiment families on the live backend.

Runs the same flows the CPU test suite covers, but on whatever backend is
live (the real TPU chip under the axon relay) with synthetic fixtures and
random-init encoders — no datasets or pretrained weights needed:

  1. vision_language: generate_fewshot -> features -> finetune CLIs on a
     synthetic caltech-format fixture (random-init ViT-B/32), asserting
     the run learns past chance and writes the reference artifact scheme.
  2. Gaussian_experiment: the gaussian CLI end to end.
  3. MultiBench: self-supervised seq-UML training + probe eval on a
     synthetic mosi-format pickle.
  4. int8 serving: W8A8 extraction vs bf16 on the live backend (this is
     where the Pallas int8 kernels actually run on the MXU).

Usage: python tools/tpu_smoke.py   (~10 min first run; compile-cached after)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def smoke_vision_language(tmp):
    # same flow as tests/test_supervised.py::test_finetune_cli_end_to_end,
    # shared through run_finetune_cli_e2e so CLI-flag changes stay in sync
    from tests.test_supervised import run_finetune_cli_e2e

    root = os.path.join(tmp, "vl")
    os.makedirs(root)
    _, best_val, best_test = run_finetune_cli_e2e(root)
    assert best_val > 1 / 3, f"did not learn past chance: {best_val}"
    print(f"[3/4] vision_language finetune e2e: "
          f"val={best_val:.3f} test={best_test:.3f} OK")


def smoke_gaussian(tmp):
    from uml_tpu.cli.gaussian import build_parser, main

    args = build_parser().parse_args([
        "--train_num_samples", "512", "--val_num_samples", "128",
        "--num_steps", "20", "--dim_common", "32", "--dim_latent", "16",
        "--batch_size", "64", "--outdir", os.path.join(tmp, "gauss")])
    summary = main(args)
    assert all(k in summary for k in ("val_loss_x", "val_loss_y", "val_cka"))
    print(f"[1/4] gaussian e2e: val_loss_x={summary['val_loss_x']:.4f} OK")


def smoke_multibench(tmp):
    from tests.test_multibench import make_affect_pickle
    from uml_tpu.cli.multibench import _affect_streams
    from uml_tpu.data.affect import load_affect
    from uml_tpu.models.seq_autoencoder import make_seq_uml
    from uml_tpu.train.selfsup import SelfSupTrainer, train_selfsup

    pkl = os.path.join(tmp, "mosi_data.pkl")
    make_affect_pickle(pkl)
    splits = load_affect(pkl)
    s1, s2, evals = _affect_streams(splits, None, 16)
    trainer = SelfSupTrainer(make_seq_uml(6, 10, 10), lr=1e-3, seed=0)
    _, score, _ = train_selfsup(
        trainer, s1, s2, evals, mode="xy", num_epochs=2, step_k=0,
        ds_name="mosi", eval_freq=100, capture=True)
    assert 0.0 <= score["test/score_xy"] <= 1.0
    print(f"[2/4] multibench selfsup e2e: "
          f"score_xy={score['test/score_xy']:.3f} OK")


def smoke_int8(tmp):
    """W8A8 serving mode on the live backend: extraction through the
    ClipEncoder API with --quant int8 semantics; features must stay
    within ~1e-2 cosine of the bf16 path (random-init tower)."""
    import numpy as np

    from uml_tpu.models.encoders import ClipEncoder

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (16, 224, 224, 3), dtype=np.uint8)
    f = ClipEncoder("ViT-B/32", allow_random_init=True).encode_images(imgs)
    q = ClipEncoder("ViT-B/32", allow_random_init=True,
                    quant="int8").encode_images(imgs)
    cos = np.sum(f * q, -1) / (np.linalg.norm(f, axis=-1)
                               * np.linalg.norm(q, axis=-1) + 1e-12)
    assert np.min(cos) > 0.98, f"int8 drifted from bf16: min cos {cos.min()}"
    print(f"[4/4] int8 extraction vs bf16: min cos={np.min(cos):.5f} OK")


def main():
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    print(f"backend: {jax.default_backend()} ({len(jax.devices())} device)")
    tmp = tempfile.mkdtemp(prefix="uml_tpu_smoke_")
    smoke_gaussian(tmp)
    smoke_multibench(tmp)
    smoke_vision_language(tmp)
    smoke_int8(tmp)
    print("all three experiment families (+ int8 serving) pass on this backend")


if __name__ == "__main__":
    main()
