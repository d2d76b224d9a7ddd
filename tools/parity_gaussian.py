"""End-to-end numeric parity: Gaussian experiment vs the reference (torch).

Runs the reference Gaussian_experiment training loop (torch CPU, the actual
model.py/data.py/dataset.py from /root/reference) and our jitted
train_gaussian on IDENTICAL data, IDENTICAL initial weights (torch state
dict ported into flax params), and the IDENTICAL batch-index sequence
(replayed from the reference DataLoader's seeded sampler), then compares
the per-step loss trajectories and the final CKA/mutual-kNN.

Usage: python tools/parity_gaussian.py [--steps 60] [--json out.json]

This is what `tests/test_parity_reference.py::test_gaussian_trajectory_parity`
runs in CI (marked slow, skipped when /root/reference is absent).
"""

from __future__ import annotations

import argparse
import json
import sys
import types

import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DIR = "/root/reference/Gaussian_experiment"


def _stub_wandb():
    """The reference imports wandb at module import; keep it offline."""
    if "wandb" in sys.modules:
        return
    stub = types.ModuleType("wandb")

    class _Run:
        def log(self, *a, **k):
            pass

        def finish(self):
            pass

    stub.init = lambda *a, **k: _Run()
    stub.log = lambda *a, **k: None
    sys.modules["wandb"] = stub

    # reference metrics.py imports torchaudio only for edit_distance
    # (cycle-consistency metrics we don't exercise); zero-egress stub
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        taf = types.ModuleType("torchaudio.functional")
        taf.edit_distance = lambda *a, **k: 0
        ta.functional = taf
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.functional"] = taf


def run_reference(cfg, steps):
    """Reference loop, verbatim semantics (main.py:31-150), recording
    per-step losses, metrics, and the sampled batch indices."""
    _stub_wandb()
    sys.path.insert(0, REF_DIR)
    import torch
    from torch.utils.data import DataLoader

    from data import generate_data          # reference data.py
    from dataset import UnpairedDataset     # reference dataset.py
    from main import cka, mknn              # reference metric wrappers
    from model import SharedAutoencoder     # reference model.py
    from utils import make_reproducible

    torch.set_num_threads(1)
    train = generate_data(dict(cfg, seed=42, attenuate_x=True,
                               shared_latent_distribution_type="gaussian"))
    val = generate_data(dict(cfg, num_samples=cfg["val_num_samples"],
                             seed=43, attenuate_x=False,
                             shared_latent_distribution_type="gaussian"))
    n = cfg["num_samples"]
    data_x = train["x"][: n // 2]
    data_y = train["y"][n // 2:]

    class RecordingDataset(UnpairedDataset):
        def __init__(self, dx, dy):
            super().__init__(dx, dy)
            self.record = []

        def __getitem__(self, idx):
            self.record.append(int(idx))
            return super().__getitem__(idx)

    dataset = RecordingDataset(data_x, data_y)
    g = torch.Generator()
    g.manual_seed(42)
    loader = DataLoader(dataset, batch_size=cfg["batch_size"], shuffle=True,
                        drop_last=True, generator=g)

    make_reproducible(0)
    model = SharedAutoencoder(dim_obs=cfg["dim_obs"],
                              dim_common=cfg["dim_common"],
                              dim_latent=cfg["dim_latent"])
    state0 = {k: v.detach().clone() for k, v in model.state_dict().items()}
    opt = torch.optim.Adam(model.parameters(), lr=cfg["lr"])

    val_x = val["x"]
    val_y = val["y"]
    hist = {"train/loss_x": [], "train/loss_y": [], "val/loss_x": [],
            "val/loss_y": [], "val/cka": [], "val/mknn": []}
    it = iter(loader)
    done = 0
    while done < steps:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            continue
        opt.zero_grad()
        loss_x, loss_y, _, _ = model(batch["x"], batch["y"])
        loss = loss_x + loss_y
        loss.backward()
        opt.step()
        hist["train/loss_x"].append(float(loss_x))
        hist["train/loss_y"].append(float(loss_y))
        with torch.no_grad():
            model.eval()
            _, _, rx, ry = model(x=val_x, y=val_y)
            hist["val/loss_x"].append(float(model.loss_fn(rx, val_x)))
            hist["val/loss_y"].append(float(model.loss_fn(ry, val_y)))
            ex, ey = model.get_embeddings(x=val_x, y=val_y)
            hist["val/cka"].append(float(cka(ex, ey)))
            hist["val/mknn"].append(float(mknn(ex, ey)))
            model.train()
        done += 1

    batch_indices = np.asarray(dataset.record[: steps * cfg["batch_size"]])
    return {
        "hist": {k: np.asarray(v) for k, v in hist.items()},
        "state0": state0,
        "indices": batch_indices.reshape(steps, cfg["batch_size"]),
        "data_x": data_x.numpy(), "data_y": data_y.numpy(),
        "val_x": val_x.numpy(), "val_y": val_y.numpy(),
        "len_x": len(data_x), "len_y": len(data_y),
    }


def port_state_dict(state0):
    """torch SharedAutoencoder state_dict -> flax params for ours."""
    import jax.numpy as jnp

    def lin(prefix):
        return {"kernel": jnp.asarray(state0[f"{prefix}.weight"].numpy().T),
                "bias": jnp.asarray(state0[f"{prefix}.bias"].numpy())}

    return {"params": {
        "in_head_x": lin("in_head_x"),
        "in_head_y": lin("in_head_y"),
        "enc1": lin("shared_encoder.0"),
        "enc2": lin("shared_encoder.2"),
        "dec1": lin("shared_decoder.0"),
        "dec2": lin("shared_decoder.2"),
        "out_head_x": lin("out_head_x"),
        "out_head_y": lin("out_head_y"),
    }}


class ReplayStream:
    """Feed the reference DataLoader's recorded indices into train_gaussian."""

    def __init__(self, indices, len_x, len_y):
        self.indices = indices
        self.len_x = len_x
        self.len_y = len_y

    def batch_chunks(self, num_steps, chunk):
        import jax.numpy as jnp

        idx = self.indices[:num_steps]
        for i in range(0, len(idx), chunk):
            part = idx[i: i + chunk]
            yield (jnp.asarray((part % self.len_x).astype(np.int32)),
                   jnp.asarray((part % self.len_y).astype(np.int32)))


def run_ours(ref, cfg, steps):
    from uml_tpu.models.shared_autoencoder import SharedAutoencoder
    from uml_tpu.train.gaussian import train_gaussian

    model = SharedAutoencoder(dim_obs=cfg["dim_obs"],
                              dim_common=cfg["dim_common"],
                              dim_latent=cfg["dim_latent"])
    result = train_gaussian(
        model,
        {"x": ref["data_x"], "y": ref["data_y"]},
        ref["val_x"], ref["val_y"],
        mode="xy", lr=cfg["lr"], batch_size=cfg["batch_size"],
        num_steps=steps, chunk=min(20, steps),
        stream=ReplayStream(ref["indices"], ref["len_x"], ref["len_y"]),
        init_params=port_state_dict(ref["state0"]),
    )
    return result.history


def compare(ref_hist, ours_hist, steps):
    report = {}
    for key, tol in (("train/loss_x", 2e-3), ("train/loss_y", 2e-3),
                     ("val/loss_x", 2e-3), ("val/loss_y", 2e-3),
                     ("val/cka", 5e-3), ("val/mknn", 5e-2)):
        a = np.asarray(ref_hist[key][:steps], np.float64)
        b = np.asarray(ours_hist[key][:steps], np.float64)
        rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-6)
        report[key] = {
            "ref_first": float(a[0]), "ours_first": float(b[0]),
            "ref_last": float(a[-1]), "ours_last": float(b[-1]),
            "max_rel_err": float(rel.max()),
            "tol": tol,
            "ok": bool(rel.max() <= tol),
        }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--json", type=str, default="")
    args = ap.parse_args()

    cfg = {"num_samples": 4096, "val_num_samples": 512, "dim_obs": 50,
           "dim_common": 100, "dim_latent": 128, "batch_size": 64,
           "lr": 1e-3,
           # DGP keys (reference data.py:29-61 / train.yaml defaults)
           "dim_c": 5, "dim_x": 10, "dim_y": 10, "noise_std": 0.1,
           "attenuation": 0.05}
    ref = run_reference(cfg, args.steps)
    ours = run_ours(ref, cfg, args.steps)
    report = compare(ref["hist"], ours, args.steps)
    for k, v in report.items():
        print(f"{k:16s} ref {v['ref_first']:.6f}->{v['ref_last']:.6f} | "
              f"ours {v['ours_first']:.6f}->{v['ours_last']:.6f} | "
              f"max rel err {v['max_rel_err']:.2e} "
              f"{'OK' if v['ok'] else 'FAIL (tol %g)' % v['tol']}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
    if not all(v["ok"] for v in report.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
