"""End-to-end numeric parity: MultiBench self-supervised UML vs reference.

Two levels, both against the actual /root/reference/MultiBench code running
on torch CPU over an identical synthetic mosi-format pickle:

1. FORWARD PARITY (strict): the reference UML model's initial weights are
   ported into our SeqUML; eval-mode losses on one identical batch must
   match to float tolerance.  Validates the whole model stack end-to-end
   (projections, conv1d embed, 5x post-LN encoder layers, causal+padding
   masking, masked next-step MSE, the y-branch no-key-padding quirk).

2. TRAIN PARITY (statistical): the reference train() and our
   train_selfsup() run the full mosi recipe (batch 32, zdim 10, Adam 1e-4)
   for a few epochs from their own inits/dropout streams; final probe
   scores on the separable synthetic data must agree within tolerance.

Usage: python tools/parity_multibench.py [--epochs 3] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DIR = "/root/reference/MultiBench"


def _stub_modules():
    for name, attrs in (
        ("wandb", {"init": lambda *a, **k: None, "log": lambda *a, **k: None,
                   "config": types.SimpleNamespace(update=lambda *a, **k: None)}),
        ("torchvision", {"transforms": types.SimpleNamespace()}),
        ("torchaudio", {}),
        # get_data.py imports torchtext only for GloVe re-embedding in the
        # robust_test text path, which this harness never takes
        ("torchtext", {"vocab": types.SimpleNamespace(GloVe=None)}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    if "torchaudio.functional" not in sys.modules:
        taf = types.ModuleType("torchaudio.functional")
        taf.edit_distance = lambda *a, **k: 0
        sys.modules["torchaudio.functional"] = taf
        sys.modules["torchaudio"].functional = taf


def _patch_cuda(torch):
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.is_available = lambda: False


def make_mosi_pickle(path, n_train=256, n_eval=64, T=12, dx=20, dy=300,
                     seed=0):
    """mosi-schema pickle with a linearly separable shared latent."""
    rng = np.random.default_rng(seed)
    wx = rng.standard_normal((3, dx))
    wy = rng.standard_normal((3, dy))

    def split(n):
        latent = rng.standard_normal((n, 3))
        vision = (np.repeat(latent @ wx, T, 0).reshape(n, T, dx)
                  + 0.1 * rng.standard_normal((n, T, dx)))
        text = (np.repeat(latent @ wy, T, 0).reshape(n, T, dy)
                + 0.1 * rng.standard_normal((n, T, dy)))
        audio = rng.standard_normal((n, T, 5))
        # per-item 2D labels: the reference collate indexes label.shape[1]
        # (get_data.py:438), so the real pickles store labels as [N, 1, 1]
        labels = latent[:, 0].reshape(n, 1, 1) * 2.0
        return {"vision": vision.astype(np.float32),
                "audio": audio.astype(np.float32),
                "text": text.astype(np.float32),
                "labels": labels.astype(np.float32),
                "id": np.arange(n).reshape(n, 1)}

    data = {"train": split(n_train), "valid": split(n_eval),
            "test": split(n_eval)}
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return data


def port_uml_weights(state):
    """torch UML state_dict -> our SeqUML flax params."""
    import jax.numpy as jnp

    def lin(prefix):
        return {"kernel": jnp.asarray(state[f"{prefix}.weight"].numpy().T),
                "bias": jnp.asarray(state[f"{prefix}.bias"].numpy())}

    enc = {"embed": {"kernel": jnp.asarray(
        state["encoder.conv.weight"].numpy()[:, :, 0].T)}}
    n_layers = len({k.split(".")[3] for k in state
                    if k.startswith("encoder.transformer.layers.")})
    for i in range(n_layers):
        p = f"encoder.transformer.layers.{i}"
        enc[f"layers_{i}"] = {
            "qkv": {"kernel": jnp.asarray(
                        state[f"{p}.self_attn.in_proj_weight"].numpy().T),
                    "bias": jnp.asarray(
                        state[f"{p}.self_attn.in_proj_bias"].numpy())},
            "out_proj": lin(f"{p}.self_attn.out_proj"),
            "linear1": lin(f"{p}.linear1"),
            "linear2": lin(f"{p}.linear2"),
            "norm1": {"scale": jnp.asarray(state[f"{p}.norm1.weight"].numpy()),
                      "bias": jnp.asarray(state[f"{p}.norm1.bias"].numpy())},
            "norm2": {"scale": jnp.asarray(state[f"{p}.norm2.weight"].numpy()),
                      "bias": jnp.asarray(state[f"{p}.norm2.bias"].numpy())},
        }
    # reference Linear wraps nn.Linear as .fc (models.py:7-24)
    return {"params": {
        "xproj_in": lin("xproj_in.fc"),
        "yproj_in": lin("yproj_in.fc"),
        "encoder": enc,
        "dec_x": lin("decoders.0.fc"),
        "dec_y": lin("decoders.1.fc"),
    }}


def build_reference(zdim, dx, dy):
    from models import UML, Linear, Transformer  # reference models.py

    xproj = Linear(dx, zdim)
    yproj = Linear(dy, zdim)
    enc = Transformer(zdim, zdim, nhead=5, num_layers=5, conv1d=True,
                      out_last=False, pos_embd=False, pos_learnable=False,
                      max_len=128)
    decs = [Linear(zdim, dx), Linear(zdim, dy)]
    return UML(xproj, yproj, enc, decs, modality="xy", infoNCE_loss=False)


def forward_parity(pkl_path, dx, dy, zdim=10):
    import torch

    import jax.numpy as jnp

    from uml_tpu.models.seq_autoencoder import make_seq_uml
    from utilis import set_seed  # reference utilis.py

    set_seed(0)
    ref_model = build_reference(zdim, dx, dy)
    ref_model.eval()

    with open(pkl_path, "rb") as f:
        data = pickle.load(f)["train"]
    x = torch.tensor(data["vision"][:16])
    y = torch.tensor(data["text"][:16])
    lx = torch.full((16,), x.shape[1], dtype=torch.long)
    ly = torch.full((16,), y.shape[1], dtype=torch.long)
    lx[3] = 5  # exercise padding-mask parity
    with torch.no_grad():
        out = ref_model(x, y, lx, ly)
    ref = {"loss_x": float(out["loss_x"]), "loss_y": float(out["loss_y"]),
           "diff_next_x": float(out["diff_next_x"]),
           "diff_next_y": float(out["diff_next_y"]),
           "y_recon": out["y_recon"].numpy()}

    ours_model = make_seq_uml(dx, dy, zdim)
    params = port_uml_weights(ref_model.state_dict())
    got = ours_model.apply(params, jnp.asarray(x.numpy()),
                           jnp.asarray(y.numpy()),
                           jnp.asarray(lx.numpy()), jnp.asarray(ly.numpy()),
                           deterministic=True)
    report = {}
    for k in ("loss_x", "loss_y", "diff_next_x", "diff_next_y"):
        a, b = ref[k], float(got[k])
        rel = abs(a - b) / max(abs(a), 1e-9)
        report[k] = {"ref": a, "ours": b, "rel_err": rel, "ok": rel < 1e-4}
    recon_err = float(np.max(np.abs(ref["y_recon"]
                                    - np.asarray(got["y_recon"]))))
    report["y_recon_max_abs"] = {"ref": 0.0, "ours": recon_err,
                                 "rel_err": recon_err, "ok": recon_err < 1e-3}
    return report


def train_parity(pkl_path, epochs):
    import torch

    from datasets.affect.get_data import get_dataloader  # reference
    from torch import optim as topt
    from train import train as ref_train  # reference train.py
    from utilis import set_seed

    bs, zdim = 32, 10
    t1, *_ = get_dataloader(pkl_path, robust_test=False, batch_size=bs,
                            train_shuffle=True, num_workers=0)
    t2, *_ = get_dataloader(pkl_path, robust_test=False, batch_size=bs,
                            train_shuffle=True, num_workers=0)
    ev_tr, ev_va, ev_te = get_dataloader(pkl_path, robust_test=False,
                                         batch_size=bs, train_shuffle=False,
                                         num_workers=0)
    set_seed(0)
    model = build_reference(zdim, 20, 300)
    opt = topt.Adam(model.parameters(), lr=1e-4)
    # capture=True is load-bearing in the reference: without it train()
    # hits an UnboundLocalError on flattened_fixed_samples_x2 (train.py:386)
    score, _ = ref_train(
        model, "xy", t1, t2, opt, num_epoch=epochs, step_k=-1, ds_name="mosi",
        eval_config={"train": ev_tr, "val": ev_va, "test": ev_te,
                     "freq": 10_000},
        alpha_x=1.0, alpha_y=1.0, capture_embeddings_during_training=True,
        debug=True)

    from uml_tpu.cli.multibench import _affect_streams
    from uml_tpu.data.affect import load_affect
    from uml_tpu.models.seq_autoencoder import make_seq_uml
    from uml_tpu.train.selfsup import SelfSupTrainer, train_selfsup

    splits = load_affect(pkl_path)
    s1, s2, evals = _affect_streams(splits, None, bs)
    ours_model = make_seq_uml(20, 300, zdim)
    trainer = SelfSupTrainer(ours_model, lr=1e-4, seed=0)
    _, ours_score, _ = train_selfsup(
        trainer, s1, s2, evals, mode="xy", num_epochs=epochs, step_k=-1,
        ds_name="mosi", eval_freq=10_000, capture=False)

    report = {}
    for k in ("test/score_x", "test/score_y", "test/score_xy",
              "val/score_x", "val/score_y", "val/score_xy"):
        a, b = float(score[k]), float(ours_score[k])
        report[k] = {"ref": a, "ours": b, "abs_err": abs(a - b),
                     "ok": abs(a - b) <= 0.15}
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--json", type=str, default="")
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    _stub_modules()
    sys.path.insert(0, REF_DIR)
    import torch

    _patch_cuda(torch)
    torch.set_num_threads(1)

    import tempfile

    pkl = os.path.join(tempfile.mkdtemp(prefix="uml_parity_"),
                       "mosi_data.pkl")
    make_mosi_pickle(pkl)

    report = {"forward": forward_parity(pkl, 20, 300)}
    if not args.skip_train:
        report["train"] = train_parity(pkl, args.epochs)

    ok = True
    for section, rows in report.items():
        print(f"== {section} ==")
        for k, v in rows.items():
            err_key = "rel_err" if "rel_err" in v else "abs_err"
            print(f"{k:18s} ref {v['ref']:.6f} | ours {v['ours']:.6f} | "
                  f"{err_key} {v[err_key]:.2e} {'OK' if v['ok'] else 'FAIL'}")
            ok = ok and v["ok"]
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
