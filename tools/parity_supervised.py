"""End-to-end numeric parity: supervised UML finetune loop vs the reference.

Drives the ACTUAL reference train()/validate() (vision_language/finetune.py
:120-315) on CPU with a tiny torch backbone injected into the reference
``UML`` head (engine/models/head.py:39-98 accepts any vision module via a
patched ``create_model``), on synthetic few-shot data with seeded shuffled
DataLoaders, recording every delivered batch.  Then replays the IDENTICAL
batch sequence through our jitted ``uml_tpu.train.supervised.train`` with
the torch init ported into our param tree and the same adamw + linear-warmup
cosine schedule (engine/optimizer/{optim,scheduler}.py semantics), and
compares per-iteration losses / accuracies / grad-probe diagnostics
(finetune.py:186-206) and the eval-freq validation trajectory (:247-271).

The synthetic sizes are chosen so both loaders end epochs on RAGGED batches
(reference drop_last=False, finetune.py:370-383): that exercises our
padded-fixed-shape batching (zero sample-weights) against torch's dynamic
final batch — the one behavioral difference a jit-compiled trainer has to
get right.

Usage: python tools/parity_supervised.py [--iters 90] [--json out.json]

This is what tests/test_parity_reference.py::test_supervised_trajectory_parity
runs (marked slow, skipped when /root/reference is absent).  See PARITY.md §3.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DIR = "/root/reference/vision_language"

FEAT_DIM = 64       # toy vision tower output (UML.shared_dim pre-proj)
TEXT_DIM = 32       # text_indim -> img_proj 64->32 engaged (head.py:64-66)
# 24 classes so the capture-set alignment metrics are well-posed on BOTH
# sides: reference cka needs len(text_samples) == n_class and mutual_knn
# needs equal sample counts (metrics.py:96-102, 66-77), and 24 > 10+1 keeps
# topk=10 on ours (train/supervised.py caps topk at n_common-1)
N_CLASSES = 24
N_CAPTURE = N_CLASSES
IMG_SHAPE = (2, 2, 4)
BS = 16
ALPHA = 0.7         # text loss weight (finetune.py:188)
EVAL_FREQ = 30
HP = {"optim": "adamw", "lr": 1e-3, "weight_decay": 1e-4,
      "lr_scheduler": "cosine", "warmup_iter": 10, "warmup_type": "linear",
      "warmup_min_lr": 1e-5}


def _stub_offline_deps():
    """Stub the reference's import-time deps that are absent here (timm,
    torchvision, torchaudio, wandb) — none of their functionality is
    exercised by this harness (the vision tower is injected, transforms are
    bypassed because the loaders feed tensors directly)."""
    import importlib.machinery

    def mod(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        # a real ModuleSpec so importlib.util.find_spec (transformers'
        # optional-dep probing) sees a well-formed module
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    class _Dummy:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return a[0] if a else None

    wandb = mod("wandb")
    wandb.init = lambda *a, **k: types.SimpleNamespace(
        log=lambda *a, **k: None, finish=lambda: None)
    wandb.log = lambda *a, **k: None

    ta = mod("torchaudio")
    taf = mod("torchaudio.functional", edit_distance=lambda *a, **k: 0)
    ta.functional = taf

    timm = mod("timm")
    timm_models = mod("timm.models", create_model=None)
    timm.models = timm_models

    tv = mod("torchvision")
    tvd = mod("torchvision.datasets")
    tvdf = mod("torchvision.datasets.folder", default_loader=lambda p: None)
    tvd.folder = tvdf
    tvt = mod("torchvision.transforms",
              **{k: _Dummy for k in
                 ("Resize", "Compose", "ToTensor", "Normalize", "CenterCrop",
                  "RandomCrop", "RandomResizedCrop", "RandomHorizontalFlip")})
    tvtf = mod("torchvision.transforms.functional",
               InterpolationMode=types.SimpleNamespace(
                   BICUBIC="bicubic", BILINEAR="bilinear", NEAREST="nearest"))
    tvt.functional = tvtf
    tv.datasets = tvd
    tv.transforms = tvt

    # engine.clip.simple_tokenizer imports ftfy/regex at module import;
    # tokenization is never exercised here
    mod("ftfy", fix_text=lambda s: s)


def make_data(n_img=152, n_txt=194, n_val=72):
    """Synthetic few-shot-style data: class-clustered image vectors and
    text features so training actually learns (accuracy trajectories are
    informative, not constant-chance)."""
    rng = np.random.default_rng(7)
    protos_img = rng.standard_normal((N_CLASSES, int(np.prod(IMG_SHAPE))))
    protos_txt = rng.standard_normal((N_CLASSES, TEXT_DIM))

    def imgs(n, seed):
        r = np.random.default_rng(seed)
        lab = r.integers(0, N_CLASSES, n)
        x = protos_img[lab] + 0.5 * r.standard_normal(
            (n, int(np.prod(IMG_SHAPE))))
        return x.reshape(n, *IMG_SHAPE).astype(np.float32), lab.astype(np.int64)

    def txts(n, seed):
        r = np.random.default_rng(seed)
        lab = r.integers(0, N_CLASSES, n)
        x = protos_txt[lab] + 0.3 * r.standard_normal((n, TEXT_DIM))
        return x.astype(np.float32), lab.astype(np.int64)

    def capture():
        # one image + one text feature per class: class-mean image features
        # equal the per-image features, and all metric size constraints hold
        r = np.random.default_rng(4)
        lab = np.arange(N_CLASSES, dtype=np.int64)
        ci = (protos_img[lab] + 0.5 * r.standard_normal(
            (N_CLASSES, int(np.prod(IMG_SHAPE))))
        ).reshape(N_CLASSES, *IMG_SHAPE).astype(np.float32)
        ct = (protos_txt[lab] + 0.3 * r.standard_normal(
            (N_CLASSES, TEXT_DIM))).astype(np.float32)
        return ci, ct, lab

    cap_img, cap_txt, cap_lab = capture()
    return {"train_img": imgs(n_img, 1), "text": txts(n_txt, 2),
            "val": imgs(n_val, 3),
            "cap_img": cap_img, "cap_txt": cap_txt, "cap_lab": cap_lab}


class Recorder:
    """wandb-shaped logger collecting every scalar by key."""

    def __init__(self):
        self.hist = {}

    def log(self, d):
        for k, v in d.items():
            self.hist.setdefault(k, []).append(float(v))


def run_reference(data, iters, patience=10**6):
    _stub_offline_deps()
    sys.path.insert(0, REF_DIR)
    import torch
    from torch.utils.data import DataLoader, Dataset

    torch.set_num_threads(1)

    import engine.models.head as head_mod
    from finetune import train, validate
    from engine.optimizer.optim import build_optimizer
    from engine.optimizer.scheduler import build_lr_scheduler

    class ToyVision(torch.nn.Module):
        """Stands in for the timm tower inside reference UML."""

        def __init__(self):
            super().__init__()
            self.fc1 = torch.nn.Linear(int(np.prod(IMG_SHAPE)), FEAT_DIM)
            self.fc2 = torch.nn.Linear(FEAT_DIM, FEAT_DIM)
            self.num_features = FEAT_DIM

        def forward(self, x):
            return self.fc2(torch.tanh(self.fc1(x.reshape(x.shape[0], -1))))

    head_mod.create_model = lambda name, pretrained=True, img_size=224: ToyVision()
    torch.manual_seed(0)
    model = head_mod.UML("toy", text_indim=TEXT_DIM, num_classes=N_CLASSES,
                         bias=False, learnable_temp=False,
                         freeze_backbone=False)
    state0 = {k: v.detach().clone() for k, v in model.state_dict().items()}

    class ImgDS(Dataset):
        def __init__(self, x, y):
            self.x, self.y = torch.from_numpy(x), torch.from_numpy(y)

        def __len__(self):
            return len(self.x)

        def __getitem__(self, i):
            return {"img": self.x[i], "label": self.y[i]}

    class TxtDS(Dataset):
        def __init__(self, x, y):
            self.x, self.y = torch.from_numpy(x), torch.from_numpy(y)

        def __len__(self):
            return len(self.x)

        def __getitem__(self, i):
            return self.x[i], self.y[i], 0

    class RecordingLoader:
        """Re-iterable wrapper recording every delivered batch in order
        (fetch_next re-iterates at epoch end, finetune.py:33-39)."""

        def __init__(self, loader):
            self.loader = loader
            self.batches = []

        def __iter__(self):
            def gen():
                for b in self.loader:
                    self.batches.append(b)
                    yield b
            return gen()

    gi = torch.Generator(); gi.manual_seed(11)
    gt = torch.Generator(); gt.manual_seed(22)
    image_loader = RecordingLoader(DataLoader(
        ImgDS(*data["train_img"]), batch_size=BS, shuffle=True, generator=gi))
    text_loader = RecordingLoader(DataLoader(
        TxtDS(*data["text"]), batch_size=BS, shuffle=True, generator=gt))
    val_loader = DataLoader(ImgDS(*data["val"]), batch_size=BS, shuffle=False)

    opt = build_optimizer(model.parameters(), HP["optim"], HP["lr"],
                          HP["weight_decay"])
    sched = build_lr_scheduler(opt, HP["lr_scheduler"], HP["warmup_iter"],
                               iters, warmup_type=HP["warmup_type"],
                               warmup_lr=HP["warmup_min_lr"])
    logger = Recorder()

    # capture_features_during_training=True is how the reference always
    # runs (finetune.py:386; with it off + a logger, train() hits an
    # UnboundLocalError on cka_score at :241).  Patch its two sample
    # getters to our fixed capture sets — the per-iter CKA/mutual-kNN side
    # loop (finetune.py:209-233) then runs for real and gets compared.
    import finetune as ft_mod
    import tempfile

    ft_mod.get_few_shot_image_samples = lambda args, shot=16: (
        torch.from_numpy(data["cap_img"]), torch.from_numpy(data["cap_lab"]))
    ft_mod.get_n_text_features = lambda loader, n: (
        torch.from_numpy(data["cap_txt"]), torch.from_numpy(data["cap_lab"]))
    features_pth = tempfile.mkdtemp(prefix="uml_parity_cap_")

    out = train(model, image_loader, text_loader, val_loader, None, opt,
                sched, device="cpu", max_iters=iters, alpha=ALPHA,
                eval_freq=EVAL_FREQ, patience=patience, logger=logger,
                capture_features_during_training=True,
                features_pth=features_pth)
    best_loss, best_acc = validate(model, val_loader, device="cpu")
    # exactly what setup() persists as test_result.pth (finetune.py:395-403),
    # with the harness's val split standing in for the test loader
    test_dict = {"test_acc": best_acc, "val_acc": out["val_acc"],
                 "model": out["model"], "iter": out["iter"]}
    return {
        "hist": logger.hist,
        "state0": state0,
        "img_batches": [(b["img"].numpy(), b["label"].numpy())
                        for b in image_loader.batches],
        "txt_batches": [(b[0].numpy(), b[1].numpy())
                        for b in text_loader.batches],
        "best": {"iter": out["iter"], "val_acc": out["val_acc"],
                 "val_loss": out["val_loss"],
                 "final_val_acc": best_acc, "final_val_loss": best_loss},
        "test_dict": test_dict,
    }


def port_state(state0):
    """torch UML(ToyVision) state_dict -> our UMLHead param tree."""
    import jax.numpy as jnp

    t = lambda k: jnp.asarray(state0[k].numpy())
    return {
        "head_w": t("head.weight").T,          # torch [C,D] -> ours [D,C]
        "img_proj_w": t("img_proj.weight").T,
        "backbone": {
            "w1": t("vision_model.fc1.weight").T,
            "b1": t("vision_model.fc1.bias"),
            "w2": t("vision_model.fc2.weight").T,
            "b2": t("vision_model.fc2.bias"),
        },
    }


class Replay:
    """Recorded torch batches -> our (inputs, labels, weights) stream,
    ragged batches padded to BS with zero weights (weighted-mean CE is
    exactly the torch mean over the real rows)."""

    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        for x, y in self.batches:
            n = len(y)
            w = np.ones(BS, np.float32)
            if n < BS:
                w[n:] = 0.0
                x = np.concatenate(
                    [x, np.zeros((BS - n, *x.shape[1:]), x.dtype)])
                y = np.concatenate([y, np.zeros(BS - n, y.dtype)])
            yield x, y, w


def run_ours(ref, data, iters, patience=10**6):
    import jax.numpy as jnp

    from uml_tpu.models.uml_head import UMLHead
    from uml_tpu.train.optim import build_optimizer, build_schedule
    from uml_tpu.train.supervised import eval_batches, train

    def backbone(bp, x):
        h = jnp.tanh(x.reshape(x.shape[0], -1) @ bp["w1"] + bp["b1"])
        return h @ bp["w2"] + bp["b2"]

    model = UMLHead(feat_dim=FEAT_DIM, num_classes=N_CLASSES,
                    text_indim=TEXT_DIM, backbone=backbone,
                    freeze_backbone=False)
    sched = build_schedule(HP["lr"], HP["lr_scheduler"], HP["warmup_iter"],
                           iters, HP["warmup_type"], HP["warmup_min_lr"])
    optimizer = build_optimizer(HP["optim"], sched, HP["weight_decay"])
    logger = Recorder()
    out = train(model,
                Replay(ref["img_batches"]), Replay(ref["txt_batches"]),
                eval_batches(*data["val"], BS),
                optimizer=optimizer, max_iters=iters, alpha=ALPHA,
                eval_freq=EVAL_FREQ, patience=patience, logger=logger,
                capture={"image_feats": data["cap_img"],
                         "text_feats": data["cap_txt"],
                         "image_labels": data["cap_lab"]},
                init_params=port_state(ref["state0"]))
    _, final_acc = __import__("uml_tpu.train.supervised", fromlist=["x"]) \
        .make_validate(model, BS)(
            out["final_params"], eval_batches(*data["val"], BS))
    return {"hist": logger.hist,
            "best": {"iter": out["iter"], "val_acc": out["val_acc"],
                     "val_loss": out["val_loss"], "final_val_acc": final_acc},
            "test_dict": {"test_acc": final_acc, "val_acc": out["val_acc"],
                          "model": out["model"], "iter": out["iter"]}}


def compare(ref, ours, iters, behavioral=False):
    """behavioral=True: long-horizon mode.  fp32 drift between two
    different-but-equivalent implementations grows with step count, so
    past ~200 iters the per-iteration trajectory tolerances (calibrated
    at 90) stop being meaningful.  What stays provable at ANY horizon is
    the behavioral contract of finetune.py:247-271 — identical early-stop
    iteration, identical best-val snapshot selection, identical eval
    count, equal saved-artifact scalars, weights within a loose bound —
    so trajectory rows become informational and only those are asserted
    (weight tol widens 5e-4 -> 5e-3, best val_loss 2e-4 -> 2e-3)."""
    report = {}
    checks = [
        # per-iteration training trajectory (finetune.py:186-206)
        ("train/image_loss", "rel", 2e-4),
        ("train/text_loss", "rel", 2e-4),
        ("train/image_acc", "abs", 1e-6),
        ("train/text_acc", "abs", 1e-6),
        ("train/img_grad_norm", "rel", 2e-3),
        ("train/txt_grad_norm", "rel", 2e-3),
        ("train/grad_direction_sim", "abs", 2e-3),
        ("train/grad_agreement_rate", "abs", 2e-2),
        ("train/feature_direction_sim", "abs", 1e-3),
        # capture-set alignment side loop (finetune.py:209-233)
        ("train/cka_score", "abs", 1e-3),
        ("train/mknn_score", "abs", 1e-6),
        # eval-freq validation trajectory (finetune.py:247-271)
        ("val/val_loss", "rel", 2e-4),
        ("val/val_acc", "abs", 1e-6),
    ]
    for key, kind, tol in checks:
        a = np.asarray(ref["hist"][key], np.float64)
        b = np.asarray(ours["hist"][key], np.float64)
        n = min(len(a), len(b))
        a, b = a[:n], b[:n]
        err = np.abs(a - b)
        if kind == "rel":
            err = err / np.maximum(np.abs(a), 1e-6)
        report[key] = {
            "n": n, "ref_first": float(a[0]), "ours_first": float(b[0]),
            "ref_last": float(a[-1]), "ours_last": float(b[-1]),
            "max_err": float(err.max()), "tol": tol, "kind": kind,
            "ok": None if behavioral else bool(err.max() <= tol),
        }
    rb, ob = ref["best"], ours["best"]
    loss_tol = 2e-3 if behavioral else 2e-4
    report["best"] = {
        "ref": {k: float(v) for k, v in rb.items()},
        "ours": {k: float(v) for k, v in ob.items()},
        "ok": bool(rb["iter"] == ob["iter"]
                   and abs(rb["val_acc"] - ob["val_acc"]) < 1e-6
                   and abs(rb["final_val_acc"] - ob["final_val_acc"]) < 1e-6
                   and abs(rb["val_loss"] - ob["val_loss"]) < loss_tol),
    }
    # saved-artifact parity: the dict each side persists as
    # test_result.pth (finetune.py:395-403 {test_acc, val_acc, model,
    # iter}) — scalars equal AND the best-snapshot WEIGHTS themselves
    # (reference state_dict ported into our tree layout) within rel tol
    rt, ot = ref["test_dict"], ours["test_dict"]
    ref_params = port_state(rt["model"])
    werr = 0.0
    import jax

    for rp, op in zip(jax.tree.leaves(ref_params),
                      jax.tree.leaves(ot["model"])):
        rp, op = np.asarray(rp, np.float64), np.asarray(op, np.float64)
        werr = max(werr, float(
            np.abs(rp - op).max() / (np.abs(rp).max() + 1e-12)))
    wtol = 5e-3 if behavioral else 5e-4
    report["artifact"] = {
        "ref": {k: float(v) for k, v in rt.items() if k != "model"},
        "ours": {k: float(v) for k, v in ot.items() if k != "model"},
        "max_weight_rel_err": werr, "tol": wtol, "kind": "weights",
        "ok": bool(rt["iter"] == ot["iter"]
                   and abs(rt["val_acc"] - ot["val_acc"]) < 1e-6
                   and abs(rt["test_acc"] - ot["test_acc"]) < 1e-6
                   and werr <= wtol),
    }
    # with finite patience both sides must run the SAME number of evals
    # (identical early-stop point)
    report["eval_count"] = {
        "ref": len(ref["hist"]["val/val_acc"]),
        "ours": len(ours["hist"]["val/val_acc"]),
        "ok": (len(ref["hist"]["val/val_acc"])
               == len(ours["hist"]["val/val_acc"])),
    }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=90)
    ap.add_argument("--patience", type=int, default=10**6,
                    help="early-stop patience (evals without improvement); "
                         "finite values exercise the early-stopping path "
                         "on both sides (finetune.py:262-271)")
    ap.add_argument("--behavioral", action="store_true",
                    help="assert only the horizon-stable behavioral "
                         "contract (early-stop point, best-val selection, "
                         "eval count, artifact); trajectory rows become "
                         "informational — see compare()")
    ap.add_argument("--json", type=str, default="")
    args = ap.parse_args()

    data = make_data()
    ref = run_reference(data, args.iters, args.patience)
    ours = run_ours(ref, data, args.iters, args.patience)
    report = compare(ref, ours, args.iters, behavioral=args.behavioral)
    for k, v in report.items():
        if k == "artifact":
            print(f"{'artifact':26s} ref iter {v['ref']['iter']:.0f} "
                  f"test {v['ref']['test_acc']:.4f} | ours iter "
                  f"{v['ours']['iter']:.0f} test {v['ours']['test_acc']:.4f}"
                  f" | max weight rel err {v['max_weight_rel_err']:.2e} "
                  f"{'OK' if v['ok'] else 'FAIL'}")
            continue
        if k == "eval_count":
            print(f"{'eval_count':26s} ref {v['ref']} | ours {v['ours']} "
                  f"{'OK' if v['ok'] else 'FAIL'}")
            continue
        if k == "best":
            print(f"{'best':26s} ref iter {v['ref']['iter']:.0f} "
                  f"acc {v['ref']['val_acc']:.4f} | ours iter "
                  f"{v['ours']['iter']:.0f} acc {v['ours']['val_acc']:.4f} "
                  f"{'OK' if v['ok'] else 'FAIL'}")
            continue
        status = ("INFO" if v["ok"] is None
                  else "OK" if v["ok"] else "FAIL (tol %g)" % v["tol"])
        print(f"{k:26s} ref {v['ref_first']:+.4f}->{v['ref_last']:+.4f} | "
              f"ours {v['ours_first']:+.4f}->{v['ours_last']:+.4f} | "
              f"max {v['kind']} err {v['max_err']:.2e} {status}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
    if not all(v["ok"] is not False for v in report.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
