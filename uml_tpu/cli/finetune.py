"""Supervised UML finetune CLI — the flagship training entrypoint.

Flag/behavior parity with vision_language/finetune.py:
  * loads cached text features (text_outdir scheme) into a TextFeatureSet
    with text_shot int/'average' semantics (:479-484)
  * loads the few-shot image benchmark (:487-489)
  * sweeps HYPER_DICT[args.hyperparams] (:406-448), one ckpt dir per combo
    (hparam_str), skipping combos whose test_result.pth exists (:331-333)
  * alternating-modality training with weighted CE, zero-shot head init,
    eval-every-100 early stopping (train/supervised.py)
  * saves test_result.pth {test_acc, val_acc, model, iter} and sweep-level
    results.pth (:395-439) — torch-format artifacts, collect_results
    compatible

TPU-first: with a frozen backbone and deterministic augmentation, image
features are precomputed once and the train step is head-only matmuls;
otherwise raw uint8 batches stream through the jitted backbone.  By default
every grid except the explicit full-finetune ones freezes the backbone
(the reference freezes ONLY hyperparams='linear', finetune.py:338, leaving
'clip_linear' training the whole fp32 tower — pass --strict_reference_parity
to reproduce that quirk exactly).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax.numpy as jnp
import numpy as np

from uml_tpu.core.flags import build_shared_parser
from uml_tpu.core.sweep import expand_sweep, run_sweep_cli
from uml_tpu.data.feature_cache import load_cache, save_cache, text_outdir
from uml_tpu.data.fewshot import (
    TextFeatureSet,
    get_few_shot_benchmark,
    get_few_shot_setup_name,
)
from uml_tpu.data.loader import ImageBatchLoader
from uml_tpu.models.clip import CLIP_CONFIGS
from uml_tpu.models.uml_head import UMLHead, make_uml_clip_head
from uml_tpu.train.optim import HYPER_DICT, build_optimizer, build_schedule
from uml_tpu.train.supervised import (
    EVAL_FREQ,
    CyclicBatcher,
    eval_batches,
    make_validate,
    train,
)
from uml_tpu.utils.io import Tee, makedirs
from uml_tpu.utils.logging import init_logger
from uml_tpu.utils.seeding import set_random_seed


def build_parser() -> argparse.ArgumentParser:
    return build_shared_parser()


def hparam_str(optim, lr, wd, batch_size, iters, dropout, learnable_temp):
    """Parity with finetune.py:58-64."""
    base = f"optim_{optim}-lr_{lr}-wd_{wd}-bs_{batch_size}-iters_{iters}"
    if dropout is not None:
        base += f"-dropout_{dropout}"
    if learnable_temp is True:
        base += "-learnable_temp"
    return base


def savedir(outdir, dataset, encoder, train_shot, seed, text_type, text_shots,
            image_augmentation, mode, init_mode="zeroshot", alpha=0.0,
            text_bs=0, custom_name="", args=None):
    """Parity with finetune.py:67-77."""
    benchname = "-".join([dataset, get_few_shot_setup_name(train_shot, seed)])
    text_name = f"text_{text_type}"
    if text_shots is not None:
        text_name += f"_n_{text_shots}"
    image_name = f"image_{image_augmentation}_{custom_name}"
    mod_name = (f"finetune-{text_name}-{image_name}" if mode == "crossmodal"
                else f"finetune-{image_name}" if mode == "image" else text_name)
    mod_name = f"{mod_name}-alpha_{alpha}" if mode == "crossmodal" else mod_name
    mod_name = f"{mod_name}-text_bs_{text_bs}" if text_bs > 0 else mod_name
    mod_name = (f"{mod_name}-common_dim_{args.common_dim}"
                if args is not None and mode != "crossmodal" else mod_name)
    return os.path.join(outdir, benchname, encoder.replace("/", "-"),
                        mod_name, init_mode)


def _extract_split_features(encoder, items, augmentation, batch_size, seed):
    """Precompute frozen-backbone features for a split."""
    feats, labels = [], []
    for imgs, labs, _ in ImageBatchLoader(items, augmentation, batch_size,
                                          seed=seed):
        feats.append(encoder.encode_images(imgs, batch_pad=batch_size))
        labels.append(labs)
    return np.concatenate(feats), np.concatenate(labels)


def setup(datasets, hparams, args):
    """One hparam combo -> test_result dict. Parity with finetune.py:323-404."""
    ckpt_dir = os.path.join(
        args.savepath,
        hparam_str(hparams["optim"], hparams["lr"], hparams["weight_decay"],
                   hparams["batch_size"], hparams["max_iter"],
                   hparams["dropout"], hparams["learnable_temp"]))
    makedirs(ckpt_dir)
    test_path = os.path.join(ckpt_dir, "test_result.pth")
    if os.path.exists(test_path) and not args.force_rerun:
        print(f"=> Skipping {ckpt_dir} as it already exists!")
        return load_cache(test_path)
    print(f"=> Setting up {ckpt_dir}")

    logger = init_logger("unpaired_multimodal", config={**vars(args), **hparams},
                         tags=[args.dataset, args.modality, args.hyperparams],
                         logdir=ckpt_dir)

    bs = hparams["batch_size"]
    # NOTE: the reference freezes only when hyperparams == 'linear'
    # (finetune.py:338), which leaves 'clip_linear' probes training the
    # whole fp32 CLIP tower at lr 1e-3 — a latent quirk, not a capability
    # anyone uses. Here every grid except the explicit full-finetune one
    # freezes the backbone; --strict_reference_parity restores the
    # reference condition exactly so reference-named grids reproduce
    # reference behavior bit-for-bit.
    if getattr(args, "strict_reference_parity", False):
        freeze_backbone = args.hyperparams == "linear"  # finetune.py:338
    else:
        freeze_backbone = args.hyperparams not in (
            "full_ds_full_model_finetune", "smoke_full")

    text_ds = datasets["text_ds"]

    if not freeze_backbone:
        # full backbone finetuning: raw uint8 image streams through the
        # trainable tower (finetune.py:337-346)
        from uml_tpu.data.loader import ImageBatchLoader, RawImageStream
        from uml_tpu.models.uml_head import make_uml_clip_head, make_uml_dino_head

        encoder = datasets["encoder"]
        if args.use_clip:
            model = make_uml_clip_head(
                encoder.model, encoder.variables, args.nclasses,
                logit_scale=args.logit,
                learnable_temp=hparams["learnable_temp"],
                freeze_backbone=False)
        else:
            proj_dim = (args.text_indim if args.modality == "crossmodal"
                        else args.common_dim)
            model = make_uml_dino_head(
                encoder.vision, encoder._variables, args.nclasses,
                text_indim=proj_dim,
                learnable_temp=hparams["learnable_temp"],
                freeze_backbone=False)

        def _decode_split(items):
            imgs, labels = [], []
            for im, lab, _ in ImageBatchLoader(items, "crop", 64,
                                               seed=args.seed):
                # flat uint8: the TPU transfer layout (see RawImageStream)
                imgs.append(im.reshape(im.shape[0], -1))
                labels.append(lab)
            return np.concatenate(imgs), np.concatenate(labels)

        img_tr = None  # raw stream below; eval splits decoded once to uint8
        image_stream = RawImageStream(datasets["img_tr_ds"],
                                      args.image_augmentation, bs,
                                      seed=args.seed)
        img_val, lab_val = _decode_split(datasets["img_val_ds"])
        img_te, lab_te = _decode_split(datasets["img_te_ds"])
    # feature-space path: precompute once, head-only training
    elif args.use_clip:
        # UMLClip semantics (head.py:101-141): shared head in CLIP embed
        # space, fixed exp(logit) scale, no img_proj
        model = UMLHead(
            feat_dim=args.text_indim, num_classes=args.nclasses,
            text_indim=0, logit_scale=args.logit,
            learnable_temp=hparams["learnable_temp"])
    else:
        # UML semantics (head.py:39-98): img_proj from the vision dim into
        # the text dim (crossmodal) or common_dim (unimodal)
        proj_dim = (args.text_indim if args.modality == "crossmodal"
                    else args.common_dim)
        model = UMLHead(
            feat_dim=args.img_indim, num_classes=args.nclasses,
            text_indim=proj_dim,
            learnable_temp=hparams["learnable_temp"])
    if freeze_backbone:
        encoder = datasets["encoder"]
        # text-only runs never consume the train image stream; only the
        # capture diagnostics need a ~1000-image sample
        train_items = (datasets["img_tr_ds"][:1000]
                       if args.modality == "text" else datasets["img_tr_ds"])
        img_tr, lab_tr = _extract_split_features(
            encoder, train_items, args.image_augmentation, 128,
            args.seed)
        img_val, lab_val = _extract_split_features(
            encoder, datasets["img_val_ds"], "crop", 128, args.seed)
        img_te, lab_te = _extract_split_features(
            encoder, datasets["img_te_ds"], "crop", 128, args.seed)
        image_stream = CyclicBatcher(img_tr, lab_tr, bs, seed=args.seed)
        capture = {
            "image_feats": img_tr[:1000],
            "image_labels": lab_tr[:1000],
            "text_feats": text_ds.features[:1000].astype(np.float32),
        }
    else:
        # raw path: capture diagnostics are skipped (recomputing the full
        # tower per iter is the reference's hardcoded-but-wasteful default)
        capture = None

    params = model.init_params(seed=args.seed)
    if args.classifier_init == "zeroshot" and (
        args.modality == "crossmodal"
        or (args.modality == "image" and args.common_dim == args.text_indim)
    ):
        print("=> Initializing head with zero-shot weights")
        params = model.zero_shot_init(params, text_ds.features, text_ds.labels)

    schedule = build_schedule(hparams["lr"], hparams["lr_scheduler"],
                              hparams["warmup_iter"], hparams["max_iter"],
                              hparams["warmup_type"], hparams["warmup_min_lr"])
    optimizer = build_optimizer(hparams["optim"], schedule,
                                hparams["weight_decay"])

    text_stream = CyclicBatcher(text_ds.features.astype(np.float32),
                                text_ds.labels.astype(np.int64), bs,
                                seed=args.seed + 1)
    if args.modality == "image":
        text_stream = None
        print("=> Running Unimodal: Image Only Model")
    elif args.modality == "text":
        image_stream = None
        print("=> Running Unimodal: Text Only Model")

    val_batches = eval_batches(img_val, lab_val, bs)
    test_batches = eval_batches(img_te, lab_te, bs)

    checkpointer = None
    if getattr(args, "ckpt_every", 0):
        from uml_tpu.core.checkpoint import TrainCheckpointer

        checkpointer = TrainCheckpointer(os.path.join(ckpt_dir, "orbax"))

    result = train(
        model,
        image_stream,
        text_stream,
        val_batches,
        test_batches if args.eval_test else None,
        optimizer=optimizer,
        max_iters=hparams["max_iter"],
        alpha=args.alpha,
        eval_freq=EVAL_FREQ,
        patience=hparams["patience"],
        capture=capture,
        logger=logger,
        init_params=params,
        checkpointer=checkpointer,
        ckpt_every=getattr(args, "ckpt_every", 0) or None,
        mesh=getattr(args, "mesh_obj", None),
    )
    if checkpointer is not None:
        checkpointer.close()
    validate = make_validate(model, bs)
    test_loss, test_acc = validate(result["final_params"], test_batches)
    if hasattr(logger, "finish"):
        logger.log({"test/test_loss": test_loss, "test/test_acc": test_acc})
        logger.finish()

    test_dict = {
        "test_acc": test_acc,
        "val_acc": result["val_acc"],
        "model": result["model"],
        "iter": result["iter"],
    }
    print(f"=> Test Acc: {test_acc:.4f}")
    print(f"=> Saving Test Results for hparams to {test_path}")
    save_cache(test_dict, test_path)
    return test_dict


def sweep(datasets, hyperparams, args):
    """Parity with finetune.py:406-448."""
    hyperparams = {k: (v if isinstance(v, list) else [v])
                   for k, v in hyperparams.items()}
    combos = expand_sweep(hyperparams)
    results = {"test_acc": [], "val_acc": [], "hparams": []}
    for idx, combo in enumerate(combos):
        print(f"=> Running {idx + 1}/{len(combos)}: {combo}")
        out = setup(datasets, combo, args)
        results["test_acc"].append(out["test_acc"])
        results["val_acc"].append(out["val_acc"])
        results["hparams"].append(combo)
    print(f"=> Saving results across all hparams to {args.savepath}")
    save_cache(results, os.path.join(args.savepath, "results.pth"))

    best_idx = int(np.argmax(results["val_acc"]))
    best = (results["val_acc"][best_idx], results["test_acc"][best_idx],
            results["hparams"][best_idx])
    print(f"=> [FINAL] Best Val Acc: {best[0]:.4f} | Best Test Acc: {best[1]:.4f}")
    print(f"=> [FINAL] Best Hyperparameters: {best[2]}")
    return results, best[0], best[1]


def main(args):
    from uml_tpu.core.flags import apply_debug_flags
    from uml_tpu.core.meshes import mesh_from_flag

    apply_debug_flags(args)
    args.mesh_obj = mesh_from_flag(getattr(args, "mesh", "auto"))
    if args.mesh_obj is not None:
        print(f"=> Data-parallel training over mesh {dict(args.mesh_obj.shape)}")
    if args.seed >= 0:
        print(f"=> Setting fixed seed: {args.seed}")
        set_random_seed(args.seed)

    args.use_clip = args.vision_model == "" and args.language_model == ""
    encoder_name = (args.clip_encoder if args.use_clip
                    else f"{args.vision_model}-{args.language_model}")
    args.savepath = savedir(
        args.result_dir, args.dataset, encoder_name, args.train_shot,
        args.seed, args.text_type, args.text_shot, args.image_augmentation,
        args.modality, args.classifier_init, args.alpha,
        getattr(args, "text_batch_size", 0) or 0, args.custom_name, args)
    makedirs(args.savepath)

    logfile = open(os.path.join(args.savepath, "log.txt"), "w")
    sys.stdout = Tee(sys.__stdout__, logfile)
    print("=> Arguments:", args)

    # text features (cached by cli/features.py)
    text_encoder_name = args.clip_encoder if args.use_clip else args.language_model
    text_path = text_outdir(args.feature_dir, text_encoder_name, args.dataset,
                            args.text_type)
    print(f"=> Loading text features from: {text_path}")
    tf = load_cache(text_path)
    n_shots = (int(args.text_shot)
               if (args.text_shot not in (None, "average")) else args.text_shot)
    text_ds = TextFeatureSet(tf["features"], tf["labels"], tf["eot_indices"],
                             n_shots=n_shots)

    datasets = get_few_shot_benchmark(args.data_dir, args.indices_dir,
                                      args.dataset, args.train_shot, args.seed)
    args.nclasses = len(datasets["lab2cname"])

    if args.use_clip:
        from uml_tpu.models.clip import clip_embed_dim

        args.img_indim = args.text_indim = clip_embed_dim(args.clip_encoder)
        from uml_tpu.models.encoders import ClipEncoder

        encoder = ClipEncoder(args.clip_encoder,
                              allow_random_init=args.allow_random_init,
                              mesh=args.mesh_obj)
    else:
        from uml_tpu.cli.features import _HFEncoderAdapter
        from uml_tpu.models.dino import DINO_CONFIGS

        encoder = _HFEncoderAdapter(args.vision_model, "",
                                    allow_random_init=args.allow_random_init)
        args.img_indim = DINO_CONFIGS[args.vision_model][0].num_features
        # text dim comes from the cached LM features themselves
        args.text_indim = int(tf["features"].shape[-1])

    ds = {
        "img_tr_ds": datasets["train"],
        "img_val_ds": datasets["val"],
        "img_te_ds": datasets["test"],
        "text_ds": text_ds,
        "encoder": encoder,
    }
    results, best_val_acc, best_test_acc = sweep(
        ds, HYPER_DICT[args.hyperparams], args)
    print("Done!")
    sys.stdout = sys.__stdout__
    logfile.close()
    return results, best_val_acc, best_test_acc


if __name__ == "__main__":
    run_sweep_cli(main, build_parser(), description="UML finetune",
                  default_config="finetune.yaml")
