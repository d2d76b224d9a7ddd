"""Feature-extraction CLI.

Flag/behavior parity with vision_language/features.py: pre-extracts and
caches frozen-encoder features — train/val/test image features, per-class
template text features, CUPL descriptor features — into the reference's
.pth path scheme and schema (features.py:32-44, 96-103, 143-149, 180-184),
with idempotent skip-unless-overwrite semantics.

TPU-native pipeline: threaded host JPEG decode -> uint8 batches -> device
normalize + jitted encoder forward (bf16), final batch padded so jit
compiles once.

    python -m uml_tpu.cli.features -d --dataset caltech101 --clip-encoder ViT-B/16 ...
    python -m uml_tpu.cli.features -c configs/features.yaml
"""

from __future__ import annotations

import argparse

import numpy as np

from uml_tpu.core.flags import build_shared_parser
from uml_tpu.core.sweep import run_sweep_cli
from uml_tpu.data.descriptors import (
    DESCRIPTOR_DICT,
    descriptor_path as default_descriptor_path,
    load_gpt_descriptions,
)
from uml_tpu.data.feature_cache import (
    descriptor_outdir,
    img_outdir,
    load_cache,
    save_cache,
    text_outdir,
)
from uml_tpu.data.fewshot import get_few_shot_benchmark, get_testset
from uml_tpu.data.loader import ImageBatchLoader
from uml_tpu.data.templates import get_templates
from uml_tpu.utils.io import makedirs
from uml_tpu.utils.seeding import cname2lab, set_random_seed

import os

IMAGENET_TESTSETS = ["imagenetv2", "imagenet_sketch", "imagenet_a", "imagenet_r"]


def build_parser() -> argparse.ArgumentParser:
    return build_shared_parser()


# ---------------------------------------------------------------------------
# extraction passes
# ---------------------------------------------------------------------------


class _LazySplit:
    """A fully-enqueued extraction stream whose D2H fetch is deferred.

    ``finalize()`` drains the pending device outputs into host arrays.
    Deferral lets every split of a run (train, val, test) cross the
    host->device link before the first fetch degrades it (see
    image_features docstring)."""

    def __init__(self, finalize_fn):
        self._finalize_fn = finalize_fn

    def finalize(self):
        return self._finalize_fn()


def image_features(encoder, items, augmentation, batch_size, num_workers,
                   return_tokens=False, seed=0, defer=False):
    """{'features','labels','paths'} over a split (features.py:152-184).

    Pipelined, deferred-fetch streaming: device outputs accumulate in a
    pending window and are only FETCHED once the window exceeds a byte
    budget (default 1 GiB, $UML_FETCH_BUDGET_MB) or the stream ends, while
    backpressure uses fetch-free readiness waits.  Rationale: threaded
    JPEG decode and the host->device transfer of batch k+1 overlap batch
    k's forward (the reference's loop blocks per batch, features.py:
    242-244), and through the axon relay the first device->host fetch
    permanently collapses the H2D bulk-transfer path ~50x
    (tools/exp_poison_trigger.py) — so a plain 512-dim extraction sweep
    never fetches mid-stream unless the split exceeds ~500k images.

    Feeder-structured: a feeder thread owns decode iteration + transfer
    submission (stage_images on a 1-worker transfer pool), so a decode
    stall never idles the H2D link and a transfer never blocks the
    decode drain; the main thread consumes staged batches, dispatches
    the forward (encode_staged), and manages the pending fetch window.
    Measured on the composed bench loop: link-active fraction 0.61 ->
    0.73 under the same link weather (tools/exp_pipeline_ledger.py)."""
    import queue
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    import jax

    budget = int(os.environ.get("UML_FETCH_BUDGET_MB", "1024")) * 2**20
    # UML_DECODE_WORKERS=process: spawn-process decode (2.1x the thread
    # pool on GIL-contended hosts; see data/loader.py)
    loader = ImageBatchLoader(items, augmentation, batch_size,
                              worker_kind=os.environ.get(
                                  "UML_DECODE_WORKERS", "thread"),
                              num_workers=num_workers, seed=seed)
    decoder = "native-libjpeg" if loader._native is not None else "pil"
    stage = getattr(encoder, "stage_images", None)
    feats, labels, paths = [], [], []
    pending = deque()
    pending_bytes = 0

    def drain(limit_bytes):
        nonlocal pending_bytes
        while pending and pending_bytes > limit_bytes:
            out, n, labs, pths = pending.popleft()
            pending_bytes -= out.nbytes
            feats.append(np.asarray(out, dtype=np.float32)[:n])
            labels.append(labs)
            paths.extend(pths)

    if stage is not None:
        staged_q = queue.Queue(maxsize=3)  # bounds device staging RAM

        def feed():
            # the terminal None is in a finally so a decode error can
            # never leave the main thread blocked on the queue; the
            # feeder future re-raises the error after the loop drains
            with ThreadPoolExecutor(max_workers=1) as pool:
                try:
                    for imgs, labs, pths in loader:
                        staged_q.put((pool.submit(stage, imgs, batch_size),
                                      labs, pths))
                finally:
                    staged_q.put(None)

        with ThreadPoolExecutor(max_workers=1) as feeder:
            feed_fut = feeder.submit(feed)
            i = 0
            while True:
                entry = staged_q.get()
                if entry is None:
                    feed_fut.result()  # re-raise decode errors
                    break
                fut, labs, pths = entry
                batch, n = fut.result()
                out, n = encoder.encode_staged(batch, n,
                                               return_tokens=return_tokens)
                pending.append((out, n, labs, pths))
                pending_bytes += out.nbytes
                drain(budget)
                if len(pending) >= 8:  # fetch-free dispatch backpressure
                    jax.block_until_ready(pending[-8][0])
                if return_tokens and i == 0:
                    print("Shape of image patch embeddings:",
                          (n, *out.shape[1:]))
                i += 1
                if i % 20 == 0:
                    print(f"   ... {i}/{len(loader)} batches")
    else:
        for i, (imgs, labs, pths) in enumerate(loader):
            out = encoder.encode_images(imgs, batch_pad=batch_size,
                                        return_tokens=return_tokens)
            if return_tokens and i == 0:
                print("Shape of image patch embeddings:", out.shape)
            feats.append(out)
            labels.append(labs)
            paths.extend(pths)
            if (i + 1) % 20 == 0:
                print(f"   ... {i + 1}/{len(loader)} batches")

    def _finalize():
        drain(0)
        return {
            "features": np.concatenate(feats, axis=0),
            "labels": np.concatenate(labels, axis=0),
            "paths": paths,
            # provenance: native IDCT-scaled decode differs pixel-wise from
            # PIL (~2/255 mean); record which path produced this cache
            "decoder": decoder,
        }

    return _LazySplit(_finalize) if defer else _finalize()


def text_features(encoder, dsname, lab2cname, augmentation,
                  return_tokens=False):
    """Per-class template prompt features (features.py:107-149)."""
    templates = get_templates(dsname, augmentation)
    feats, labels, eots, prompts_dict = [], [], [], {}
    for label, cname in lab2cname.items():
        text_prompts = [t.format(cname.replace("_", " ")) for t in templates]
        out, indices = encoder.encode_texts(text_prompts,
                                            return_tokens=return_tokens)
        feats.append(out)
        labels.append(np.full(len(templates), label, dtype=np.int64))
        eots.append(indices)
        prompts_dict[label] = text_prompts
    return {
        "features": np.concatenate(feats, axis=0),
        "labels": np.concatenate(labels, axis=0),
        "eot_indices": np.concatenate(eots, axis=0),
        "prompts": prompts_dict,
        "lab2cname": lab2cname,
    }


def descriptor_features(encoder, descriptors, lab2cname, return_tokens=False):
    """Per-class CUPL descriptor features (features.py:54-103)."""
    cname2lab_dict = cname2lab(lab2cname)
    feats, labels, eots, prompts_dict = [], [], [], {}
    for cls, descriptions in descriptors.items():
        key = cls.replace(" ", "_").lower()
        if key not in cname2lab_dict:
            print(f"[!!!] Class not found in lab2cname dict corresponding to {cls}")
            continue
        label = cname2lab_dict[key]
        out, indices = encoder.encode_texts(descriptions,
                                            return_tokens=return_tokens)
        feats.append(out)
        labels.append(np.full(len(descriptions), label, dtype=np.int64))
        eots.append(indices)
        prompts_dict[label] = descriptions
    if not feats:
        raise ValueError(
            "No descriptor class matched the dataset's classnames — the "
            "descriptor JSON and the benchmark's lab2cname are disjoint "
            "(wrong dataset, or a custom/synthetic class list)."
        )
    return {
        "features": np.concatenate(feats, axis=0),
        "labels": np.concatenate(labels, axis=0),
        "eot_indices": np.concatenate(eots, axis=0),
        "prompts": prompts_dict,
        "lab2cname": lab2cname,
        "cname2lab": cname2lab_dict,
    }


# ---------------------------------------------------------------------------
# prepare_* (idempotent cache writers)
# ---------------------------------------------------------------------------


def _should_write(path: str, overwrite: bool, what: str) -> bool:
    if overwrite or not os.path.exists(path):
        reason = "overwrite is set to True" if overwrite else "it does not exist"
        print(f"=> Saving {what} to {path} because {reason}")
        return True
    print(f"=> {what} already saved at {path} and overwrite is set to False")
    return False


def plan_image_features(encoder, args, ds, mode="train"):
    """Enqueue a split's whole extraction stream with DEFERRED fetches;
    returns [(path, lazy-structure, lab2cname)] to finalize later (or []
    when the cache already exists).  Deferral keeps the host->device link
    on its fast path until every split of the run has streamed."""
    encoder_name = args.clip_encoder if args.use_clip else args.vision_model
    path = img_outdir(args.feature_dir, encoder_name, args.dataset,
                      args.image_augmentation, args.train_shot, args.seed,
                      mode, args.return_tokens)
    makedirs(os.path.dirname(path))
    if not _should_write(path, args.overwrite, "image features"):
        return []
    if mode == "train":
        lazy = {
            "train": image_features(encoder, ds["train"], args.image_augmentation,
                                    args.batch_size, args.num_workers,
                                    args.return_tokens, args.seed, defer=True),
            "val": image_features(encoder, ds["val"], args.image_augmentation,
                                  args.batch_size, args.num_workers,
                                  args.return_tokens, args.seed, defer=True),
        }
    else:
        lazy = image_features(encoder, ds["test"], "crop", args.batch_size,
                              args.num_workers, args.return_tokens, args.seed,
                              defer=True)
    return [(path, lazy, ds.get("lab2cname"))]


def run_image_feature_jobs(jobs):
    for path, lazy, lab2cname in jobs:
        if isinstance(lazy, dict):
            features = {k: v.finalize() for k, v in lazy.items()}
        else:
            features = lazy.finalize()
        features["lab2cname"] = lab2cname
        save_cache(features, path)


def prepare_image_features(encoder, args, ds, mode="train"):
    run_image_feature_jobs(plan_image_features(encoder, args, ds, mode))


def prepare_text_features(encoder, args, ds):
    text_encoder_name = args.clip_encoder if args.use_clip else args.language_model

    if args.descriptor_type is not None:
        dpath = descriptor_outdir(args.feature_dir, text_encoder_name,
                                  args.dataset, args.descriptor_type,
                                  args.return_tokens)
        if _should_write(dpath, args.overwrite, "descriptor features"):
            hparams = dict(DESCRIPTOR_DICT[args.descriptor_type])
            fname = os.path.join(args.description_dir, hparams["dirname"],
                                 f"descriptors_{args.dataset}.json")
            if not os.path.exists(fname):
                # fall back to the vendored asset descriptors
                fname = default_descriptor_path(args.descriptor_type, args.dataset)
            hparams["fname"] = fname
            hparams["dsname"] = args.dataset
            descriptions, _ = load_gpt_descriptions(hparams)
            features = descriptor_features(encoder, descriptions,
                                           ds["lab2cname"], args.return_tokens)
            save_cache(features, dpath)

    path = text_outdir(args.feature_dir, text_encoder_name, args.dataset,
                       args.text_augmentation, args.return_tokens)
    makedirs(os.path.dirname(path))
    if _should_write(path, args.overwrite, "text features"):
        features = text_features(encoder, args.dataset, ds["lab2cname"],
                                 args.text_augmentation, args.return_tokens)
        save_cache(features, path)


class _RandomTextEncoder:
    """Deterministic hash-random text features for smoke tests when no HF
    weights are cached (zero-egress environments)."""

    hidden_size = 768

    def encode(self, texts, return_tokens=False):
        feats = np.stack([
            np.random.default_rng(abs(hash(t)) % (2**32))
            .standard_normal(self.hidden_size).astype(np.float32)
            for t in texts
        ])
        indices = np.asarray([len(t) for t in texts])
        if return_tokens:
            return feats[:, None, :], np.ones(len(texts), np.int64)
        return feats, indices


class _HFEncoderAdapter:
    """(DINOv2/DINO vision, HF language model) pair behind the encoder API.

    Mirrors the reference's timm + TextModel path (features.py:272-277);
    images go through the same CLIP-normalization as the CLIP path
    (engine/transforms applies one mean/std everywhere).
    """

    def __init__(self, vision_model: str = "", language_model: str = "",
                 allow_random_init: bool = False, mesh=None,
                 quant: str = "none"):
        import jax
        import jax.numpy as jnp

        self.text_model = None
        self.vision = None
        if language_model:
            from uml_tpu.models.languagemodel import TextModel

            try:
                # mesh reaches the text encoder: llama-family LMs (the
                # OpenLLaMA-7B/13B axis, reference languagemodel.py:72-73)
                # run tensor-parallel over the mesh's 'model' axis.
                # any --quant int8* => weight-only int8 projections there
                # (native backend only): 13B fits one 16 GB v5e chip
                self.text_model = TextModel(
                    language_model, mesh=mesh,
                    quant="int8_w" if quant.startswith("int8") else "none")
            except Exception as e:
                if not allow_random_init:
                    raise
                print(f"=> [random-init] text encoder for {language_model} "
                      f"({type(e).__name__}); features are hash-random")
                self.text_model = _RandomTextEncoder()
        if vision_model:
            from uml_tpu.models.dino import load_dino

            model, variables = load_dino(
                vision_model, allow_random_init=allow_random_init,
                quant=quant)
            from uml_tpu.core.meshes import staged_put

            # synced weight staging (see core.meshes.staged_put): a lazy
            # first-dispatch transfer of the ported tree rides the relay's
            # slow deferred path and stalls the first batches behind it
            self._variables = staged_put(variables)

            # flat uint8 transfer + normalization folded into the patch
            # matmul (a 4D uint8 batch pads the 3-lane dim 42x on TPU)
            @jax.jit
            def _enc(v, u8):
                return model.apply(v, u8, from_uint8=True)

            @jax.jit
            def _enc_tokens(v, u8):
                return model.apply(v, u8, from_uint8=True,
                                   return_tokens=True)

            self._enc, self._enc_tokens = _enc, _enc_tokens
            self.vision = model

    def encode_texts(self, texts, return_tokens=False):
        assert self.text_model is not None, "no language model configured"
        return self.text_model.encode(texts, return_tokens=return_tokens)

    def encode_images_async(self, imgs_uint8, batch_pad=None,
                            return_tokens=False):
        """Enqueue transfer + forward without fetching (see
        ClipEncoder.encode_images_async)."""
        batch, n = self.stage_images(imgs_uint8, batch_pad)
        return self.encode_staged(batch, n, return_tokens)

    def stage_images(self, imgs_uint8, batch_pad=None):
        """Synced transfer only (see ClipEncoder.stage_images)."""
        assert self.vision is not None, "no vision model configured"
        import jax.numpy as jnp

        n = imgs_uint8.shape[0]
        if batch_pad is not None and n < batch_pad:
            imgs_uint8 = np.concatenate(
                [imgs_uint8,
                 np.zeros((batch_pad - n, *imgs_uint8.shape[1:]), np.uint8)])
        flat = imgs_uint8.reshape(imgs_uint8.shape[0], -1)
        batch = jnp.asarray(flat)
        # sync the transfer before dispatch (slow use-triggered relay send
        # otherwise; see ClipEncoder.stage_images)
        import jax

        jax.block_until_ready(batch)
        return batch, n

    def encode_staged(self, batch, n, return_tokens=False):
        fn = self._enc_tokens if return_tokens else self._enc
        return fn(self._variables, batch), n

    def encode_images(self, imgs_uint8, batch_pad=None, return_tokens=False):
        out, n = self.encode_images_async(imgs_uint8, batch_pad,
                                          return_tokens)
        return np.asarray(out, dtype=np.float32)[:n]


def main(args):
    from uml_tpu.core.flags import apply_debug_flags

    apply_debug_flags(args)
    # fail fast on an unsupported encoder/quant combination — BEFORE
    # dataset setup and text-model load (load_dino would raise the same
    # ValueError minutes later otherwise)
    quant = getattr(args, "quant", "none")
    if args.vision_model and quant not in ("none", "int8"):
        raise SystemExit(
            f"--quant {quant}: the mixed int8 modes (int8_mlp/int8_attn/"
            f"int8_qkv) are CLIP-tower serving modes; "
            f"{args.vision_model} supports --quant none|int8")
    if args.seed >= 0:
        print(f"Setting fixed seed: {args.seed}")
        set_random_seed(args.seed)

    if args.dataset not in IMAGENET_TESTSETS:
        datasets = get_few_shot_benchmark(args.data_dir, args.indices_dir,
                                          args.dataset, args.train_shot, args.seed)
        print(f"=> Dataset sizes: train: {len(datasets['train'])}, "
              f"val: {len(datasets['val'])}, test: {len(datasets['test'])}")
    else:
        datasets = get_testset(args.dataset, args.data_dir)

    from uml_tpu.core.meshes import mesh_from_flag

    mesh = mesh_from_flag(getattr(args, "mesh", "auto"))
    if mesh is not None:
        print(f"=> Extraction over mesh {dict(mesh.shape)}")

    args.use_clip = args.vision_model == "" and args.language_model == ""
    if args.use_clip:
        print("=> Using CLIP model")
        from uml_tpu.models.encoders import ClipEncoder

        encoder = ClipEncoder(args.clip_encoder, mesh=mesh,
                              allow_random_init=args.allow_random_init,
                              quant=getattr(args, "quant", "none"))
    else:
        print(f"=> Using {args.vision_model} for vision and "
              f"{args.language_model} for language")
        encoder = _HFEncoderAdapter(args.vision_model, args.language_model,
                                    allow_random_init=args.allow_random_init,
                                    mesh=mesh,
                                    quant=getattr(args, "quant", "none"))

    if args.dataset not in IMAGENET_TESTSETS:
        # stream BOTH image passes before the first fetch (see
        # image_features: the first D2H fetch degrades the relay link)
        jobs = plan_image_features(encoder, args, datasets, mode="train")
        jobs += plan_image_features(encoder, args, datasets, mode="test")
        run_image_feature_jobs(jobs)
        prepare_text_features(encoder, args, datasets)
    else:
        print(f"=> Saving ImageNet testset: {args.dataset}, "
              "only preparing image features")
        prepare_image_features(encoder, args, {"test": datasets}, mode="test")
    print("Done!")


if __name__ == "__main__":
    run_sweep_cli(main, build_parser(), description="Feature Extraction",
                  default_config="features.yaml")
