"""Headline benchmark: CLIP ViT-B/16 image feature extraction throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline target (BASELINE.json north star): 5000 img/s/chip on TPU v5e.

Primary metric (``value``): device-resident uint8 batch -> ViT-B/16 forward
(bf16, CLIP normalization folded into the patch embedding) under jit; ITERS
dispatches are enqueued back-to-back (as a real double-buffered extraction
pipeline would) and every result is fetched to host at the end, so async
dispatch can't fake timings but fixed per-dispatch relay overhead is
amortized like production serving would.

Extra key ``pipeline_img_per_s``: the FULL extraction pipeline on synthetic
JPEGs — threaded host decode (native libjpeg, uml_tpu/native) -> uint8
host->device transfer -> jitted forward, overlapped via async dispatch
(what vision_language/features.py:225-248 does per split).  In this
environment it is bounded by the axon relay's ~200 MB/s host->device link
and the 1-CPU container's decode rate, not by the model; the decode-only
rate is reported alongside so regressions in either stage are visible.
"""

import json
import os
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from uml_tpu.models.clip import build_clip

BASELINE_IMG_PER_S = 5000.0
BATCH = int(os.environ.get("UML_BENCH_BATCH", 2048))
ITERS = 10
PIPELINE_BATCH = 512
PIPELINE_IMAGES = 2048


def make_extract(model):
    @jax.jit
    def extract_sum(v, u8):
        feats = model.apply(v, u8, method=lambda m, x: m.encode_image_u8(x))
        return feats.sum()

    return extract_sum


def device_bench(extract_sum, variables):
    # flat [B, H*W*3]: a 4D uint8 layout pads the 3-lane dim 42x on TPU
    imgs = jax.device_put(jnp.asarray(
        np.random.default_rng(0).integers(
            0, 256, (BATCH, 224 * 224 * 3), dtype=np.uint8)))
    float(extract_sum(variables, imgs))  # compile
    t0 = time.time()
    outs = [extract_sum(variables, imgs) for _ in range(ITERS)]
    _ = [float(o) for o in outs]  # fetch everything: full completion
    dt = (time.time() - t0) / ITERS
    return BATCH / dt


def pipeline_bench(extract_sum, variables):
    """Synthetic JPEGs -> threaded decode -> transfer -> forward, overlapped."""
    from uml_tpu.data.loader import ImageBatchLoader

    try:
        from PIL import Image
    except ImportError:
        return None, None
    d = tempfile.mkdtemp(prefix="uml_bench_jpg_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(128):
        arr = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
        p = os.path.join(d, f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    items = [{"impath": paths[i % len(paths)], "label": 0}
             for i in range(PIPELINE_IMAGES)]

    # decode-only rate (the host-side bound)
    loader = ImageBatchLoader(items, "crop", PIPELINE_BATCH, num_workers=8,
                              prefetch=4)
    t0 = time.time()
    n = sum(len(b[1]) for b in loader)
    decode_rate = n / (time.time() - t0)

    # full pipeline: decode -> device_put -> forward, async-overlapped
    loader = ImageBatchLoader(items, "crop", PIPELINE_BATCH, num_workers=8,
                              prefetch=4)
    t0 = time.time()
    outs = [extract_sum(variables,
                        jax.device_put(jnp.asarray(
                            imgs.reshape(imgs.shape[0], -1))))
            for imgs, _, _ in loader]
    _ = [float(o) for o in outs]
    pipe_rate = PIPELINE_IMAGES / (time.time() - t0)
    return pipe_rate, decode_rate


def train_bench(model, variables):
    """Full-model finetune step (fwd+bwd+adamw through the ViT tower) —
    the reference's flagship training path (finetune.py:120-288 with
    full_ds_full_model_finetune).  bs128 matches its hyper grid."""
    import optax

    b = 128
    rng = np.random.default_rng(0)
    u8 = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (b, 224 * 224 * 3), dtype=np.uint8)))
    labels = jnp.asarray(rng.integers(0, 100, (b,)), jnp.int32)
    head = jnp.asarray(rng.standard_normal((512, 100)) * 0.01, jnp.float32)
    params = variables["params"]
    tx = optax.adamw(1e-5)
    opt = tx.init(params)

    def loss_fn(p, u8, labels):
        feats = model.apply({"params": p}, u8,
                            method=lambda m, x: m.encode_image_u8(x))
        logits = feats @ head
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    @jax.jit
    def step(p, o, u8, labels):
        loss, grads = jax.value_and_grad(loss_fn)(p, u8, labels)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p, o, l = step(params, opt, u8, labels)
    float(l)  # compile + sync
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        p, o, l = step(p, o, u8, labels)
    float(l)
    return b * iters / (time.time() - t0)


def main():
    # UML_ATTN lets perf experiments A/B attention layouts without edits
    model = build_clip("ViT-B/16", dtype=jnp.bfloat16,
                       attn_impl=os.environ.get("UML_ATTN", "auto"))
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32),
    )
    extract_sum = make_extract(model)
    extract_pipe = make_extract(model)  # separate jit cache entry per shape

    img_per_s = device_bench(extract_sum, variables)
    pipe_rate, decode_rate = pipeline_bench(extract_pipe, variables)
    train_rate = train_bench(model, variables)

    record = {
        "metric": "clip_vitb16_feature_extraction_throughput",
        "value": round(img_per_s, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 4),
        "train_full_finetune_img_per_s": round(train_rate, 1),
    }
    if pipe_rate is not None:
        record["pipeline_img_per_s"] = round(pipe_rate, 1)
        record["pipeline_host_decode_img_per_s"] = round(decode_rate, 1)
        record["pipeline_note"] = (
            "jpeg decode->transfer->forward overlapped; env-bound by the "
            "axon relay link (~200 MB/s) and 1-CPU host decode")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
