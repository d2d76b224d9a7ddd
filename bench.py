"""Headline benchmark: CLIP ViT-B/16 image feature extraction throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json north star): 5000 img/s/chip on TPU v5e.

Methodology: device-resident uint8 batch -> fused normalize -> ViT-B/16
forward (bf16) under jit; ITERS dispatches are enqueued back-to-back (as a
real double-buffered extraction pipeline would) and every result is fetched
to host at the end, so async dispatch can't fake timings but fixed per-
dispatch relay overhead is amortized like production serving would.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from uml_tpu.models.clip import build_clip
from uml_tpu.ops import normalize_images

BASELINE_IMG_PER_S = 5000.0
BATCH = 512
ITERS = 10


def main():
    model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32),
    )
    imgs = jax.device_put(jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (BATCH, 224, 224, 3), dtype=np.uint8)
    ))

    @jax.jit
    def extract_sum(v, u8):
        feats = model.apply(v, normalize_images(u8, jnp.bfloat16),
                            method=lambda m, x: m.encode_image(x))
        return feats.sum()

    float(extract_sum(variables, imgs))  # compile
    t0 = time.time()
    outs = [extract_sum(variables, imgs) for _ in range(ITERS)]
    vals = [float(o) for o in outs]  # fetch everything: full completion
    dt = (time.time() - t0) / ITERS
    img_per_s = BATCH / dt

    print(json.dumps({
        "metric": "clip_vitb16_feature_extraction_throughput",
        "value": round(img_per_s, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
