"""Profile the bench forward (CLIP ViT-B/16 bf16 bs512) and print top ops.

Usage: python tools/profile_clip_forward.py [trace_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from uml_tpu.models.clip import build_clip
from uml_tpu.utils.profiling import trace_and_summarize

BATCH = 512
ITERS = 3


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/clip_fwd_trace"
    model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32),
    )
    imgs = jax.device_put(jnp.asarray(
        np.random.default_rng(0).integers(
            0, 256, (BATCH, 224 * 224 * 3), dtype=np.uint8)
    ))

    @jax.jit
    def extract_sum(v, u8):
        feats = model.apply(v, u8, method=lambda m, x: m.encode_image_u8(x))
        return feats.sum()

    float(extract_sum(variables, imgs))  # compile
    t0 = time.time()
    vals = [float(extract_sum(variables, imgs)) for _ in range(ITERS)]
    print(f"timed (sync each): {(time.time()-t0)/ITERS*1e3:.1f} ms/iter")
    with trace_and_summarize(trace_dir, iters=ITERS, top=25):
        for _ in range(ITERS):
            val = float(extract_sum(variables, imgs))


if __name__ == "__main__":
    main()
