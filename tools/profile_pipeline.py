"""Stage-level profile of the extraction pipeline (bench.py pipeline_bench).

Measures each stage in isolation, then compositions, so the gap between
the pipeline rate and min(stage rates) is attributable:

  1. host decode rate (threaded native libjpeg)
  2. host->device transfer rate: one 512-image uint8 buffer, bulk + chunked
  3. device forward rate (batch resident)
  4. serial loop: decode -> transfer -> forward, no overlap
  5. async loop: the current bench composition
  6. threaded double-buffer: transfer batch k+1 on a worker thread while
     batch k computes

Usage: python tools/profile_pipeline.py
"""

import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from uml_tpu.models.clip import build_clip

BATCH = 512
N_IMAGES = 2048


def make_jpegs(n_files=128):
    from PIL import Image

    d = tempfile.mkdtemp(prefix="uml_pipe_prof_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_files):
        arr = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
        p = os.path.join(d, f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return [{"impath": paths[i % len(paths)], "label": 0}
            for i in range(N_IMAGES)]


def main():
    from uml_tpu.data.loader import ImageBatchLoader

    model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))

    @jax.jit
    def extract_sum(v, u8):
        return model.apply(v, u8,
                           method=lambda m, x: m.encode_image_u8(x)).sum()

    items = make_jpegs()

    # 1. decode only
    loader = ImageBatchLoader(items, "crop", BATCH, num_workers=8, prefetch=4)
    t0 = time.time()
    host_batches = [b[0] for b in loader]
    t_dec = time.time() - t0
    print(f"1. decode: {N_IMAGES / t_dec:8.1f} img/s ({t_dec:.2f}s)")

    flat = [b.reshape(b.shape[0], -1) for b in host_batches]
    nbytes = flat[0].nbytes

    # 2a. bulk transfer (blocking each)
    for rep in range(2):
        t0 = time.time()
        for f in flat:
            jax.device_put(f).block_until_ready()
        t_tx = time.time() - t0
        print(f"2a. transfer bulk (rep{rep}): {N_IMAGES / t_tx:8.1f} img/s "
              f"({nbytes * len(flat) / t_tx / 1e6:.0f} MB/s)")

    # 2b. chunked transfer (4 slices per batch, enqueued then waited)
    t0 = time.time()
    for f in flat:
        parts = [jax.device_put(f[i::4]) for i in range(4)]
        for p in parts:
            p.block_until_ready()
    t_tx4 = time.time() - t0
    print(f"2b. transfer 4-chunk: {N_IMAGES / t_tx4:8.1f} img/s")

    # 2c. jnp.asarray path (what the bench does)
    t0 = time.time()
    for f in flat:
        jnp.asarray(f).block_until_ready()
    t_tx_asarray = time.time() - t0
    print(f"2c. jnp.asarray: {N_IMAGES / t_tx_asarray:8.1f} img/s")

    # 3. device-resident forward
    dev = jax.device_put(flat[0])
    float(extract_sum(variables, dev))  # compile
    t0 = time.time()
    outs = [extract_sum(variables, dev) for _ in range(len(flat))]
    _ = [float(o) for o in outs]
    t_fwd = time.time() - t0
    print(f"3. forward: {N_IMAGES / t_fwd:8.1f} img/s")

    # 4. serial: transfer then forward, fetch each
    t0 = time.time()
    for f in flat:
        float(extract_sum(variables, jax.device_put(f)))
    t_serial = time.time() - t0
    print(f"4. transfer+forward serial: {N_IMAGES / t_serial:8.1f} img/s")

    # 5. async enqueue (bench composition, host batches pre-decoded)
    t0 = time.time()
    outs = [extract_sum(variables, jax.device_put(f)) for f in flat]
    _ = [float(o) for o in outs]
    t_async = time.time() - t0
    print(f"5. transfer+forward async: {N_IMAGES / t_async:8.1f} img/s")

    def xfer(f):
        # sync the transfer: an unsynced device_put through the axon relay
        # defers into a ~10x slower use-triggered send (exp_pipeline_compose)
        d = jax.device_put(f)
        d.block_until_ready()
        return d

    # 6. threaded double-buffer: one worker transfers (synced) ahead
    with ThreadPoolExecutor(max_workers=1) as pool:
        t0 = time.time()
        futs = [pool.submit(xfer, f) for f in flat]
        outs = [extract_sum(variables, fu.result()) for fu in futs]
        _ = [float(o) for o in outs]
        t_db = time.time() - t0
    print(f"6. threaded-transfer async: {N_IMAGES / t_db:8.1f} img/s")

    # 7. full pipeline, streaming: decode prefetch -> threaded transfer
    #    (lag 2) -> async forward
    from collections import deque

    loader = ImageBatchLoader(items, "crop", BATCH, num_workers=8, prefetch=4)
    with ThreadPoolExecutor(max_workers=1) as pool:
        t0 = time.time()
        futs = deque()
        outs = []
        for imgs, _, _ in loader:
            futs.append(pool.submit(
                xfer, imgs.reshape(imgs.shape[0], -1)))
            if len(futs) >= 2:
                outs.append(extract_sum(variables, futs.popleft().result()))
        while futs:
            outs.append(extract_sum(variables, futs.popleft().result()))
        _ = [float(o) for o in outs]
        t_full = time.time() - t0
    print(f"7. full pipeline streamed: {N_IMAGES / t_full:8.1f} img/s")


if __name__ == "__main__":
    main()
