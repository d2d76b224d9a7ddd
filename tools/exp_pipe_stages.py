"""Per-phase timing of bench.pipeline_bench's composed loop.

After the staging fix the transfer stage measures ~10k img/s but the
composed pipeline collapsed to 8 img/s (~60 s/batch hiding somewhere).
This replays the exact composed loop with a timer on every call.

Usage: timeout 900 python tools/exp_pipe_stages.py
"""

import os
import sys
import tempfile
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from PIL import Image

    import bench
    from uml_tpu.data.loader import ImageBatchLoader

    model = bench.build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    extract_sum = bench.make_extract(model)

    d = tempfile.mkdtemp(prefix="uml_pipe_jpg_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(128):
        arr = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
        p = os.path.join(d, f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    items = [{"impath": paths[i % len(paths)], "label": 0}
             for i in range(2048)]

    def xfer(f):
        t0 = time.time()
        dv = jax.device_put(f)
        dv.block_until_ready()
        print(f"      xfer: {time.time() - t0:7.3f}s", flush=True)
        return dv

    # compile at bs512 without a fetch
    loader = ImageBatchLoader(items[:512], "crop", 512, num_workers=8,
                              prefetch=4)
    first = next(iter(loader))[0].reshape(512, -1)
    t0 = time.time()
    extract_sum(variables, xfer(first)).block_until_ready()
    print(f"compile+1st fwd: {time.time() - t0:.3f}s", flush=True)

    loader = ImageBatchLoader(items, "crop", 512, num_workers=8, prefetch=4)
    with ThreadPoolExecutor(max_workers=1) as pool:
        T0 = time.time()
        futs, outs = deque(), []
        t_prev = time.time()
        for imgs, _, _ in loader:
            print(f"   loader yield: {time.time() - t_prev:7.3f}s",
                  flush=True)
            futs.append(pool.submit(xfer, imgs.reshape(imgs.shape[0], -1)))
            if len(futs) >= 2:
                t0 = time.time()
                h = futs.popleft().result()
                print(f"   fut.result wait: {time.time() - t0:7.3f}s",
                      flush=True)
                t0 = time.time()
                outs.append(extract_sum(variables, h))
                print(f"   dispatch: {time.time() - t0:7.3f}s", flush=True)
            if len(outs) >= 4:
                t0 = time.time()
                outs[-4].block_until_ready()
                print(f"   backpressure block: {time.time() - t0:7.3f}s",
                      flush=True)
            t_prev = time.time()
        while futs:
            t0 = time.time()
            outs.append(extract_sum(variables, futs.popleft().result()))
            print(f"   tail dispatch: {time.time() - t0:7.3f}s", flush=True)
        for i, o in enumerate(outs):
            t0 = time.time()
            float(o)
            print(f"   drain fetch {i}: {time.time() - t0:7.3f}s", flush=True)
        dt = time.time() - T0
        print(f"composed: {2048 / dt:.1f} img/s ({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
