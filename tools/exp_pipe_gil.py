"""Attribute the composed pipeline's decode starvation: does a
concurrent relay device_put (the transfer stage) suppress the decode
pool's throughput (GIL/CPU interference), and by how much?

Measures the 12-worker decode rate alone, then the same measure while a
thread pushes back-to-back 73 MB puts (exactly the composed loop's
transfer stage).  If R_concurrent << R_alone, the pipeline's
blocked-on-decode fraction is transport interference, not loader
composition.

Usage: timeout 1200 python tools/exp_pipe_gil.py
"""
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import uml_tpu  # noqa: F401
from uml_tpu.data.loader import ImageBatchLoader

BS, N = 512, 6144


def make_items():
    from PIL import Image

    d = tempfile.mkdtemp(prefix="uml_gil_jpg_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(128):
        arr = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
        p = os.path.join(d, f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return [{"impath": paths[i % 128], "label": 0} for i in range(N)]


def decode_rate(items):
    loader = ImageBatchLoader(items, "crop", BS, num_workers=12, prefetch=8)
    n = t_half = None
    seen = 0
    for b in loader:
        seen += len(b[1])
        if t_half is None and seen >= 2 * BS:
            t_half, n = time.time(), seen
    return (seen - n) / (time.time() - t_half)


def main():
    import jax

    items = make_items()
    # enter the post-fetch regime first (like the composed loop)
    x = jax.device_put(np.ones((BS, 224 * 224 * 3), np.uint8))
    float(jax.jit(lambda a: a.sum(dtype=np.int32))(x))

    r0 = decode_rate(items)
    print(f"decode alone          : {r0:8.1f} img/s", flush=True)

    stop = threading.Event()
    host = np.ones((BS, 224 * 224 * 3), np.uint8)
    puts = [0]

    def putter():
        while not stop.is_set():
            d = jax.device_put(host)
            d.block_until_ready()
            puts[0] += 1

    th = threading.Thread(target=putter, daemon=True)
    t0 = time.time()
    th.start()
    r1 = decode_rate(items)
    stop.set()
    th.join(timeout=30)
    dt = time.time() - t0
    mbps = puts[0] * host.nbytes / 2**20 / dt
    print(f"decode w/ puts        : {r1:8.1f} img/s "
          f"(concurrent put rate {mbps:.1f} MB/s)", flush=True)
    print(f"suppression: {r1 / r0:.2f}x", flush=True)


if __name__ == "__main__":
    main()
