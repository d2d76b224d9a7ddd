"""Composed-pipeline config sweep for the 1-core host.

nproc=1 (discovered r5): decode workers, pickle transport, device_put
memcpy/socket, and dispatch all time-share ONE core, so the composed
loop cannot overlap host stages — min(link, decode) overstates the
bound; 1/(1/link + 1/decode) is the serial-composition physics.  Process
decode pays a 75 MB pickle per batch that THREAD decode doesn't, and on
one core the GIL contention processes dodge doesn't matter (everything
time-slices anyway).  Sweeps (worker_kind, num_workers) through the
feeder-structured loop measuring composed rate + the put ledger.

Usage: timeout 1500 python tools/exp_pipe_1core.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 512
IMAGES = 3072
BATCH_MB = BATCH * 224 * 224 * 3 / 2**20


def make_items():
    from PIL import Image

    d = tempfile.mkdtemp(prefix="uml_1core_jpg_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(128):
        arr = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
        p = os.path.join(d, f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return [{"impath": paths[i % len(paths)], "label": 0}
            for i in range(IMAGES)]


def run_feeder(jax, items, extract_sum, variables, kind, workers):
    import queue
    from concurrent.futures import ThreadPoolExecutor

    from uml_tpu.data.loader import ImageBatchLoader

    put_log = []

    def xfer(f):
        t0 = time.time()
        d = jax.device_put(f)
        d.block_until_ready()
        put_log.append((t0, time.time()))
        return d

    loader = ImageBatchLoader(items, "crop", BATCH, num_workers=workers,
                              prefetch=max(workers, 4), worker_kind=kind)
    staged_q = queue.Queue(maxsize=3)
    t_decode_box = [0.0]

    def feed():
        with ThreadPoolExecutor(max_workers=1) as pool:
            it = iter(loader)
            while True:
                td = time.time()
                batch = next(it, None)
                t_decode_box[0] += time.time() - td
                if batch is None:
                    break
                staged_q.put(pool.submit(
                    xfer, batch[0].reshape(batch[0].shape[0], -1)))
            staged_q.put(None)

    t_wait = t_fetch = 0.0
    with ThreadPoolExecutor(max_workers=1) as feeder:
        t0 = time.time()
        feeder.submit(feed)
        outs, fetched = [], 0
        while True:
            tw = time.time()
            fut = staged_q.get()
            if fut is None:
                break
            staged = fut.result()
            t_wait += time.time() - tw
            outs.append(extract_sum(variables, staged))
            if len(outs) - fetched >= 2:
                tf = time.time()
                float(outs[fetched])
                t_fetch += time.time() - tf
                fetched += 1
        for o in outs[fetched:]:
            float(o)
        total = time.time() - t0
    t_put = sum(b - a for a, b in put_log)
    rate = IMAGES / total
    print(f"{kind:8s} w={workers:2d} {rate:7.1f} img/s | "
          f"put_active {t_put/total:.2f} "
          f"inloop_put {len(put_log)*BATCH_MB/max(t_put,1e-9):5.1f} MB/s | "
          f"blocked: xfer {t_wait/total:.2f} fetch {t_fetch/total:.2f} "
          f"decode {t_decode_box[0]/total:.2f}", flush=True)
    return rate


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from uml_tpu.models.clip import build_clip

    model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    extract_sum = bench.make_extract(model)
    items = make_items()

    warm = np.zeros((BATCH, 224 * 224 * 3), np.uint8)
    staged = jax.device_put(warm)
    float(extract_sum(variables, staged))
    print("post-fetch regime entered", flush=True)

    for kind, workers in (("thread", 2), ("thread", 4), ("thread", 8),
                          ("process", 4), ("process", 12), ("thread", 4)):
        run_feeder(jax, items, extract_sum, variables, kind, workers)


if __name__ == "__main__":
    main()
