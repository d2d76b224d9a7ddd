"""Pipeline composition A/B + per-stage ledger (VERDICT r4 item 1).

The r04 capture read pipeline_vs_link_bound=0.56 with blocked-transfer
0.79 + blocked-decode 0.20: the loop was ~100% blocked yet delivered
only ~23 MB/s through a link whose one-shot sample said 41 MB/s.  Two
hypotheses, separable only with in-loop instrumentation:

  (a) framework: decode stalls on the MAIN thread idle the transfer
      thread (lag-2 futures dry out), so the link sits unused ~20% of
      the wall; fix = a feeder thread that owns decode + put submission
      so the put path never waits on the main thread.
  (b) weather: the relay's sustained put rate is simply lower than the
      one-shot cap sample (prior art: tools/exp_transfer_health.py saw
      16-40 MB/s on identical code hours apart).

This runs the CURRENT composed-loop structure and the FEEDER structure
alternately (2x each), timing EVERY put from inside the transfer
thread:  put_active_frac (fraction of wall with a put in flight) and
inloop_put_MBps (bytes moved / time in puts) separate (a) from (b) —
if put_active ~1.0 and inloop_MBps ~= the surrounding cap samples, the
remaining ratio gap is the link's own intra-episode movement.

Usage: timeout 1500 python tools/exp_pipeline_ledger.py
"""

import os
import sys
import tempfile
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 512
IMAGES = 3072
BATCH_MB = BATCH * 224 * 224 * 3 / 2**20


def make_items():
    from PIL import Image

    d = tempfile.mkdtemp(prefix="uml_ledger_jpg_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(128):
        arr = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
        p = os.path.join(d, f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return [{"impath": paths[i % len(paths)], "label": 0}
            for i in range(IMAGES)]


def cap_sample(jax, shape, n=5):
    """Median + spread of n synced puts (the link-cap sample)."""
    rng = np.random.default_rng(1)
    rates = []
    for _ in range(n):
        a = rng.integers(0, 255, shape, dtype=np.uint8).reshape(shape[0], -1)
        t0 = time.time()
        d = jax.device_put(a)
        d.block_until_ready()
        rates.append(BATCH_MB / (time.time() - t0))
        del d
    return float(np.median(rates)), [round(r, 1) for r in rates]


def run_current(jax, items, extract_sum, variables, put_log):
    """bench.pipeline_bench's composed loop, with per-put timing."""
    from uml_tpu.data.loader import ImageBatchLoader

    def xfer(f):
        t0 = time.time()
        d = jax.device_put(f)
        d.block_until_ready()
        put_log.append((t0, time.time()))
        return d

    loader = ImageBatchLoader(items, "crop", BATCH, num_workers=12,
                              prefetch=8, worker_kind="process")
    t_wait = t_fetch = t_decode = 0.0
    with ThreadPoolExecutor(max_workers=1) as pool:
        t0 = time.time()
        futs, outs = deque(), []
        fetched = 0
        it = iter(loader)
        while True:
            td = time.time()
            batch = next(it, None)
            t_decode += time.time() - td
            if batch is None:
                break
            imgs = batch[0]
            futs.append(pool.submit(xfer, imgs.reshape(imgs.shape[0], -1)))
            if len(futs) >= 2:
                tw = time.time()
                staged = futs.popleft().result()
                t_wait += time.time() - tw
                outs.append(extract_sum(variables, staged))
            if len(outs) >= 2:
                tf = time.time()
                float(outs[fetched])
                t_fetch += time.time() - tf
                fetched += 1
        while futs:
            staged = futs.popleft().result()
            outs.append(extract_sum(variables, staged))
        for o in outs[fetched:]:
            float(o)
        total = time.time() - t0
    return total, dict(t_wait=t_wait, t_fetch=t_fetch, t_decode=t_decode)


def run_feeder(jax, items, extract_sum, variables, put_log):
    """Feeder-thread structure: decode iteration + put submission live on
    a dedicated thread, so a decode stall can never idle the link; the
    main thread only waits on staged batches, dispatches, and fetches
    one batch behind."""
    import queue

    from uml_tpu.data.loader import ImageBatchLoader

    def xfer(f):
        t0 = time.time()
        d = jax.device_put(f)
        d.block_until_ready()
        put_log.append((t0, time.time()))
        return d

    loader = ImageBatchLoader(items, "crop", BATCH, num_workers=12,
                              prefetch=8, worker_kind="process")
    staged_q = queue.Queue(maxsize=3)  # bounded: caps device staging RAM
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
                imgs = batch[0]
                staged_q.put(pool.submit(
                    xfer, imgs.reshape(imgs.shape[0], -1)))
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
    return total, dict(t_wait=t_wait, t_fetch=t_fetch,
                       t_decode=t_decode_box[0])


def report(name, total, parts, put_log, t_loop0):
    rate = IMAGES / total
    n_puts = len(put_log)
    t_put = sum(b - a for a, b in put_log)
    inloop_mbps = n_puts * BATCH_MB / t_put if t_put else 0.0
    active = t_put / total
    print(f"{name:9s} {rate:7.1f} img/s | put_active {active:.2f} | "
          f"inloop_put {inloop_mbps:5.1f} MB/s | "
          f"blocked: xfer {parts['t_wait']/total:.2f} "
          f"fetch {parts['t_fetch']/total:.2f} "
          f"decode {parts['t_decode']/total:.2f}", flush=True)
    return rate, active, inloop_mbps


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

    # enter the post-fetch regime (like bench: headline fetches first)
    warm = np.zeros((BATCH, 224 * 224 * 3), np.uint8)
    staged = jax.device_put(warm)
    float(extract_sum(variables, staged))
    print("post-fetch regime entered", flush=True)

    cap0, caps0 = cap_sample(jax, (BATCH, 224, 224, 3))
    print(f"cap pre : {cap0:5.1f} MB/s {caps0}", flush=True)

    results = {}
    for rnd in range(2):
        for name, fn in (("current", run_current), ("feeder", run_feeder)):
            put_log = []
            t0 = time.time()
            total, parts = fn(jax, items, extract_sum, variables, put_log)
            r = report(f"{name}#{rnd}", total, parts, put_log, t0)
            results.setdefault(name, []).append(r)

    cap1, caps1 = cap_sample(jax, (BATCH, 224, 224, 3))
    print(f"cap post: {cap1:5.1f} MB/s {caps1}", flush=True)
    cap_img = np.mean([cap0, cap1]) * 2**20 / (224 * 224 * 3)
    for name, rs in results.items():
        best = max(r[0] for r in rs)
        print(f"{name}: best {best:.1f} img/s = {best/cap_img:.2f} of "
              f"mean-cap bound ({cap_img:.0f} img/s)")


if __name__ == "__main__":
    main()
