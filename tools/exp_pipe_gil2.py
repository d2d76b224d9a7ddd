"""Does PROCESS-pool decode dodge the put-thread interference that
halves the thread-pool decode rate (tools/exp_pipe_gil.py: 0.50x)?
If yes, the interference is GIL, and the loader grows a process mode;
if no, it is memory-bandwidth/CPU and the composed pipeline's ~0.67 of
link bound is a container ceiling to document.

Usage: timeout 1200 python tools/exp_pipe_gil2.py
"""
import os
import sys
import threading
import time
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import uml_tpu  # noqa: F401
from tools.exp_pipe_gil import BS, N, make_items

_native = None


def _decode_batch_proc(paths):
    global _native
    if _native is None:
        from uml_tpu import native

        _native = (native.fast_decode_jpeg if native.native_available()
                   else None)
    imgs = np.empty((len(paths), 224, 224, 3), dtype=np.uint8)
    for i, p in enumerate(paths):
        imgs[i] = _native(p, 224)
    return imgs


def decode_rate_proc(items, pool):
    batches = [[it["impath"] for it in items[i:i + BS]]
               for i in range(0, len(items), BS)]
    futs = [pool.submit(_decode_batch_proc, b) for b in batches[:8]]
    seen = 0
    t_half = n = None
    for idx in range(len(batches)):
        if idx + 8 < len(batches):
            futs.append(pool.submit(_decode_batch_proc, batches[idx + 8]))
        imgs = futs[idx].result()
        seen += len(imgs)
        if t_half is None and seen >= 2 * BS:
            t_half, n = time.time(), seen
    return (seen - n) / (time.time() - t_half)


def main():
    import jax

    items = make_items()
    x = jax.device_put(np.ones((BS, 224 * 224 * 3), np.uint8))
    float(jax.jit(lambda a: a.sum(dtype=np.int32))(x))

    with ProcessPoolExecutor(max_workers=12) as pool:
        r0 = decode_rate_proc(items, pool)
        print(f"proc decode alone     : {r0:8.1f} img/s", flush=True)

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
        r1 = decode_rate_proc(items, pool)
        stop.set()
        th.join(timeout=30)
        dt = time.time() - t0
        mbps = puts[0] * host.nbytes / 2**20 / dt
        print(f"proc decode w/ puts   : {r1:8.1f} img/s "
              f"(concurrent put rate {mbps:.1f} MB/s)", flush=True)
        print(f"suppression: {r1 / r0:.2f}x", flush=True)


if __name__ == "__main__":
    main()
