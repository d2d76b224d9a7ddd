"""Hunt a workaround for the post-execute device_put slowdown.

exp_put_poison.py established: after the first execute in a process,
77 MB synced puts run at ~31 MB/s (vs ~1500 MB/s before), permanently;
1 MB puts stay at the ~50 ms fixed floor.  Consistent with the relay
switching bulk transfers to a chunked path with ~2 ms/chunk round trips.

Cells (all post-execute):
  S   size sweep 2/4/8/19/38/77 MB -> rate curve, find fast-path threshold
  J   jnp.asarray instead of device_put (different entry path)
  K   chunked put + on-device concat: ship the 77 MB batch as N pieces,
      reassemble with one jitted concat (computes are NOT poisoned)
  P   pure_callback pull: the jitted fn fetches the batch itself, so the
      bytes ride the execute channel instead of the transfer channel
  I   parallel puts from 4 threads (is the 31 MB/s per-stream or global?)

Usage: python tools/exp_put_workaround.py
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import uml_tpu  # noqa: F401  (persistent compile cache)

FULL = 512 * 224 * 224 * 3  # 77 MB


def timed_put(h):
    t0 = time.time()
    d = jax.device_put(h)
    d.block_until_ready()
    return d, time.time() - t0


def main():
    rng = np.random.default_rng(0)
    f = jax.jit(lambda a: (a.astype(jnp.float32) ** 2).sum())
    warm = jax.device_put(rng.integers(0, 256, (1024,), dtype=np.uint8))
    float(f(warm))  # poison the process
    print("poisoned (one execute done)", flush=True)

    keep = []

    # S: size sweep
    for mb in (2, 4, 8, 19, 38, 77):
        n = mb * 2**20
        h = rng.integers(0, 256, (n,), dtype=np.uint8)
        d, dt = timed_put(h)   # warm the size once (allocator effects)
        d, dt = timed_put(h)
        keep.append(d)
        print(f"S put {mb:3d}MB: {dt:7.3f}s ({mb / dt:7.1f} MB/s)",
              flush=True)

    # J: jnp.asarray
    h = rng.integers(0, 256, (FULL,), dtype=np.uint8)
    t0 = time.time()
    d = jnp.asarray(h)
    d.block_until_ready()
    dt = time.time() - t0
    keep.append(d)
    print(f"J jnp.asarray 77MB: {dt:.3f}s ({77 / dt:.1f} MB/s)", flush=True)

    # K: chunked put + device concat (chunk size = best from S, try 2/4/8)
    batch = rng.integers(0, 256, (512, 224 * 224 * 3), dtype=np.uint8)
    concat = jax.jit(lambda *parts: jnp.concatenate(parts, axis=0))
    for nchunks in (40, 20, 10):
        rows = 512 // nchunks + (512 % nchunks > 0)
        pieces = [batch[i * rows:(i + 1) * rows] for i in range(nchunks)]
        t0 = time.time()
        devs = []
        for p in pieces:
            d = jax.device_put(p)
            d.block_until_ready()
            devs.append(d)
        whole = concat(*devs)
        whole.block_until_ready()
        dt = time.time() - t0
        print(f"K {nchunks:2d}x{rows}-row chunks + concat: {dt:7.3f}s "
              f"({512 / dt:7.1f} img/s, {77 / dt:6.1f} MB/s)", flush=True)

    # P: pure_callback pull
    slot = {}

    def fetch(_):
        return slot["batch"]

    @jax.jit
    def pull_sum(i):
        b = jax.pure_callback(
            fetch, jax.ShapeDtypeStruct((512, 224 * 224 * 3), jnp.uint8), i)
        return b.astype(jnp.float32).sum()

    slot["batch"] = batch
    t0 = time.time()
    v = float(pull_sum(jnp.int32(0)))   # compile
    print(f"P compile+run {time.time() - t0:.2f}s", flush=True)
    rates = []
    for i in range(3):
        slot["batch"] = batch
        t0 = time.time()
        v = float(pull_sum(jnp.int32(i + 1)))
        rates.append(time.time() - t0)
    print(f"P pure_callback pull 77MB: {min(rates):.3f}s "
          f"({77 / min(rates):.1f} MB/s)", flush=True)

    # I: 4 parallel threaded puts of 19MB each
    parts = [rng.integers(0, 256, (19 * 2**20,), dtype=np.uint8)
             for _ in range(4)]
    with ThreadPoolExecutor(max_workers=4) as pool:
        t0 = time.time()
        devs = list(pool.map(lambda h: timed_put(h)[0], parts))
        dt = time.time() - t0
    keep += devs
    print(f"I 4x19MB threaded puts: {dt:.3f}s ({76 / dt:.1f} MB/s agg)",
          flush=True)


if __name__ == "__main__":
    main()
