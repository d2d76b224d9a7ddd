"""Characterize the axon-relay device_put slowdown after compute.

exp_buffer_age.py showed: synced device_put runs at ~750 MB/s before any
compute has executed, but ~30 MB/s (2.6 s per 77 MB batch) after the
first execute — while dispatch-on-fresh-buffer stays fast.  This probes
the poisoning's shape:

  A  puts before any execute (per-put timing)        [fast baseline]
  B  one execute
  C  puts right after the execute (per-put timing)   [slow repro?]
  D  deletions then puts (is deletion the cost?)
  E  small 1 MB puts after compute (fixed cost vs bandwidth?)
  F  10 s idle, puts again (does poisoning decay?)
  G  execute, put, put (first-after vs second-after)

Usage: python tools/exp_put_poison.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import uml_tpu  # noqa: F401  (persistent compile cache)

MB77 = 512 * 224 * 224 * 3


def put(h):
    t0 = time.time()
    d = jax.device_put(h)
    d.block_until_ready()
    return d, time.time() - t0


def main():
    rng = np.random.default_rng(0)
    big = [rng.integers(0, 256, (MB77,), dtype=np.uint8) for _ in range(12)]
    small = [rng.integers(0, 256, (2**20,), dtype=np.uint8) for _ in range(4)]

    f = jax.jit(lambda a: (a.astype(jnp.float32) ** 2).sum())

    keep = []

    # A: pre-execute puts
    for i in range(3):
        d, dt = put(big[i])
        keep.append(d)
        print(f"A{i} pre-execute put 77MB: {dt:.3f}s "
              f"({77 / max(dt, 1e-9):.0f} MB/s)", flush=True)

    # B: one execute (compile + run + fetch)
    t0 = time.time()
    v = float(f(keep[0]))
    print(f"B execute(+compile) done in {time.time() - t0:.2f}s", flush=True)
    t0 = time.time()
    v = float(f(keep[0]))
    print(f"B2 warm execute {time.time() - t0:.3f}s", flush=True)

    # C: puts after execute
    for i in range(3, 6):
        d, dt = put(big[i])
        keep.append(d)
        print(f"C{i} post-execute put 77MB: {dt:.3f}s "
              f"({77 / max(dt, 1e-9):.0f} MB/s)", flush=True)

    # D: deletions then puts
    del keep[:3]
    time.sleep(2)
    for i in range(6, 8):
        d, dt = put(big[i])
        keep.append(d)
        print(f"D{i} post-delete put 77MB: {dt:.3f}s", flush=True)

    # E: small puts
    for i, s in enumerate(small):
        d, dt = put(s)
        keep.append(d)
        print(f"E{i} post-execute put 1MB: {dt:.3f}s", flush=True)

    # F: idle decay
    time.sleep(10)
    for i in range(8, 10):
        d, dt = put(big[i])
        keep.append(d)
        print(f"F{i} after-10s-idle put 77MB: {dt:.3f}s", flush=True)

    # G: execute then two puts back to back
    float(f(keep[0]))
    d, dt1 = put(big[10])
    keep.append(d)
    d, dt2 = put(big[11])
    keep.append(d)
    print(f"G first-after-execute {dt1:.3f}s, second {dt2:.3f}s", flush=True)


if __name__ == "__main__":
    main()
