"""Pinpoint WHICH step poisons the relay's host->device bulk-transfer path.

exp_put_poison.py established: in a fresh process, large synced
``device_put``\\ s run at ~1500 MB/s; after "one execute" they run at
~25-31 MB/s, permanently.  But that probe's trigger (``float(f(x))``)
bundles FOUR distinct steps: program compilation, execute dispatch,
completion wait, and a device->host fetch.  This experiment unbundles
them with AOT compilation (``jit(f).lower(spec).compile()`` compiles
WITHOUT executing), measuring a timed 19 MB put after each step:

  P0  baseline put (fresh process)
  P1  after AOT compile only
  P2  after an execute dispatch, result left unfetched + unblocked
  P3  after block_until_ready on that result (completion, no D2H)
  P4  after a scalar D2H fetch

Whichever P first collapses is the trigger.  If P1 stays fast, a
"stage-then-compute" pipeline (compile AOT, bulk-transfer the whole
window, then dispatch) rides the fast link for the entire staging
window — trial T measures that composition end to end.

Usage: timeout 900 python tools/exp_poison_trigger.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import uml_tpu  # noqa: F401  (persistent compile cache)

MB19 = 19 * 2**20


def timed_put(rng, keep, tag):
    h = rng.integers(0, 256, (MB19,), dtype=np.uint8)
    t0 = time.time()
    d = jax.device_put(h)
    d.block_until_ready()
    dt = time.time() - t0
    keep.append(d)
    print(f"{tag}: put 19MB in {dt:6.3f}s ({19 / dt:7.1f} MB/s)", flush=True)
    return 19 / dt


def main():
    rng = np.random.default_rng(0)
    keep = []

    def f(a):
        return (a.astype(jnp.float32) ** 2).sum()

    x_host = rng.integers(0, 256, (1024,), dtype=np.uint8)

    timed_put(rng, keep, "P0 baseline           ")
    timed_put(rng, keep, "P0 baseline (rep)     ")

    spec = jax.ShapeDtypeStruct(x_host.shape, jnp.uint8)
    t0 = time.time()
    compiled = jax.jit(f).lower(spec).compile()
    print(f"-- AOT compile {time.time() - t0:.1f}s", flush=True)
    timed_put(rng, keep, "P1 post-compile       ")

    x_dev = jax.device_put(x_host)
    x_dev.block_until_ready()
    out = compiled(x_dev)  # dispatch, do NOT wait or fetch
    timed_put(rng, keep, "P2 post-dispatch      ")

    out.block_until_ready()
    timed_put(rng, keep, "P3 post-block         ")

    _ = float(out)
    timed_put(rng, keep, "P4 post-fetch         ")
    timed_put(rng, keep, "P4 post-fetch (rep)   ")

    # T: stage-then-compute on the real extraction shape, fresh process
    # state no longer matters (poisoned by now) -- so just report the
    # arithmetic using P-rates; the composition trial below only makes
    # sense if some P stayed fast, in which case rerun as its own proc.
    print("done", flush=True)


if __name__ == "__main__":
    main()
