"""Characterize the relay's first-fetch flush.

exp_pipe_stages.py: with a clean (unpoisoned) process, dispatches and
synced puts are fast, but the FIRST value fetch blocks ~24 s (with
~600 MB staged) / ~240 s (bench, ~2.5 GB staged).  Questions:
  1. Is the flush fixed-cost, proportional to staged bytes, or
     proportional to pending compute?
  2. What is the H2D put rate after a clean flush?
  3. Is a tiny-op fetch cheaper than a big-forward fetch?

Usage: timeout 900 python tools/exp_fetch_flush.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench

    _keep = []

    def put(mb, tag):
        h = np.random.default_rng(0).integers(
            0, 256, (mb * 2**20,), dtype=np.uint8)
        t0 = time.time()
        d = jax.device_put(h)
        d.block_until_ready()
        print(f"{tag:36s}: {mb / (time.time() - t0):7.1f} MB/s", flush=True)
        _keep.append(d)
        return d

    put(19, "put fresh")
    put(19, "put fresh (rep)")

    # tiny jitted op + fetch BEFORE any staging: flush cost with ~40 MB
    tiny = jax.jit(lambda x: x.sum())
    t0 = time.time()
    float(tiny(_keep[-1]))
    print(f"first fetch (tiny op, ~40 MB staged): {time.time() - t0:.3f}s",
          flush=True)
    put(19, "put post-first-fetch")
    put(77, "put post-first-fetch 77MB")

    # now stage the ViT + input and dispatch forwards
    model = bench.build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    imgs = bench.stage_input(512, 224 * 224 * 3)
    ext = bench.make_extract(model)
    t0 = time.time()
    out = ext(variables, imgs)
    out.block_until_ready()
    print(f"compile+block (no fetch): {time.time() - t0:.3f}s", flush=True)

    t0 = time.time()
    float(out)
    print(f"fetch #2 (post ~600 MB staging + 1 fwd): {time.time() - t0:.3f}s",
          flush=True)

    outs = [ext(variables, imgs) for _ in range(4)]
    t0 = time.time()
    _ = [float(o) for o in outs]
    print(f"fetch of 4 more forwards: {time.time() - t0:.3f}s", flush=True)

    put(19, "put post-everything")
    put(77, "put post-everything 77MB")
    print("done", flush=True)


if __name__ == "__main__":
    main()
