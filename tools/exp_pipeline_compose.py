"""Isolate the axon-relay transfer<->compute composition penalty.

profile_pipeline.py showed: transfers alone 5600 img/s, forwards alone
4636 img/s, but any interleaving collapses to ~200-260 img/s.  This probes
which composition recovers throughput:

  A. phase-batched: N transfers, then N computes, fetch at phase end
     (one transfer<->compute switch per phase instead of per batch)
  B. implicit-arg transfer: pass the HOST numpy array straight to the
     jitted call (dispatch-integrated transfer) instead of device_put
  C. fetch-behind-window with implicit args (the realistic streaming form)

Usage: python tools/exp_pipeline_compose.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from uml_tpu.models.clip import build_clip

BATCH = 512
N = 8  # batches


def main():
    model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
            jnp.zeros((1, 77), jnp.int32))
    variables = jax.device_put(variables, jax.devices()[0])

    @jax.jit
    def extract_sum(v, u8):
        return model.apply(v, u8,
                           method=lambda m, x: m.encode_image_u8(x)).sum()

    rng = np.random.default_rng(0)
    host = [rng.integers(0, 256, (BATCH, 224 * 224 * 3), dtype=np.uint8)
            for _ in range(N)]
    # compile + warm
    float(extract_sum(variables, jax.device_put(host[0])))

    def report(name, t0):
        dt = time.time() - t0
        print(f"{name}: {N * BATCH / dt:8.1f} img/s ({dt:.2f}s)", flush=True)

    # A. phase-batched
    t0 = time.time()
    devs = [jax.device_put(h) for h in host]
    outs = [extract_sum(variables, d) for d in devs]
    _ = [float(o) for o in outs]
    report("A. all-transfers-then-all-computes", t0)

    # A2. phases of 2
    t0 = time.time()
    outs = []
    for i in range(0, N, 2):
        devs = [jax.device_put(h) for h in host[i:i + 2]]
        outs += [extract_sum(variables, d) for d in devs]
    _ = [float(o) for o in outs]
    report("A2. phases of 2 (no fetch between)", t0)

    # B. implicit-arg transfer, all enqueued
    t0 = time.time()
    outs = [extract_sum(variables, h) for h in host]
    _ = [float(o) for o in outs]
    report("B. implicit-arg transfers", t0)

    # C. implicit-arg with fetch behind a 2-deep window
    t0 = time.time()
    outs = []
    vals = []
    for h in host:
        outs.append(extract_sum(variables, h))
        if len(outs) > 2:
            vals.append(float(outs.pop(0)))
    vals += [float(o) for o in outs]
    report("C. implicit-arg, lag-2 fetch", t0)

    # D. per-batch device_put + compute, fetch at end (stage-5 repro)
    t0 = time.time()
    outs = [extract_sum(variables, jax.device_put(h)) for h in host]
    _ = [float(o) for o in outs]
    report("D. per-batch device_put (repro)", t0)


if __name__ == "__main__":
    main()
