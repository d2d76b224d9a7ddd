"""Decisive probe of the axon-relay fresh-buffer dispatch stall.

exp_pipeline_compose.py showed every composition of host->device transfer
with compute collapses to ~250 img/s while each stage alone runs at
~5000 img/s.  The stall (~2s) appears when a dispatch's argument buffer
was freshly transferred.  Competing hypotheses:

  H1 per-buffer ripening: the relay finishes some async device-side work
     per new buffer; dispatching before it completes serializes slowly.
     -> aging a buffer (wall-clock) before first use should fix it, and a
        SECOND dispatch on the same buffer should be fast.
  H2 per-dispatch argument-rebinding: any dispatch whose arg tuple
     differs from the previous one pays ~2s (e.g. the relay re-ships the
     whole binding incl. 350MB of weights).
     -> aging won't help; second dispatch on the same fresh buffer is
        fast only because the tuple then matches; tiny-weight fn should
        show a much smaller stall.
  H3 transfer-after-compute poisoning: a transfer issued while/after
     compute ran degrades the stream globally.

Stages:
  E1 same-buffer dispatch loop            (fast baseline)
  E2 fresh buffers, synced, dispatch now  (slow repro)
  E3 fresh buffers, synced, sleep 5s, dispatch all   (tests aging)
  E4 fresh buffer, dispatch twice, fetch both        (per-buffer vs per-dispatch)
  E5 tiny-weight fn (x.sum()) on fresh buffers       (weight-rebinding test)
  E6 deep prefetch: transfer thread keeps a 12-buffer window ahead

Usage: python tools/exp_buffer_age.py
"""

import os
import sys
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from uml_tpu.models.clip import build_clip

BATCH = 512
N = 6


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

    @jax.jit
    def tiny_sum(u8):
        return u8.astype(jnp.float32).sum()

    rng = np.random.default_rng(0)
    host = [rng.integers(0, 256, (BATCH, 224 * 224 * 3), dtype=np.uint8)
            for _ in range(N)]
    d0 = jax.device_put(host[0])
    d0.block_until_ready()
    float(extract_sum(variables, d0))  # compile
    float(tiny_sum(d0))                # compile

    def put(h):
        d = jax.device_put(h)
        d.block_until_ready()
        return d

    def report(name, t0, n=N):
        dt = time.time() - t0
        print(f"{name}: {n * BATCH / dt:8.1f} img/s ({dt:.2f}s)", flush=True)

    # E1 same buffer
    t0 = time.time()
    outs = [extract_sum(variables, d0) for _ in range(N)]
    _ = [float(o) for o in outs]
    report("E1 same-buffer x6", t0)

    # E2 fresh buffers, dispatch immediately
    t0 = time.time()
    outs = [extract_sum(variables, put(h)) for h in host]
    _ = [float(o) for o in outs]
    report("E2 fresh+dispatch-now", t0)

    # E3 fresh buffers, age 5s
    t0 = time.time()
    devs = [put(h) for h in host]
    t_x = time.time() - t0
    time.sleep(5.0)
    t1 = time.time()
    outs = [extract_sum(variables, d) for d in devs]
    _ = [float(o) for o in outs]
    dt = time.time() - t1
    print(f"E3 aged-5s dispatch: {N * BATCH / dt:8.1f} img/s "
          f"(xfer {t_x:.2f}s + sleep + compute {dt:.2f}s)", flush=True)

    # E4 dispatch twice per fresh buffer, timed separately
    d = put(host[0])
    t0 = time.time()
    o1 = extract_sum(variables, d)
    f1 = float(o1)
    t_first = time.time() - t0
    t0 = time.time()
    o2 = extract_sum(variables, d)
    f2 = float(o2)
    t_second = time.time() - t0
    print(f"E4 fresh buffer: 1st dispatch {t_first:.3f}s, "
          f"2nd dispatch {t_second:.3f}s", flush=True)

    # E5 tiny-weight fn on fresh buffers
    t0 = time.time()
    outs = [tiny_sum(put(h)) for h in host]
    _ = [float(o) for o in outs]
    report("E5 tiny-fn fresh buffers", t0)

    # E5b tiny then big on the same fresh buffer: does the tiny dispatch
    # "ripen" the buffer for the big one?
    d = put(host[1])
    t0 = time.time()
    float(tiny_sum(d))
    t_tiny = time.time() - t0
    t0 = time.time()
    float(extract_sum(variables, d))
    t_big = time.time() - t0
    print(f"E5b tiny-first {t_tiny:.3f}s then big {t_big:.3f}s", flush=True)

    # E6 deep prefetch: a transfer thread keeps a 12-deep window ahead
    M = 24
    host2 = [rng.integers(0, 256, (BATCH, 224 * 224 * 3), dtype=np.uint8)
             for _ in range(M)]
    with ThreadPoolExecutor(max_workers=1) as pool:
        t0 = time.time()
        futs, outs, vals = deque(), deque(), []
        for h in host2:
            futs.append(pool.submit(put, h))
            if len(futs) >= 12:
                outs.append(extract_sum(variables, futs.popleft().result()))
            if len(outs) > 4:
                vals.append(float(outs.popleft()))
        while futs:
            outs.append(extract_sum(variables, futs.popleft().result()))
        vals += [float(o) for o in outs]
        report("E6 deep-prefetch-12 stream", t0, n=M)


if __name__ == "__main__":
    main()
