"""Disambiguate pipeline-stage variance: host-CPU health vs relay state.

Bench runs hours apart measured decode at 549/342/193 img/s and synced
77 MB puts at 16-40 MB/s — on identical code.  This experiment interleaves
(a) a pure-CPU workload (the native JPEG decode), (b) synced device_put
probes at several sizes, and (c) /proc/stat steal/user sampling, before
and after replaying bench.py's model/input staging — so ambient host
slowness, relay-state decay, and staging-triggered decay are separable.

Usage: timeout 1500 python tools/exp_transfer_health.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cpu_sample():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    # user, nice, system, idle, iowait, irq, softirq, steal
    return vals


def cpu_delta(a, b):
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    return {"user%": 100 * (d[0] + d[2]) / tot, "idle%": 100 * d[3] / tot,
            "iowait%": 100 * d[4] / tot, "steal%": 100 * d[7] / tot}


def decode_rate(paths, n=512):
    from uml_tpu.data.loader import ImageBatchLoader

    items = [{"impath": paths[i % len(paths)], "label": 0} for i in range(n)]
    loader = ImageBatchLoader(items, "crop", 128, num_workers=8, prefetch=4)
    c0 = cpu_sample()
    t0 = time.time()
    for _ in loader:
        pass
    dt = time.time() - t0
    c1 = cpu_sample()
    return n / dt, cpu_delta(c0, c1)


def put_rate(mb):
    import jax

    h = np.random.default_rng(0).integers(
        0, 256, (mb * 2**20,), dtype=np.uint8)
    c0 = cpu_sample()
    t0 = time.time()
    d = jax.device_put(h)
    d.block_until_ready()
    dt = time.time() - t0
    c1 = cpu_sample()
    del d
    return mb / dt, cpu_delta(c0, c1)


def report(tag, rate, unit, cpu):
    print(f"{tag:34s}: {rate:8.1f} {unit}  "
          f"(user {cpu['user%']:.0f}% idle {cpu['idle%']:.0f}% "
          f"steal {cpu['steal%']:.1f}%)", flush=True)


def main():
    import tempfile

    from PIL import Image

    d = tempfile.mkdtemp(prefix="uml_health_jpg_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(128):
        arr = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
        p = os.path.join(d, f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)

    r, c = decode_rate(paths)
    report("D1 decode fresh", r, "img/s", c)

    import jax  # noqa: F401  (device init after decode baseline)

    for mb in (1, 19, 77):
        r, c = put_rate(mb)
        report(f"P1 put {mb}MB fresh", r, "MB/s", c)
    for mb in (19, 77):
        r, c = put_rate(mb)
        report(f"P1 put {mb}MB (rep)", r, "MB/s", c)

    r, c = decode_rate(paths)
    report("D2 decode post-puts", r, "img/s", c)

    # replay bench staging (synced variant)
    import jax.numpy as jnp

    import bench

    model = bench.build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    imgs = bench.stage_input(2048, 224 * 224 * 3)
    print("   [staged vitb16 + bs2048 input, synced]", flush=True)

    for mb in (19, 77):
        r, c = put_rate(mb)
        report(f"P2 put {mb}MB post-staging", r, "MB/s", c)

    r, c = decode_rate(paths)
    report("D3 decode post-staging", r, "img/s", c)

    # compile + run the forward (no fetch), then re-probe
    ext = bench.make_extract(model)
    ext(variables, imgs).block_until_ready()
    for mb in (19, 77):
        r, c = put_rate(mb)
        report(f"P3 put {mb}MB post-forward", r, "MB/s", c)

    # fetch a value (the known poison trigger), then re-probe
    float(ext(variables, imgs))
    for mb in (19, 77):
        r, c = put_rate(mb)
        report(f"P4 put {mb}MB post-fetch", r, "MB/s", c)

    r, c = decode_rate(paths)
    report("D4 decode post-fetch", r, "img/s", c)
    print("done", flush=True)


if __name__ == "__main__":
    main()
