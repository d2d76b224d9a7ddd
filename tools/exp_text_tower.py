"""Whole-tower text kernel A/B on the real chip (VERDICT r4 item 2).

Same-window probes, fresh model per config (UML_TEXT_TOWER[_G] are
trace-time reads; a fresh build re-traces):

  base      per-layer two-kernel path (UML_TEXT_TOWER=0)
  tower G   ops.text_tower at several batch groups
  base      drift control

Usage: timeout 1500 python tools/exp_text_tower.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe(env, toks):
    import jax
    import jax.numpy as jnp

    import bench
    from uml_tpu.models.clip import build_clip

    old = {}
    for k, v in env.items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
        variables = bench.init_on_cpu(lambda: model.init(
            jax.random.key(0),
            jnp.zeros((1, 224, 224, 3), jnp.float32),
            jnp.zeros((1, 77), jnp.int32)))

        @jax.jit
        def enc_sum(v, t):
            return model.apply(
                v, t, method=lambda m, tt: m.encode_text(tt)).sum()

        rate = bench.device_bench(enc_sum, variables, toks, iters=10, runs=3)
        print(f"{str(env):48s} {rate:9.1f} sent/s", flush=True)
        return rate
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    import bench

    toks = bench.stage_tokens(bench.BATCH)
    # round-4 per-entry kernel body read G8/16/32 = 23958/20637/22030
    # sent/s (flat-to-worse with G): row fill, not weight streaming,
    # binds at S=77 — per-entry [77, K] projections fill 60% of the
    # 128-row MXU tile.  The group-flat body does all projections over
    # [G*S, *] (G=8 -> 616 rows, 96% fill); G probes bound the new
    # body's VMEM-vs-fill tradeoff.  r5: kernel-only is 77.6 ms vs the
    # 63.5 ms floor (tools/exp_text_decomp2.py) with only ~1.6 ms of
    # non-kernel overhead in the composed path, so LB (layers per grid
    # step) probes attack the 3072-step grid's per-step cost.
    # LB VERDICT (r5, same-window): LB1 25853/25894 | LB2 20886 |
    # LB3 23129 | LB4 23714 | LB6 24289 sent/s — per-step overhead is
    # NOT the residual; multi-layer blocks degrade the layer-axis
    # weight double-buffering monotonically with block size.  RETIRED;
    # the default stays LB=1.
    probe({"UML_TEXT_TOWER": "1", "UML_TEXT_TOWER_G": "8"}, toks)
    for lb in ("2", "3", "4", "6"):
        probe({"UML_TEXT_TOWER": "1", "UML_TEXT_TOWER_G": "8",
               "UML_TEXT_TOWER_LB": lb}, toks)
    probe({"UML_TEXT_TOWER": "1", "UML_TEXT_TOWER_G": "8"}, toks)  # drift


if __name__ == "__main__":
    main()
