"""Whole-tower int8 kernel A/B on the real chip (VERDICT r5 item 4).

Same-window probes, fresh model per config (UML_TOWER_Q8[_G] are
trace-time reads; a fresh build re-traces):

  per-layer   the r4 shipped path (UML_TOWER_Q8=0)
  tower G     ops.tower_q8 at several batch groups
  per-layer   drift control

Usage: timeout 2400 python tools/exp_tower_q8.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(env, imgs):
    import jax
    import jax.numpy as jnp

    import bench
    from uml_tpu.models.clip import build_clip

    old = {}
    for k, v in env.items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        model = build_clip("ViT-B/16", dtype=jnp.bfloat16, quant="int8")
        variables = bench.init_on_cpu(lambda: model.init(
            jax.random.key(0),
            jnp.zeros((1, 224, 224, 3), jnp.float32),
            jnp.zeros((1, 77), jnp.int32)))
        extract_sum = bench.make_extract(model)
        rate = bench.device_bench(extract_sum, variables, imgs,
                                  iters=10, runs=3)
        print(f"{str(env):44s} {rate:9.1f} img/s", flush=True)
        return rate
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    import bench

    imgs = bench.stage_input(bench.BATCH, 224 * 224 * 3)
    probe({"UML_TOWER_Q8": "0"}, imgs)
    for g in ("2", "4"):
        probe({"UML_TOWER_Q8": "1", "UML_TOWER_Q8_G": g}, imgs)
    probe({"UML_TOWER_Q8": "0"}, imgs)  # drift control


if __name__ == "__main__":
    main()
