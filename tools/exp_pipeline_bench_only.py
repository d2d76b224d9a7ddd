"""Run bench.pipeline_bench alone on the real chip (ledger iteration).

Usage: timeout 1200 python tools/exp_pipeline_bench_only.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from uml_tpu.models.clip import build_clip

    model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    extract_sum = bench.make_extract(model)
    out = bench.pipeline_bench(extract_sum, variables)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
