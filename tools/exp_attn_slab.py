"""A/B the UML_ATTN_SLAB=1 QKV slab inside the composed ViT-B/16
extraction forward (same-process, same relay window — cross-window
drift is ~1%, bigger than the expected effect).

The slab runs each program's QKV projection as one [G*S, K] dot instead
of G separate [S, K] dots, amortizing the bf16 8-sublane pad
(197 -> 200 rows, 1.5%) the way the MLP kernel's full-G slab measured
+0.5%.  The env var is read at trace time in ops.fused_attention's
_block_fwd, so each variant clears the jit cache to force a retrace
(recompiles hit the persistent XLA cache where unchanged).

Usage: timeout 1800 python tools/exp_attn_slab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("UML_EXP_BATCH", 2048))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from uml_tpu.models.clip import build_clip

    model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    u8 = bench.stage_input(B, 224 * 224 * 3)

    def run(label, slab):
        if slab:
            os.environ["UML_ATTN_SLAB"] = "1"
        else:
            os.environ.pop("UML_ATTN_SLAB", None)
        jax.clear_caches()

        @jax.jit
        def fwd(v, x):
            return model.apply(v, x,
                               method=lambda m, y: m.encode_image_u8(y)).sum()

        rate = bench.device_bench(fwd, variables, u8, iters=5)
        print(f"{label:12s}: {rate:8.1f} img/s", flush=True)
        return rate

    base = run("per-image", False)
    slab = run("slab", True)
    base2 = run("per-image#2", False)   # drift control
    print(f"slab/base: {slab / base:.4f}  (drift control "
          f"base2/base {base2 / base:.4f})")


if __name__ == "__main__":
    main()
