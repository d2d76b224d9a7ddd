"""A/B the MLP activation epilogue inside the composed DINOv2-B/14
forward, to localize the family's composition gap (measured 3133 img/s
vs its ~4060 img/s analytic roofline, while B/16 composes to 92%).

Hypothesis: the in-kernel exact-GELU (A&S 7.1.26 polynomial erf — ~20
VPU ops incl. a divide and an exp per element, ln_matmul._erf_poly)
doesn't hide under the MXU dots at S=257 the way quick_gelu does at
S=197, so the VPU epilogue is on the critical path.

Controls: identity epilogue (upper bound: all epilogue cost removed)
and quick_gelu (CLIP's cheaper sigmoid form).  All three time the SAME
composed jitted model forward at the bench batch — isolated-kernel
timings through the relay are unreliable (40-90% slower than composed).

Usage: timeout 1500 python tools/exp_dino_act.py
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
    from uml_tpu.models.dino import DINO_CONFIGS, DinoViT
    from uml_tpu.ops import ln_matmul

    cfg, _ = DINO_CONFIGS["vit_base_patch14_dinov2.lvd142m"]
    model = DinoViT(cfg, dtype=jnp.bfloat16)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)))
    u8 = bench.stage_input(B, 224 * 224 * 3)

    real = dict(ln_matmul._KERNEL_ACTIVATIONS)

    def run(label, fn):
        ln_matmul._KERNEL_ACTIVATIONS["gelu_exact"] = fn
        # _mlp_block_fwd is jit-cached on (shapes, statics) — identical
        # across variants — so force a retrace to pick up the patched
        # table (recompiles hit the persistent XLA cache where unchanged)
        jax.clear_caches()

        @jax.jit
        def fwd(v, x):
            return model.apply(v, x, from_uint8=True).sum()

        rate = bench.device_bench(fwd, variables, u8, iters=5)
        print(f"{label:22s}: {rate:8.1f} img/s", flush=True)
        return rate

    try:
        base = run("gelu_exact (erf poly)", real["gelu_exact"])
        ident = run("identity epilogue", lambda x: x)
        quick = run("quick_gelu", real["quick_gelu"])
        base2 = run("gelu_exact (recheck)", real["gelu_exact"])
    finally:
        ln_matmul._KERNEL_ACTIVATIONS.update(real)
    print(f"epilogue cost: identity {100 * (ident / base - 1):+.1f}%  "
          f"quick_gelu {100 * (quick / base - 1):+.1f}%  "
          f"drift check {100 * (base2 / base - 1):+.1f}%")


if __name__ == "__main__":
    main()
