"""Part 3: does per-program batch grouping fix the attention backward's
composed inefficiency at bs512?

The forward half-block kernels run G=4 images per program so the VLIW
scheduler can overlap one image's VPU softmax with another's MXU dots —
and compose to ~87% of roofline.  The backward kernel defaults to grp=1
(UML_BWD_G), leaving its per-pair softmax-backward VPU chains nothing to
overlap with.  tools/exp_g_step.py found G in {1,2,4} "within noise" at
bs128 on the full train step; this re-tests at bs512 directly on the
composed tower backward, where the dx chain measures ~88 ms over its MXU
floor (tools/exp_bwd_attrib.py).

UML_BWD_G is read at trace time (fused_attention._group_and_params), so
each variant gets a fresh jit traced under its own env value.

Usage: timeout 2400 python tools/exp_bwd_g512.py [UML_EXP_BATCH=512]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import uml_tpu  # noqa: F401
from tools.exp_bwd_attrib import make_params, timeit, tower

B = int(os.environ.get("UML_EXP_BATCH", 512))


def main():
    s, k = 197, 768
    with jax.default_device(jax.devices("cpu")[0]):
        x = jax.random.normal(jax.random.key(0), (B, s, k), jnp.bfloat16)
        params = make_params(jax.random.key(1), 12)
    x, params = jax.block_until_ready(
        jax.device_put(jax.tree.map(np.asarray, (x, params))))

    fwd = jax.jit(lambda x, p: tower(x, p).sum())
    t_fwd = timeit("tower_fwd", fwd, x, params)

    results = {}
    for g in ("1", "2", "4"):
        os.environ["UML_BWD_G"] = g
        vjp_full = jax.jit(jax.grad(lambda x, p: tower(x, p).sum(),
                                    argnums=(0, 1)))
        results[g] = timeit(f"vjp_full bwd_g={g}", vjp_full, x, params)
    os.environ.pop("UML_BWD_G", None)

    t_fwd2 = timeit("tower_fwd (drift control)", fwd, x, params)
    print(f"drift: {t_fwd2 / max(t_fwd, 1e-9):.4f}")
    for g, ms in results.items():
        print(f"  bwd[g={g}] = {ms - t_fwd:.2f} ms")


if __name__ == "__main__":
    main()
