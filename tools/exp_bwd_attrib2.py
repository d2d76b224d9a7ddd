"""Part 2 of the composed-backward attribution: is the dx chain's ~88 ms
over-floor (tools/exp_bwd_attrib.py: x-only bwd 235.6 ms vs a ~147 ms MXU
floor at bs512) the MLP autodiff's hidden-width fp32 HBM streams?

Tests the composed 12-layer tower with the hand-written Pallas MLP
backward (UML_MLP_BWD=kernel — hidden stays VMEM-resident, intermediates
ship bf16) against the shipping XLA-autodiff MLP backward, full and
x-only.  The round-2 verdict ("kernel 9% slower end-to-end at bs128")
predates the composed-vs-isolated gap finding; this re-decides at bs512
inside the composed tower.

UML_MLP_BWD is read at trace time in _mlp_block_vjp_bwd, so each variant
gets its own jit and is traced under its own env value.

Usage: timeout 2400 python tools/exp_bwd_attrib2.py [UML_EXP_BATCH=512]
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
    for mode in ("", "kernel"):
        os.environ["UML_MLP_BWD"] = mode
        label = mode or "autodiff"
        vjp_full = jax.jit(jax.grad(lambda x, p: tower(x, p).sum(),
                                    argnums=(0, 1)))
        results[label, "full"] = timeit(
            f"vjp_full mlp={label}", vjp_full, x, params)
        vjp_x = jax.jit(jax.grad(lambda x, p: tower(x, p).sum(), argnums=0))
        results[label, "x"] = timeit(
            f"vjp_x_only mlp={label}", vjp_x, x, params)
    os.environ.pop("UML_MLP_BWD", None)

    t_fwd2 = timeit("tower_fwd (drift control)", fwd, x, params)
    print(f"drift: {t_fwd2 / max(t_fwd, 1e-9):.4f}")
    for (label, kind), ms in results.items():
        print(f"  bwd[{label},{kind}] = {ms - t_fwd:.2f} ms")


if __name__ == "__main__":
    main()
