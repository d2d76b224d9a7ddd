"""Stage-interleave (UML_BWD_IL) A/B on the STASH backward: the stash
removed the qkv-recompute and fwd-out dots; does interleaving the
remaining (pair, half) chains still help the dx chain's VPU/MXU overlap?
One process; fresh jits per setting (env read at trace time).

Usage: timeout 3000 python tools/exp_stash_il.py
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

LAYERS = 12


def main():
    s, k = 197, 768
    for bsz in (128, 512):
        with jax.default_device(jax.devices("cpu")[0]):
            x = jax.random.normal(jax.random.key(0), (bsz, s, k),
                                  jnp.bfloat16)
            params = make_params(jax.random.key(1), LAYERS)
        x, params = jax.block_until_ready(
            jax.device_put(jax.tree.map(np.asarray, (x, params))))
        base = None
        for il in ("0", "3", "2", "0"):
            os.environ["UML_BWD_IL"] = il
            vjp = jax.jit(jax.grad(lambda x, p: tower(x, p).sum(),
                                   argnums=(0, 1)))
            t = timeit(f"bs{bsz} vjp_full[stash,IL={il}]", vjp, x, params)
            if base is None:
                base = t
        print(f"bs{bsz}: last/first drift {t / base:.4f}")
        del x, params


if __name__ == "__main__":
    main()
