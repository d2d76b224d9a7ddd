"""Does intra-image chain interleaving fix the backward dx chain?

tools/exp_bwd_attrib.py pinned the composed-backward loss to the dx
chain (235.6 ms vs a ~147 ms MXU floor at bs512) and retired cross-image
grouping (VMEM-infeasible, tools/exp_bwd_g512.py).  The remaining
hypothesis: within ONE image the 12 (head-pair, half) chains trace
strictly sequentially, so each chain's [S, S] softmax-backward VPU
passes have no adjacent independent MXU work.  UML_BWD_IL=N advances N
chains from different pairs stage by stage (_block_bwd_one_il) at ~0.3
MB extra VMEM per extra live chain.

Sweeps UML_BWD_IL in {0 (control), 2, 3, 4} over the composed 12-layer
tower backward at bs512: vjp_full (shipping config) and vjp_x_only (the
pure dx chain).  The env is read at trace time, so each variant jits
fresh.

Usage: timeout 3000 python tools/exp_bwd_il.py  [UML_EXP_BATCH=512]
"""

import os
import sys

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
    timeit("tower_fwd", fwd, x, params)

    for il in ("0", "2", "3", "4"):
        os.environ["UML_BWD_IL"] = il
        vjp_x = jax.jit(jax.grad(lambda x, p: tower(x, p).sum(), argnums=0))
        timeit(f"vjp_x_only[IL={il}]", vjp_x, x, params)
    for il in ("0", "2", "3"):
        os.environ["UML_BWD_IL"] = il
        vjp_full = jax.jit(jax.grad(lambda x, p: tower(x, p).sum(),
                                    argnums=(0, 1)))
        timeit(f"vjp_full[IL={il}]", vjp_full, x, params)


if __name__ == "__main__":
    main()
