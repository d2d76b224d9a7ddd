"""A/B the forward-stashed backward (UML_BWD_STASH) on the composed
12-layer ViT-B tower and the full finetune step.

Hypothesis (round 4): the recomputing attention backward spends ~30% of
its MXU work re-deriving qkv (2*S*K*3K MACs/img/layer) and ~5% more on
the per-pair e@v output dots whose only consumer is dwo.  Stashing both
from the forward costs S*(3K+K)*2 B of HBM per img per layer
(~9 ms/backward of traffic at bs512 vs ~70-90 ms of compute saved if
the dx chain's 60%-over-floor composition scales with its MXU work).

Measures, same relay window, in order:
  tower_fwd[stash=0/1]      forward cost of writing the stashes
  vjp_full[stash=0/1]       fwd+bwd(x+params) — the shipping config
  train_step[stash=0/1]     full finetune step at UML_EXP_BATCH
  tower_fwd drift control

Usage: timeout 3000 python tools/exp_bwd_stash.py   [UML_EXP_BATCH=512]
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
LAYERS = 12


def main():
    s, k = 197, 768
    with jax.default_device(jax.devices("cpu")[0]):
        x = jax.random.normal(jax.random.key(0), (B, s, k), jnp.bfloat16)
        params = make_params(jax.random.key(1), LAYERS)
    x, params = jax.block_until_ready(
        jax.device_put(jax.tree.map(np.asarray, (x, params))))

    results = {}
    for stash in ("0", "1"):
        os.environ["UML_BWD_STASH"] = stash
        # fresh traces per setting: the env is read at trace time
        fwd = jax.jit(lambda x, p: tower(x, p).sum())
        vjp_full = jax.jit(jax.grad(lambda x, p: tower(x, p).sum(),
                                    argnums=(0, 1)))
        results[f"fwd[{stash}]"] = timeit(
            f"tower_fwd[stash={stash}]", fwd, x, params)
        results[f"full[{stash}]"] = timeit(
            f"vjp_full[stash={stash}]", vjp_full, x, params)

    os.environ["UML_BWD_STASH"] = "0"
    fwd = jax.jit(lambda x, p: tower(x, p).sum())
    t2 = timeit("tower_fwd drift control", fwd, x, params)
    print(f"drift: {t2 / max(results['fwd[0]'], 1e-9):.4f}")
    b0 = results["full[0]"]
    b1 = results["full[1]"]
    print(f"vjp_full stash/base: {b1 / b0:.4f} "
          f"(bwd-only approx {b1 - results['fwd[1]']:.1f} vs "
          f"{b0 - results['fwd[0]']:.1f} ms)")

    # numerics cross-check on-device: same grads both ways
    os.environ["UML_BWD_STASH"] = "0"
    g0 = jax.jit(jax.grad(lambda x, p: (tower(x, p) ** 2).sum(),
                          argnums=1))(x[:8], params)
    os.environ["UML_BWD_STASH"] = "1"
    g1 = jax.jit(jax.grad(lambda x, p: (tower(x, p) ** 2).sum(),
                          argnums=1))(x[:8], params)
    rel = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32)))
                    / (1e-6 + jnp.max(jnp.abs(a.astype(jnp.float32)))))
              for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)))
    print(f"max rel grad diff stash vs base (device): {rel:.2e}")


if __name__ == "__main__":
    main()
