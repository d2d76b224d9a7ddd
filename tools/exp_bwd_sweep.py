"""A/B the attention-backward kernel's batch group (UML_BWD_G) on the
full-finetune step (bench.py train_bench shape, bs128).

Usage: python tools/exp_bwd_sweep.py [configs like 1:0 2:64 4:64]
"""

import os
import subprocess
import sys

CHILD = r"""
import time
import jax, jax.numpy as jnp
import numpy as np
import optax
from uml_tpu.models.clip import build_clip

b = 128
model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
# eager init: a jitted full-CLIP init is a fresh ~10 min relay compile
variables = model.init(
    jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
    jnp.zeros((1, 77), jnp.int32))
rng = np.random.default_rng(0)
u8 = jax.device_put(jnp.asarray(
    rng.integers(0, 256, (b, 224 * 224 * 3), dtype=np.uint8)))
labels = jnp.asarray(rng.integers(0, 100, (b,)), jnp.int32)
head = jnp.asarray(rng.standard_normal((512, 100)) * 0.01, jnp.float32)
params = variables["params"]
tx = optax.adamw(1e-5)
opt = tx.init(params)

def loss_fn(p, u8, labels):
    feats = model.apply({"params": p}, u8,
                        method=lambda m, x: m.encode_image_u8(x))
    return optax.softmax_cross_entropy_with_integer_labels(
        feats @ head, labels).mean()

@jax.jit
def step(p, o, u8, labels):
    loss, grads = jax.value_and_grad(loss_fn)(p, u8, labels)
    updates, o = tx.update(grads, o, p)
    return optax.apply_updates(p, updates), o, loss

p, o, l = step(params, opt, u8, labels)
float(l)
rates = []
for _ in range(3):
    t0 = time.time()
    for _ in range(5):
        p, o, l = step(p, o, u8, labels)
    float(l)
    rates.append(b * 5 / (time.time() - t0))
import os
print(f"RESULT BWD_G={os.environ.get('UML_BWD_G','1')} "
      f"VMEM={os.environ.get('UML_VMEM_MB','0')}MB "
      f"MLP_BWD={os.environ.get('UML_MLP_BWD','xla')}: "
      f"median {sorted(rates)[1]:.1f} img/s  (runs: "
      + " ".join(f"{r:.0f}" for r in rates) + ")")
"""


def main():
    configs = sys.argv[1:] or ["1:0", "2:64", "4:64"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cfg in configs:
        g, vmem = cfg.split(":")[:2]
        env = dict(os.environ, UML_BWD_G=g, UML_VMEM_MB=vmem)
        if cfg.endswith(":kernel"):
            env["UML_MLP_BWD"] = "kernel"
        proc = subprocess.run([sys.executable, "-c", CHILD], cwd=repo,
                              env=env, capture_output=True, text=True,
                              timeout=1500)
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
        if proc.returncode != 0:
            print(f"CONFIG {cfg} FAILED:\n{proc.stderr[-1500:]}", flush=True)


if __name__ == "__main__":
    main()
