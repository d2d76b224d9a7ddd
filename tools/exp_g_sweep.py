"""A/B the per-program batch group G and the Mosaic VMEM limit on the
extraction forward (bench.py device path, bs2048).

Each config runs in a subprocess (the env knobs are read at trace time, so
one process would silently reuse the first config's compiled program).

Usage: python tools/exp_g_sweep.py [configs like 4:0 8:64 16:64]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = r"""
import time
import jax, jax.numpy as jnp
import numpy as np
from uml_tpu.models.clip import build_clip

BATCH = 2048
model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
# eager init: a jitted full-CLIP init is a fresh ~10 min relay compile
variables = model.init(
    jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
    jnp.zeros((1, 77), jnp.int32))

@jax.jit
def extract_sum(v, u8):
    return model.apply(v, u8, method=lambda m, x: m.encode_image_u8(x)).sum()

imgs = jax.device_put(jnp.asarray(np.random.default_rng(0).integers(
    0, 256, (BATCH, 224 * 224 * 3), dtype=np.uint8)))
float(extract_sum(variables, imgs))
rates = []
for _ in range(3):
    t0 = time.time()
    outs = [extract_sum(variables, imgs) for _ in range(10)]
    _ = [float(o) for o in outs]
    rates.append(BATCH / ((time.time() - t0) / 10))
import os
print(f"RESULT G={os.environ.get('UML_KERNEL_G','4')} "
      f"VMEM={os.environ.get('UML_VMEM_MB','0')}MB: "
      f"median {sorted(rates)[1]:.1f} img/s  (runs: "
      + " ".join(f"{r:.0f}" for r in rates) + ")")
"""


def main():
    configs = sys.argv[1:] or ["4:0", "8:64", "16:64"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cfg in configs:
        g, vmem = cfg.split(":")
        env = dict(os.environ, UML_KERNEL_G=g, UML_VMEM_MB=vmem)
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
