"""DINOv2 B/14 batch-group sweep (VERDICT r5 item 6: nudge B/14 over
84% of its 4,337 img/s SoL — r4/r5 capture 3,612-3,615 = 83.4%).

The S=257 shape defaults to G=2 (the round-3 L/14 fix); B/14's smaller
K=768 tower leaves more VMEM headroom, so larger per-program groups may
amortize grid overhead.  UML_KERNEL_G is a trace-time read, but each
probe builds a fresh model (fresh jit closure -> re-trace), the
exp_fam_sweep pattern.

Usage: timeout 2000 python tools/exp_b14_g.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import uml_tpu  # noqa: F401
from bench import FAMILY_BUILDERS, device_bench, stage_input

B14 = "extract_dinov2_vitb14_img_per_s"


def probe(env_updates, imgs):
    for k in ("UML_VMEM_MB", "UML_KERNEL_G"):
        os.environ.pop(k, None)
    os.environ.update(env_updates)
    model, variables, method = FAMILY_BUILDERS[B14]()

    @jax.jit
    def extract(v, u8, model=model, method=method):
        return model.apply(v, u8, method=method).sum()

    t0 = time.time()
    rate = device_bench(extract, variables, imgs, iters=10, runs=3)
    print(f"b14 {env_updates}: {rate:.1f} img/s ({time.time() - t0:.0f}s)",
          flush=True)
    return rate


def main():
    imgs = stage_input(2048, 224 * 224 * 3)
    probe({}, imgs)
    probe({"UML_KERNEL_G": "4"}, imgs)
    probe({"UML_KERNEL_G": "1"}, imgs)
    probe({}, imgs)  # drift control


if __name__ == "__main__":
    main()
