"""Same-process family sweeps: DINOv2-B/14 VMEM-limit probes (the S=257
G=2 shape sits at ~83% of its roofline; does an explicit scoped-VMEM
raise move its double-buffering?) and a text-tower G=16 probe (S=77
rows pad 4-row sublanes; larger per-program groups amortize per-image
dispatch).  One process = one relay handshake; each probe re-jits a
fresh closure so trace-time env reads (UML_VMEM_MB / UML_KERNEL_G) take
effect without a new process.

Usage: timeout 3000 python tools/exp_fam_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import uml_tpu  # noqa: F401
from bench import FAMILY_BUILDERS, device_bench, stage_input, stage_tokens

BATCH = 2048


def probe(key, env_updates, imgs):
    for k in ("UML_VMEM_MB", "UML_KERNEL_G"):
        os.environ.pop(k, None)
    os.environ.update(env_updates)
    model, variables, method = FAMILY_BUILDERS[key]()

    @jax.jit
    def extract(v, u8, model=model, method=method):
        return model.apply(v, u8, method=method).sum()

    t0 = time.time()
    rate = device_bench(extract, variables, imgs, iters=3, runs=3)
    print(f"{key} {env_updates}: {rate:.1f}  ({time.time() - t0:.0f}s)",
          flush=True)
    return rate


def main():
    imgs = stage_input(BATCH, 224 * 224 * 3)
    toks = stage_tokens(BATCH)
    b14 = "extract_dinov2_vitb14_img_per_s"
    txt = "extract_text_bf16_sent_per_s"
    base = probe(b14, {}, imgs)
    for v in ("48", "80", "112"):
        probe(b14, {"UML_VMEM_MB": v}, imgs)
    probe(b14, {}, imgs)  # drift control
    tb = probe(txt, {}, toks)
    probe(txt, {"UML_KERNEL_G": "16"}, toks)
    probe(txt, {"UML_KERNEL_G": "8"}, toks)
    probe(txt, {}, toks)  # drift control
    print(f"bases: b14={base:.1f} text={tb:.1f}")


if __name__ == "__main__":
    main()
