"""Composed int8 ViT-B/16 A/B: group-flat out-proj + MLP slab chunking
(VERDICT r5 item 4 — close the 78% -> >=85% int8 serving gap).

exp_q8_decomp (r5): the int8 stacks run only 1.23x/1.30x their bf16
twins vs the ideal ~1.55x on projections — the quantize/dequant VPU
chains and the per-image out-proj's 13.7% int8 row-tile pad eat the MXU
win.  r5 changes under test here:
  * slab attention kernels now run the out-projection GROUP-FLAT
    ([G*S, HD] x [HD, K] in one dot) — bit-identical, ~1.5% pad;
  * UML_Q8_MLP_SLAB=n chunks the MLP slab so chunk k+1's LN+quantize
    (VPU) can overlap chunk k's fc dots (MXU) inside one program.

Slab knobs are trace-time reads, so each variant runs in a FRESH
subprocess (same pattern as the UML_TEXT_TOWER probes).

MEASURED VERDICT (r5, v5e, bs2048, one episode): flat-out 6415.3 |
mlp_slab=2 6244.2 | mlp_slab=1 6277.1 | per-image 6439.3 img/s.
Both hypotheses RETIRED — the group-flat out-proj is a wash (the pad
saving doesn't survive composition) and MLP chunking is a net loss
(the row-pad + shorter dots cost more than the VPU/MXU overlap buys).
The kernel keeps r4's per-image out-proj; UML_Q8_MLP_SLAB stays as an
A/B knob.  The int8 composition gap lives elsewhere (see
ops/tower_q8.py — the whole-tower int8 kernel).

Usage: timeout 2400 python tools/exp_q8_slab2.py            # all variants
       UML_EXP_VARIANT=... python tools/exp_q8_slab2.py     # child mode
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    ("flat-out slab=g (new default)", {}),
    ("flat-out mlp_slab=2", {"UML_Q8_MLP_SLAB": "2"}),
    ("flat-out mlp_slab=1", {"UML_Q8_MLP_SLAB": "1"}),
    ("per-image (UML_Q8_SLAB=0)", {"UML_Q8_SLAB": "0"}),
]


def child():
    import jax
    import jax.numpy as jnp

    import bench
    from uml_tpu.models.clip import build_clip

    model = build_clip("ViT-B/16", dtype=jnp.bfloat16, quant="int8")
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    extract_sum = bench.make_extract(model)
    imgs = bench.stage_input(bench.BATCH, 224 * 224 * 3)
    rate = bench.device_bench(extract_sum, variables, imgs, iters=10, runs=3)
    print(f"RESULT {rate:.1f}", flush=True)


def main():
    if os.environ.get("UML_EXP_VARIANT"):
        child()
        return
    for name, env in VARIANTS:
        e = {**os.environ, "UML_EXP_VARIANT": "1", **env}
        p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           capture_output=True, text=True, timeout=900,
                           env=e)
        rate = next((ln.split()[1] for ln in p.stdout.splitlines()
                     if ln.startswith("RESULT")), "FAIL")
        print(f"{name:32s} {rate:>9s} img/s", flush=True)
        if rate == "FAIL":
            print(p.stderr[-1500:], flush=True)


if __name__ == "__main__":
    main()
