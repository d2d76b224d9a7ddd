"""A/B the UML_ATTN_PACKED=1 packed-keys score layout inside composed
extraction forwards (same-process, same relay window — cross-window
drift is ~1%, bigger than some expected effects).

The packed layout computes each head pair's scores as ONE
[Sq,128]x[128,2S] dot (both heads' keys side by side in the lane dim)
instead of two [Sq,128]x[128,S] dots.  Mosaic pads the score lane dim
to 128, so the old layout pays 2*pad128(S) lanes per pair while packed
pays pad128(2S):

  S=197 (ViT-B/16):  2*256 = 512  vs  pad(394) = 512   (neutral lanes,
                                                         half the dots)
  S=257 (B/14, L/14): 2*384 = 768  vs  pad(514) = 640   (-17%)
  S=785 (DINO B/8):  2*896 = 1792 vs  pad(1570) = 1664  (-7%)

The env var is read at trace time in ops.fused_attention's
_pair_attention_split, so each variant clears the jit cache to force a
retrace (recompiles hit the persistent XLA cache where unchanged).

Usage: timeout 3600 python tools/exp_attn_packed.py [family ...]
  families: b16 (default) b14 l14
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("UML_EXP_BATCH", 2048))


def build(family, bench):
    import jax
    import jax.numpy as jnp

    if family == "b16":
        from uml_tpu.models.clip import build_clip

        model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
        variables = bench.init_on_cpu(lambda: model.init(
            jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
            jnp.zeros((1, 77), jnp.int32)))
        method = lambda m, x: m.encode_image_u8(x)
    else:
        from uml_tpu.models.dino import DINO_CONFIGS, DinoViT

        name = {"b14": "vit_base_patch14_dinov2.lvd142m",
                "l14": "vit_large_patch14_dinov2.lvd142m"}[family]
        cfg, _ = DINO_CONFIGS[name]
        model = DinoViT(cfg, dtype=jnp.bfloat16)
        variables = bench.init_on_cpu(lambda: model.init(
            jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)))
        method = lambda m, x: m(x, from_uint8=True)
    return model, variables, method


def main():
    import jax

    import bench

    families = sys.argv[1:] or ["b16"]
    u8 = bench.stage_input(B, 224 * 224 * 3)
    for family in families:
        model, variables, method = build(family, bench)

        def run(label, packed):
            if packed:
                os.environ["UML_ATTN_PACKED"] = "1"
            else:
                os.environ.pop("UML_ATTN_PACKED", None)
            jax.clear_caches()

            @jax.jit
            def fwd(v, x):
                return model.apply(v, x, method=method).sum()

            rate = bench.device_bench(fwd, variables, u8, iters=5)
            print(f"{family} {label:12s}: {rate:8.1f} img/s", flush=True)
            return rate

        base = run("unpacked", False)
        pk = run("packed", True)
        base2 = run("unpacked#2", False)
        print(f"{family} packed/base: {pk / base:.4f}  "
              f"(drift control base2/base {base2 / base:.4f})", flush=True)


if __name__ == "__main__":
    main()
