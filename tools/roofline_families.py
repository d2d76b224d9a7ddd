"""Analytic speed-of-light for every first-class encoder family, plus a
measured composed-forward fraction — so the per-family roofline numbers
quoted in COVERAGE.md are reproducible, not hand math.

FLOP accounting matches tools/roofline_clip.py exactly (2 flops/MAC, the
convention of the chip's 197 TF/s bf16 peak):
  * head-pair score packing doubles the scores+A@V term (the cost of
    d=64 heads on a 128-lane MXU — an unpacked layout pads the
    contraction 64->128 at the same cost);
  * the CLS-only final block is counted as the kernels execute it
    (ops/fused_attention._block_cls_kernel): K/V for all S rows,
    Q/scores/out-projection for CLS_ROWS=8 rows, and the final MLP on
    those 8 rows;
  * Mosaic's lane/sublane padding (e.g. scores S=257 -> 384 lanes) is
    NOT counted as algorithm cost — it is part of the composition gap
    the measured fraction reports.

The ViT-B/16 row is a cross-check: its GF/img must equal bench.py's
EXTRACTION_GFLOP_PER_IMG (34.094) and roofline_clip.py's total.
RN50 has no analytic row (conv profile; measured-only in bench.py).

Usage: timeout 1500 python tools/roofline_families.py
       UML_ROOFLINE_MEASURE=0 for the analytic table only (no TPU).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFS = 197.0
# MEASURED int8 MXU rate through Mosaic on this chip, not the 394-TOPS
# spec sheet: an in-kernel chain of VMEM-resident [512,2048]x[2048,2048]
# dots times int8 at 209 T(FL)OPS vs bf16's 134 under the same epilogue
# (tools/exp_int8_rate_pallas.py, drift 1.005) — a 1.555x rate.  The
# int8 speed-of-light uses the same 1.555x over the 197 TF/s bf16 peak
# (the constant the bf16 rooflines are expressed against), i.e. the
# ratio is what's measured, the absolute scale stays the spec peak so
# int8 and bf16 SoLs remain comparable.  The spec 2x is not reachable
# through Mosaic's current int8 matmul lowering on this jaxlib; rows
# computed against it would claim a ceiling no kernel can hit.
INT8_RATE_VS_BF16 = 1.555  # tools/exp_int8_rate_pallas.py (2026-08-19)
INT8_TOPS = PEAK_TFS * INT8_RATE_VS_BF16
CLS_ROWS = 8


def _vit_parts(k, heads, layers, s, mlp, patch, in_ch=3):
    """(projection GF, everything-else GF) per image, CLS-pooled ViT.

    'Projection' = the QKV / out-proj / fc1 / fc2 matmuls of the
    layers-1 non-final blocks — exactly the dots ops.quant runs int8.
    'Else' = pair-packed scores+A@V, the CLS-only final block, and the
    patch embed, which stay bf16 in both modes."""
    qkv = 2 * s * k * 3 * k
    sc_av = 2 * (2 * 2 * heads * s * s * 64)      # pair-packed (2x), sc+av
    out = 2 * s * k * k
    mlp_f = 2 * 2 * s * k * mlp
    cls_attn = (2 * s * k * 2 * k                 # K,V for all S rows
                + 2 * CLS_ROWS * k * k            # Q for 8 rows
                + 2 * 2 * heads * CLS_ROWS * s * 64   # 8-row scores + A@V
                + 2 * CLS_ROWS * k * k)           # 8-row out-proj
    cls_mlp = 2 * 2 * CLS_ROWS * k * mlp
    embed = 2 * (s - 1) * (patch * patch * in_ch) * k
    proj = (layers - 1) * (qkv + out + mlp_f)
    rest = (layers - 1) * sc_av + cls_attn + cls_mlp + embed
    return proj / 1e9, rest / 1e9


def vit_gflop_per_img(k, heads, layers, s, mlp, patch, in_ch=3):
    """Real MXU GF per image for a CLS-pooled ViT forward on our kernels."""
    proj, rest = _vit_parts(k, heads, layers, s, mlp, patch, in_ch)
    return proj + rest


def vit_int8_sol(k, heads, layers, s, mlp, patch, in_ch=3):
    """Speed of light (img/s) for the W8A8 mode (ops.quant): projection
    dots at the int8 MXU rate, everything else at the bf16 rate."""
    proj, rest = _vit_parts(k, heads, layers, s, mlp, patch, in_ch)
    return 1.0 / (proj / (INT8_TOPS * 1e3) + rest / (PEAK_TFS * 1e3))


def _text_parts(k, heads, layers, s, mlp, embed_dim):
    """(projection GF, else GF) per sentence, EOT-pooled causal text
    tower (S=77 context).  Every block is quantizable in the int8 mode
    (no CLS-only final block — pooling happens after ln_final); the
    token-embedding gather does no MXU work.  Causality does NOT halve
    the score FLOPs on our kernels: the pair-packed [S, S] dots run the
    full rectangle and mask (the fused kernels' actual execution)."""
    qkv = 2 * s * k * 3 * k
    sc_av = 2 * (2 * 2 * heads * s * s * 64)      # pair-packed (2x), sc+av
    out = 2 * s * k * k
    mlp_f = 2 * 2 * s * k * mlp
    proj = layers * (qkv + out + mlp_f)
    rest = layers * sc_av + 2 * k * embed_dim     # + final text projection
    return proj / 1e9, rest / 1e9


def text_gflop_per_sent(**shape):
    proj, rest = _text_parts(**shape)
    return proj + rest


def text_int8_sol(**shape):
    proj, rest = _text_parts(**shape)
    return 1.0 / (proj / (INT8_TOPS * 1e3) + rest / (PEAK_TFS * 1e3))


def families():
    from uml_tpu.models.clip import CLIP_CONFIGS
    from uml_tpu.models.dino import DINO_CONFIGS

    rows = []
    for name in ("ViT-B/16", "ViT-L/14"):
        c = CLIP_CONFIGS[name]
        s = c.grid_size ** 2 + 1
        shape = dict(k=c.vision_width, heads=c.vision_heads,
                     layers=c.vision_layers, s=s, mlp=4 * c.vision_width,
                     patch=c.vision_patch_size)
        rows.append((f"CLIP {name}", shape, ("clip", name)))
        if name == "ViT-B/16":
            rows.append((f"CLIP {name} int8 (W8A8)", dict(shape, int8=True),
                         ("clip_q8", name)))
    c = CLIP_CONFIGS["ViT-B/16"]
    text_shape = dict(k=c.transformer_width, heads=c.transformer_heads,
                      layers=c.transformer_layers, s=c.context_length,
                      mlp=4 * c.transformer_width, embed_dim=c.embed_dim,
                      text=True)
    rows.append(("CLIP ViT-B/16 text (77 ctx)", text_shape,
                 ("text", "ViT-B/16")))
    rows.append(("CLIP ViT-B/16 text int8 (W8A8)",
                 dict(text_shape, int8=True), ("text_q8", "ViT-B/16")))
    for name in ("vit_base_patch14_dinov2.lvd142m",
                 "vit_large_patch14_dinov2.lvd142m",
                 "vit_base_patch8_224_dino"):
        cfg, _ = DINO_CONFIGS[name]
        s = cfg.grid_size ** 2 + 1
        rows.append((name, dict(
            k=cfg.hidden_size, heads=cfg.num_heads, layers=cfg.num_layers,
            s=s, mlp=cfg.mlp_ratio * cfg.hidden_size,
            patch=cfg.patch_size), ("dino", name)))
    return rows


def measure(kind, name, batch):
    import jax
    import jax.numpy as jnp

    import bench

    if kind in ("clip", "clip_q8", "text", "text_q8"):
        model = bench.build_clip(
            name, dtype=jnp.bfloat16,
            quant="int8" if kind.endswith("q8") else "none")
        variables = bench.init_on_cpu(lambda: model.init(
            jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
            jnp.zeros((1, 77), jnp.int32)))
        if kind.startswith("text"):
            @jax.jit
            def extract(v, toks):
                return model.apply(
                    v, toks, method=lambda m, t: m.encode_text(t)).sum()

            tokens = bench.stage_tokens(batch)
            return bench.device_bench(extract, variables, tokens, iters=5)
        extract = bench.make_extract(model)
    else:
        from uml_tpu.models.dino import DINO_CONFIGS, DinoViT

        cfg, _ = DINO_CONFIGS[name]
        model = DinoViT(cfg, dtype=jnp.bfloat16)
        variables = bench.init_on_cpu(lambda: model.init(
            jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)))

        @jax.jit
        def extract(v, u8):
            return model.apply(v, u8,
                               method=lambda m, x: m(x, from_uint8=True)).sum()

    imgs = bench.stage_input(batch, 224 * 224 * 3)
    return bench.device_bench(extract, variables, imgs, iters=5)


def main():
    do_measure = os.environ.get("UML_ROOFLINE_MEASURE", "1") != "0"
    batch = int(os.environ.get("UML_ROOFLINE_BATCH", 2048))
    print(f"{'family':38s} {'GF/img':>8s} {'SOL img/s':>10s} "
          f"{'measured':>9s} {'fraction':>9s}", flush=True)
    for label, shape, (kind, name) in families():
        shape = dict(shape)
        is_int8 = shape.pop("int8", False)
        is_text = shape.pop("text", False)
        gf_fn = text_gflop_per_sent if is_text else vit_gflop_per_img
        gf = gf_fn(**shape)
        if is_int8:
            sol = (text_int8_sol if is_text else vit_int8_sol)(**shape)
        else:
            sol = PEAK_TFS * 1e3 / gf
        if do_measure:
            rate = measure(kind, name, batch)
            frac = f"{rate / sol:8.1%}"
            meas = f"{rate:9.1f}"
        else:
            meas, frac = "-".rjust(9), "-".rjust(9)
        print(f"{label:38s} {gf:8.3f} {sol:10.1f} {meas} {frac}",
              flush=True)


if __name__ == "__main__":
    main()
