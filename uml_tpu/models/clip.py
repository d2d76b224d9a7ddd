"""CLIP in flax: ViT image tower + causal text transformer with EOT pooling.

From-scratch JAX implementation with behavioral parity to the vendored
OpenAI CLIP (engine/clip/model.py): QuickGELU activations, LayerNorm
computed in fp32 (model.py:153-159), pre-LN residual blocks, class token +
learned positional embeddings, ``ln_post`` on the CLS token + linear
projection for images (model.py:219-239), and text pooling at the EOT token
(= argmax of token ids, model.py:342-362) through ``text_projection``.

Reference-API parity surface:
  * ``encode_image(pixels, return_tokens=...)``   (model.py:339-340)
  * ``encode_text(tokens, return_eot=..., return_tokens=...)``
  * ``embed_dim`` attribute                        (model.py:295)
  * named configs "ViT-B/16" / "ViT-B/32" / "ViT-L/14" (CLIP_CONFIGS) plus
    "RN50" / "RN101" via build_clip -> ClipResNetModel (models/clip_resnet.py)
    — all five reference encoder names (engine/config/__init__.py:76-80)
    dispatch through build_clip()

TPU-first details: batch-major [B, S, D] everywhere (no torch LND
permutes); the QKV projection is one packed matmul; attention runs through
uml_tpu.ops.multi_head_attention (Pallas flash kernel on TPU); compute
dtype is a parameter (bf16 for throughput) with LN + softmax statistics in
fp32.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from uml_tpu.ops.attention import dense_attention_bshd, multi_head_attention
from uml_tpu.ops.fused_attention import (CLS_ROWS, fold_ln_into_matmul,
                                         ln_attn_block, ln_attn_block_cls)
from uml_tpu.ops.ln_matmul import add_ln_matmul, ln_matmul, ln_mlp_block
from uml_tpu.ops.text_tower import supports_text_tower, text_tower
from uml_tpu.ops.patch_embed import patch_embed_u8


@dataclass(frozen=True)
class ClipConfig:
    embed_dim: int
    image_resolution: int
    vision_layers: int
    vision_width: int
    vision_patch_size: int
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12

    @property
    def vision_heads(self) -> int:
        return self.vision_width // 64

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size


CLIP_CONFIGS = {
    "ViT-B/16": ClipConfig(512, 224, 12, 768, 16),
    "ViT-B/32": ClipConfig(512, 224, 12, 768, 32),
    "ViT-L/14": ClipConfig(768, 224, 24, 1024, 14,
                           transformer_width=768, transformer_heads=12),
}


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class _LNScaleBias(nn.Module):
    """scale/bias params matching flax nn.LayerNorm's names, shapes, inits."""

    features: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))

    def __call__(self):
        return self.scale, self.bias


class _ConvKernel(nn.Module):
    """kernel param matching flax nn.Conv's name, shape, init."""

    shape: tuple  # (kh, kw, in, out)

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 self.shape)

    def __call__(self):
        return self.kernel


class _DenseKernelBias(nn.Module):
    """kernel/bias params matching flax nn.Dense's names, shapes, inits."""

    in_features: int
    features: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))

    def __call__(self):
        return self.kernel, self.bias


class FP32LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics, result cast back (model.py:153-159).

    epsilon matches torch's 1e-5 (flax defaults to 1e-6); the math matches
    flax nn.LayerNorm(use_fast_variance=True).  Param tree is identical to
    the flax-module version ("<name>/ln/{scale,bias}").

    Perf note (measured, v5e ViT-B/16 bs512): each standalone LN lowers to
    a convert+reduce fusion costing ~2.5 ms at [512, 197, 768] — 13x under
    the HBM bandwidth bound — and a standalone Pallas LN is *worse* because
    pallas_call is a fusion barrier.  The residual blocks therefore fuse
    LN into the following matmul (ops.ln_matmul) where the row tile is
    already VMEM-resident; this module remains for the pre/post/final LNs
    whose consumers aren't matmuls.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        scale, bias = _LNScaleBias(x.shape[-1], name="ln")()
        if return_params:
            return scale, bias
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(x.dtype)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    ln_matmul_impl: str = "auto"
    quant: str = "none"

    @nn.compact
    def __call__(self, x, causal: bool = False, cls_only: bool = False,
                 collect_weights: bool = False):
        """``cls_only``: compute only the first CLS_ROWS output rows (the
        final block of an encode-image path, where only the CLS token is
        consumed).  Row 0 equals the full block's row 0.

        ``collect_weights``: declare the block's params (same names,
        shapes, and order as a compute call) and return the LN-folded
        weight tuple instead of computing — the whole-tower kernels
        (ops.text_tower, ops.tower_q8) stack these across layers and run
        all L layers in one Pallas program.  ``True`` folds at
        ``self.dtype`` (the bf16 tower); ``"q8"`` folds the QKV/c_fc
        kernels in fp32 while casting out_proj/c_proj to ``self.dtype``
        — exactly the dtypes the per-layer int8 path quantizes from
        (ln_attn_block_q8 folds raw fp32 params; wo/w2 arrive pre-cast),
        so ops.quant.quantize_weight over these reproduces the
        per-layer integers bit-for-bit."""
        if collect_weights:
            ln1_scale, ln1_bias = FP32LayerNorm(name="ln_1")(
                x, return_params=True)
            qkv_kernel, qkv_bias = _DenseKernelBias(
                self.width, 3 * self.width, name="qkv")()
            out_kernel, out_bias = _DenseKernelBias(
                self.width, self.width, name="out_proj")()
            ln2_scale, ln2_bias = FP32LayerNorm(name="ln_2")(
                x, return_params=True)
            fc_kernel, fc_bias = _DenseKernelBias(
                self.width, 4 * self.width, name="c_fc")()
            proj_kernel, proj_bias = _DenseKernelBias(
                4 * self.width, self.width, name="c_proj")()
            fold_dtype = (qkv_kernel.dtype if collect_weights == "q8"
                          else self.dtype)
            w_eff, b_eff = fold_ln_into_matmul(
                ln1_scale, ln1_bias, qkv_kernel.astype(fold_dtype), qkv_bias)
            w1_eff, b1_eff = fold_ln_into_matmul(
                ln2_scale, ln2_bias, fc_kernel.astype(fold_dtype), fc_bias)
            return (w_eff, b_eff, out_kernel.astype(self.dtype), out_bias,
                    w1_eff, b1_eff, proj_kernel.astype(self.dtype), proj_bias)
        b, s, _ = x.shape
        h = self.heads
        d = self.width // h

        # which half-blocks run W8A8 (ops.quant): 'int8' quantizes both,
        # 'int8_mlp'/'int8_attn' one half (the mixed modes exist because
        # the two halves profit very differently — see tools/exp_q8_mix.py);
        # 'int8_qkv' = int8 MLP + qkv-only int8 attention (bf16 out-proj,
        # skipping the attention-output quantize — ops.quant q8_out=False)
        q8_halves = {"int8": ("attn", "mlp"), "int8_mlp": ("mlp",),
                     "int8_attn": ("attn",),
                     "int8_qkv": ("attn_qkv", "mlp"),
                     "none": ()}[self.quant]
        if q8_halves and not cls_only:
            # W8A8 serving path (ops.quant): int8 MXU dots for the
            # projection matmuls, per-row dynamic activation scales,
            # attention math identical to the bf16 kernels.  The final
            # cls_only block stays bf16 (it is ~1/layers of the work and
            # feeds the fp32 ln_post/proj epilogue directly).
            from uml_tpu.ops.quant import ln_attn_block_q8, ln_mlp_block_q8

            # honor an explicit 'reference' request on either impl knob
            # (e.g. dryrun_multichip's mesh-sharded jit, where an
            # un-sharding-ruled pallas_call must not engage): the q8 ops
            # then run their simulated-int8 jnp twins
            q8_impl = ("reference"
                       if "reference" in (self.attn_impl, self.ln_matmul_impl)
                       else "auto")
            ln1_scale, ln1_bias = FP32LayerNorm(name="ln_1")(
                x, return_params=True)
            qkv_kernel, qkv_bias = _DenseKernelBias(
                self.width, 3 * self.width, name="qkv")()
            out_kernel, out_bias = _DenseKernelBias(
                self.width, self.width, name="out_proj")()
            if "attn" in q8_halves or "attn_qkv" in q8_halves:
                x = ln_attn_block_q8(
                    x, ln1_scale, ln1_bias, qkv_kernel, qkv_bias,
                    out_kernel.astype(self.dtype), out_bias, heads=h,
                    causal=causal, impl=q8_impl,
                    q8_out="attn" in q8_halves)
            else:
                x = ln_attn_block(
                    x, ln1_scale, ln1_bias, qkv_kernel.astype(self.dtype),
                    qkv_bias, out_kernel.astype(self.dtype), out_bias,
                    heads=h, causal=causal,
                    impl=q8_impl if q8_impl == "reference" else
                    self.ln_matmul_impl)
            ln2_scale, ln2_bias = FP32LayerNorm(name="ln_2")(
                x, return_params=True)
            fc_kernel, fc_bias = _DenseKernelBias(
                self.width, 4 * self.width, name="c_fc")()
            proj_kernel, proj_bias = _DenseKernelBias(
                4 * self.width, self.width, name="c_proj")()
            if "mlp" in q8_halves:
                return ln_mlp_block_q8(
                    x, ln2_scale, ln2_bias, fc_kernel, fc_bias,
                    proj_kernel.astype(self.dtype), proj_bias,
                    activation="quick_gelu", impl=q8_impl)
            return ln_mlp_block(
                x, ln2_scale, ln2_bias, fc_kernel.astype(self.dtype), fc_bias,
                proj_kernel.astype(self.dtype), proj_bias,
                activation="quick_gelu",
                impl=q8_impl if q8_impl == "reference" else
                self.ln_matmul_impl)

        # pre-LN fused into the QKV matmul (ops.ln_matmul / the full
        # ops.fused_attention chain): one HBM read of the residual stream
        # instead of a standalone convert+reduce pass.  Param tree is
        # identical to FP32LayerNorm + nn.Dense.
        ln1_scale, ln1_bias = FP32LayerNorm(name="ln_1")(x, return_params=True)
        qkv_kernel, qkv_bias = _DenseKernelBias(
            self.width, 3 * self.width, name="qkv")()
        if self.attn_impl in ("auto", "fused") and self.ln_matmul_impl != "reference":
            # whole attention half-block in one kernel when supported: LN,
            # QKV matmul, per-head attention, the out-projection, and the
            # residual add run VMEM-resident (the packed qkv, the [S,S]
            # scores, and the attention tile never exist in HBM)
            out_kernel, out_bias = _DenseKernelBias(
                self.width, self.width, name="out_proj")()
            if cls_only and not causal:
                x = ln_attn_block_cls(
                    x, ln1_scale, ln1_bias, qkv_kernel.astype(self.dtype),
                    qkv_bias, out_kernel.astype(self.dtype), out_bias,
                    heads=h, impl=self.ln_matmul_impl)
            else:
                x = ln_attn_block(
                    x, ln1_scale, ln1_bias, qkv_kernel.astype(self.dtype),
                    qkv_bias, out_kernel.astype(self.dtype), out_bias,
                    heads=h, causal=causal, impl=self.ln_matmul_impl)
            ln2_scale, ln2_bias = FP32LayerNorm(name="ln_2")(
                x, return_params=True)
            fc_kernel, fc_bias = _DenseKernelBias(
                self.width, 4 * self.width, name="c_fc")()
            proj_kernel, proj_bias = _DenseKernelBias(
                4 * self.width, self.width, name="c_proj")()
            out = ln_mlp_block(x, ln2_scale, ln2_bias,
                               fc_kernel.astype(self.dtype), fc_bias,
                               proj_kernel.astype(self.dtype), proj_bias,
                               activation="quick_gelu",
                               impl=self.ln_matmul_impl)
            # cls_only + causal takes the full ln_attn_block path above
            # (ln_attn_block_cls is non-causal only) — slice here so the
            # output shape matches the non-fused branch for every arg combo
            return out[:, :CLS_ROWS] if cls_only else out

        qkv = ln_matmul(x, ln1_scale, ln1_bias,
                        qkv_kernel.astype(self.dtype), qkv_bias,
                        impl=self.ln_matmul_impl)
        if self.attn_impl == "dense_bshd":
            # transpose-free layout, kept for experimentation: re-measured
            # after the kernel/bf16-score work and still slower than the
            # transpose path on v5e (2420 vs 2852 img/s @ bs512) — XLA
            # prefers materializing [B,H,S,D] copies over batched-dim dots
            qkv = qkv.reshape(b, s, 3, h, d)
            attn = dense_attention_bshd(
                qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], causal=causal
            ).reshape(b, s, self.width)
        else:
            qkv = qkv.reshape(b, s, 3, h, d).transpose(2, 0, 3, 1, 4)
            attn = multi_head_attention(
                qkv[0], qkv[1], qkv[2], causal=causal, impl=self.attn_impl
            )
            attn = attn.transpose(0, 2, 1, 3).reshape(b, s, self.width)
        delta = nn.Dense(self.width, dtype=self.dtype, name="out_proj")(attn)

        # second half of the block in one fused program: residual add,
        # ln_2, the c_fc matmul, and the QuickGELU (ops.add_ln_matmul)
        ln2_scale, ln2_bias = FP32LayerNorm(name="ln_2")(x, return_params=True)
        fc_kernel, fc_bias = _DenseKernelBias(
            self.width, 4 * self.width, name="c_fc")()
        x, y = add_ln_matmul(x, delta, ln2_scale, ln2_bias,
                             fc_kernel.astype(self.dtype), fc_bias,
                             gelu=True, impl=self.ln_matmul_impl)
        out = x + nn.Dense(self.width, dtype=self.dtype, name="c_proj")(y)
        return out[:, :CLS_ROWS] if cls_only else out


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    ln_matmul_impl: str = "auto"
    quant: str = "none"

    @nn.compact
    def __call__(self, x, causal: bool = False, cls_only_last: bool = False):
        """``cls_only_last``: the final block computes only the first
        CLS_ROWS rows — for encode-image paths that keep just the CLS
        token (row 0 is identical to the full computation)."""
        if self._use_tower_q8(x, causal, cls_only_last):
            # whole-tower W8A8 path (ops.tower_q8): every FULL int8 layer
            # in one Pallas program (the final cls_only block stays bf16,
            # exactly like the per-layer int8 path).  Weights are folded
            # at the per-layer path's dtypes and pre-quantized with the
            # same quantize_weight, so the integers — and the features —
            # match the per-layer path's.
            from uml_tpu.ops.quant import quantize_weight
            from uml_tpu.ops.tower_q8 import tower_q8

            n_full = self.layers - (1 if cls_only_last else 0)
            per_layer = [
                ResidualAttentionBlock(
                    self.width, self.heads, self.dtype, self.attn_impl,
                    self.ln_matmul_impl, self.quant, name=f"resblocks_{i}",
                )(x, collect_weights="q8")
                for i in range(n_full)
            ]
            q8 = []
            for (w_eff, b_eff, wo, bo, w1_eff, b1_eff, w2, b2) in per_layer:
                wq, wsc = quantize_weight(w_eff)
                woq, wosc = quantize_weight(wo)
                w1q, w1sc = quantize_weight(w1_eff)
                w2q, w2sc = quantize_weight(w2)
                q8.append((wq, wsc, b_eff, woq, wosc, bo,
                           w1q, w1sc, b1_eff, w2q, w2sc, b2))
            stacked = [jnp.stack(t) for t in zip(*q8)]
            x = tower_q8(x, *stacked, heads=self.heads)
            if cls_only_last:
                x = ResidualAttentionBlock(
                    self.width, self.heads, self.dtype, self.attn_impl,
                    self.ln_matmul_impl, self.quant,
                    name=f"resblocks_{self.layers - 1}",
                )(x, cls_only=True)
            return x
        if self._use_tower(x, causal, cls_only_last):
            # whole-tower fused path (ops.text_tower): all L layers in
            # ONE Pallas program, the residual stream VMEM-resident
            # across layers, per-layer folded weights streamed — the
            # per-layer path's 2L dispatch barriers and 2L HBM
            # round-trips of x dominate at the text tower's small shape
            # (S=77, K=512).  Params are declared by the same blocks in
            # the same order (collect_weights), so the tree is identical.
            per_layer = [
                ResidualAttentionBlock(
                    self.width, self.heads, self.dtype, self.attn_impl,
                    self.ln_matmul_impl, self.quant, name=f"resblocks_{i}",
                )(x, collect_weights=True)
                for i in range(self.layers)
            ]
            stacked = [jnp.stack(t) for t in zip(*per_layer)]
            return text_tower(x, *stacked, heads=self.heads)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, self.dtype, self.attn_impl,
                self.ln_matmul_impl, self.quant, name=f"resblocks_{i}",
            )(x, causal=causal,
              cls_only=cls_only_last and i == self.layers - 1)
        return x

    def _use_tower_q8(self, x, causal, cls_only_last) -> bool:
        import os

        from uml_tpu.ops.tower_q8 import supports_tower_q8

        env = os.environ.get("UML_TOWER_Q8", "auto")
        if env == "0":
            return False
        d = self.width // self.heads
        ok = (not causal and self.quant == "int8"
              and self.attn_impl in ("auto", "fused")
              and self.ln_matmul_impl != "reference"
              and x.ndim == 3
              and self.layers > (1 if cls_only_last else 0)
              and supports_tower_q8(self.width, self.heads, d,
                                    x.shape[1], 4 * self.width))
        if env == "1":
            return ok
        # auto: OFF.  Measured on the v5e at the ViT-B/16 serving shape
        # (tools/exp_tower_q8.py, same-window): per-layer 6585/6590 vs
        # tower 6413 (G=2) / 5739 (G=4) img/s — at S=197/K=768 the
        # per-layer int8 kernels already pipeline across layer
        # boundaries, and the tower re-streams every layer's weights
        # per batch group (~7.1 MB x L x B/G), which costs more than the
        # 2L dispatch barriers it removes.  The win the text tower got
        # at S=77/K=512 does not transfer; kept as an opt-in
        # (UML_TOWER_Q8=1) for smaller-K serving shapes.
        return False

    def _use_tower(self, x, causal, cls_only_last) -> bool:
        import os

        env = os.environ.get("UML_TEXT_TOWER", "auto")
        if env == "0":
            return False
        d = self.width // self.heads
        ok = (causal and not cls_only_last and self.quant == "none"
              and self.attn_impl in ("auto", "fused")
              and self.ln_matmul_impl != "reference"
              and x.ndim == 3
              and supports_text_tower(self.width, self.heads, d,
                                      x.shape[1], 4 * self.width))
        if env == "1":
            return ok
        # auto: on-TPU only (the CPU/interpret path exists for tests but
        # the per-layer reference is faster there)
        return ok and jax.default_backend() not in ("cpu",)


class VisionTransformer(nn.Module):
    config: ClipConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    ln_matmul_impl: str = "auto"
    quant: str = "none"

    @nn.compact
    def __call__(self, pixels, return_tokens: bool = False,
                 from_uint8: bool = False):
        cfg = self.config
        scale = cfg.vision_width**-0.5
        p_sz = cfg.vision_patch_size
        b = pixels.shape[0]

        if from_uint8 and pixels.ndim == 2:
            # flat [B, H*W*3] uint8: the 4D [B, H, W, 3] layout pads the
            # 3-wide lane dim to 128 on TPU (42x HBM/transfer inflation);
            # callers transfer flat and the reshape fuses into the patch
            # extraction here, inside jit
            r = cfg.image_resolution
            pixels = pixels.reshape(b, r, r, 3)
        kernel = _ConvKernel((p_sz, p_sz, pixels.shape[-1], cfg.vision_width),
                             name="patch_embed")()
        if from_uint8:
            # CLIP normalization folded into the patch matmul: the uint8
            # batch feeds the MXU directly (ops.patch_embed)
            x = patch_embed_u8(pixels, kernel, dtype=self.dtype)
        else:
            # identical to nn.Conv(use_bias=False): VALID, stride = patch
            x = jax.lax.conv_general_dilated(
                pixels.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(p_sz, p_sz), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )  # [B, g, g, W]
            x = x.reshape(b, cfg.grid_size**2, cfg.vision_width)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (cfg.vision_width,)
        )
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(scale),
            (cfg.grid_size**2 + 1, cfg.vision_width),
        )
        cls = jnp.broadcast_to(
            class_embedding.astype(x.dtype), (b, 1, cfg.vision_width)
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + positional_embedding.astype(x.dtype)

        x = FP32LayerNorm(name="ln_pre")(x)
        x = Transformer(
            cfg.vision_width, cfg.vision_layers, cfg.vision_heads,
            self.dtype, self.attn_impl, self.ln_matmul_impl, self.quant,
            name="transformer",
        )(x, cls_only_last=not return_tokens)

        if return_tokens:
            return x  # [B, g^2+1, W] patch tokens incl. CLS (model.py:231-232)

        x = FP32LayerNorm(name="ln_post")(x[:, 0, :])
        proj = self.param(
            "proj", nn.initializers.normal(scale), (cfg.vision_width, cfg.embed_dim)
        )
        return (x @ proj.astype(x.dtype)).astype(jnp.float32)


class TextTransformer(nn.Module):
    config: ClipConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    ln_matmul_impl: str = "auto"
    quant: str = "none"

    @nn.compact
    def __call__(self, tokens, return_eot: bool = False, return_tokens: bool = False):
        cfg = self.config
        emb = nn.Embed(
            cfg.vocab_size, cfg.transformer_width,
            embedding_init=nn.initializers.normal(0.02),
            dtype=self.dtype, name="token_embedding",
        )(tokens)
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, cfg.transformer_width),
        )
        x = emb + positional_embedding[: tokens.shape[1]].astype(emb.dtype)

        x = Transformer(
            cfg.transformer_width, cfg.transformer_layers, cfg.transformer_heads,
            self.dtype, self.attn_impl, self.ln_matmul_impl, self.quant,
            name="transformer",
        )(x, causal=True)

        eot_indices = jnp.argmax(tokens, axis=-1)
        if return_tokens:
            x = FP32LayerNorm(name="ln_final")(x)
            return (x, eot_indices) if return_eot else x

        # pool the EOT row BEFORE ln_final: LN is per-row, so gather-then-
        # LN is bit-identical to LN-then-gather (model.py:358 applies
        # ln_final to all rows then pools) while running the fp32 pass
        # over [B, K] instead of [B, S, K] — S=77x less fp32 LN traffic
        # on the extraction path
        pooled = jnp.take_along_axis(x, eot_indices[:, None, None], axis=1)[:, 0]
        pooled = FP32LayerNorm(name="ln_final")(pooled)
        text_projection = self.param(
            "text_projection",
            nn.initializers.normal(cfg.transformer_width**-0.5),
            (cfg.transformer_width, cfg.embed_dim),
        )
        out = (pooled @ text_projection.astype(pooled.dtype)).astype(jnp.float32)
        return (out, eot_indices) if return_eot else out


class CLIP(nn.Module):
    """Full CLIP: image tower + text tower + logit scale."""

    config: ClipConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    ln_matmul_impl: str = "auto"
    quant: str = "none"

    def setup(self):
        self.visual = VisionTransformer(self.config, self.dtype,
                                        self.attn_impl, self.ln_matmul_impl,
                                        self.quant)
        self.text = TextTransformer(self.config, self.dtype,
                                    self.attn_impl, self.ln_matmul_impl,
                                    self.quant)
        self.logit_scale = self.param(
            "logit_scale", lambda key: jnp.asarray(np.log(1 / 0.07), jnp.float32)
        )

    @property
    def embed_dim(self) -> int:
        return self.config.embed_dim

    def encode_image(self, pixels, return_tokens: bool = False):
        return self.visual(pixels, return_tokens=return_tokens)

    def encode_image_u8(self, images_u8, return_tokens: bool = False):
        """uint8 images: CLIP-normalization folded into the patch embed."""
        return self.visual(images_u8, return_tokens=return_tokens,
                           from_uint8=True)

    def encode_text(self, tokens, return_eot: bool = False, return_tokens: bool = False):
        return self.text(tokens, return_eot=return_eot, return_tokens=return_tokens)

    def __call__(self, pixels, tokens):
        """Contrastive logits (model.py:364-378)."""
        img = self.encode_image(pixels)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


class ClipResNetModel(nn.Module):
    """CLIP with a ModifiedResNet image tower (RN50/RN101) and the same
    text tower / API as the ViT variant."""

    resnet_config: "object"           # clip_resnet.ClipResNetConfig
    text_config: ClipConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    ln_matmul_impl: str = "auto"

    def setup(self):
        from uml_tpu.models.clip_resnet import ModifiedResNet

        self.visual = ModifiedResNet(self.resnet_config, self.dtype)
        self.text = TextTransformer(self.text_config, self.dtype,
                                    self.attn_impl, self.ln_matmul_impl)
        self.logit_scale = self.param(
            "logit_scale", lambda key: jnp.asarray(np.log(1 / 0.07), jnp.float32)
        )

    @property
    def config(self):
        return self.text_config

    @property
    def embed_dim(self) -> int:
        return self.text_config.embed_dim

    def encode_image(self, pixels, return_tokens: bool = False,
                     train_bn: bool = False):
        return self.visual(pixels, return_tokens=return_tokens,
                           train_bn=train_bn)

    def encode_image_u8(self, images_u8, return_tokens: bool = False):
        """ResNet tower: no folding yet; normalize then encode.  Accepts
        flat [B, H*W*3] (the TPU transfer layout) or [B, H, W, 3]."""
        from uml_tpu.ops.image_norm import normalize_images

        if images_u8.ndim == 2:
            # square RGB assumed; infer the resolution from the flat dim
            # (tests run the tower at smaller sizes than the config's 224)
            r = int(round((images_u8.shape[1] // 3) ** 0.5))
            images_u8 = images_u8.reshape(images_u8.shape[0], r, r, 3)
        return self.visual(normalize_images(images_u8, self.dtype),
                           return_tokens=return_tokens)

    def encode_text(self, tokens, return_eot: bool = False, return_tokens: bool = False):
        return self.text(tokens, return_eot=return_eot, return_tokens=return_tokens)

    def __call__(self, pixels, tokens):
        img = self.encode_image(pixels)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


def clip_embed_dim(name: str) -> int:
    """Output feature dim per encoder name (parity with clip_outdim,
    finetune.py:41-44 — without loading any weights)."""
    if name in CLIP_CONFIGS:
        return CLIP_CONFIGS[name].embed_dim
    if name in ("RN50", "RN101"):
        from uml_tpu.models.clip_resnet import CLIP_RESNET_CONFIGS

        return CLIP_RESNET_CONFIGS[name].output_dim
    raise ValueError(f"Unknown CLIP encoder {name!r}")


def build_clip(name: str, dtype=jnp.float32, attn_impl: str = "auto",
               ln_matmul_impl: str = "auto", quant: str = "none"):
    """``quant='int8'``: W8A8 serving mode for the transformer towers
    (ops.quant) — inference-only, ViT/text transformers only (the RN
    towers are conv-profile and stay bf16).  ``'int8_mlp'``/
    ``'int8_attn'`` quantize only that half-block family (the mixed
    modes measured in tools/exp_q8_mix.py); ``'int8_qkv'`` = int8 MLPs
    plus qkv-only int8 attention (bf16 out-proj — skips the
    attention-output quantize)."""
    if name in ("RN50", "RN101"):
        from uml_tpu.models.clip_resnet import CLIP_RESNET_CONFIGS

        rn = CLIP_RESNET_CONFIGS[name]
        text_cfg = ClipConfig(
            embed_dim=rn.output_dim, image_resolution=rn.image_resolution,
            vision_layers=0, vision_width=rn.width, vision_patch_size=0,
            transformer_width=512, transformer_heads=8, transformer_layers=12)
        return ClipResNetModel(rn, text_cfg, dtype=dtype, attn_impl=attn_impl,
                               ln_matmul_impl=ln_matmul_impl)
    if name not in CLIP_CONFIGS:
        raise ValueError(f"Unknown CLIP encoder {name!r}; have {list(CLIP_CONFIGS)}")
    if quant not in ("none", "int8", "int8_mlp", "int8_attn", "int8_qkv"):
        raise ValueError(f"Unknown quant mode {quant!r}; have "
                         "none/int8/int8_mlp/int8_attn/int8_qkv")
    return CLIP(CLIP_CONFIGS[name], dtype=dtype, attn_impl=attn_impl,
                ln_matmul_impl=ln_matmul_impl, quant=quant)
