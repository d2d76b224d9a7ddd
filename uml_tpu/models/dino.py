"""DINOv2 / DINO ViT image encoders in flax.

Covers the reference's timm vision-model choices (engine/config/__init__.py:
82-92): vit_{small,base,large}_patch14_dinov2.lvd142m (DINOv2: LayerScale,
LN eps 1e-6, patch 14, trained at 518 with position embeddings interpolated
to the 224 grid — the reference passes img_size=224, finetune.py:52) and
vit_base_patch{8,16}_224_dino (DINO v1: no LayerScale).

Output contract matches timm ``create_model(..., num_classes=0)``: pooled
features = CLS token after the final LayerNorm, dim = ``num_features``.

Weights port from HuggingFace ``facebook/dinov2-*`` torch checkpoints
(:func:`port_dinov2_state_dict`); the separate q/k/v projections are fused
into one packed QKV matmul at port time.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from uml_tpu.ops.attention import multi_head_attention


@dataclass(frozen=True)
class DinoConfig:
    hidden_size: int
    num_layers: int
    num_heads: int
    patch_size: int
    image_size: int = 224
    mlp_ratio: int = 4
    layerscale: bool = True          # DINOv2 yes, DINO v1 no
    ln_eps: float = 1e-6
    pretrain_image_size: int = 518   # grid the checkpoint's pos-emb was trained at

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_features(self) -> int:
        return self.hidden_size


# reference vision-model names -> config + HF checkpoint repo
DINO_CONFIGS = {
    "vit_small_patch14_dinov2.lvd142m": (
        DinoConfig(384, 12, 6, 14), "facebook/dinov2-small"),
    "vit_base_patch14_dinov2.lvd142m": (
        DinoConfig(768, 12, 12, 14), "facebook/dinov2-base"),
    "vit_large_patch14_dinov2.lvd142m": (
        DinoConfig(1024, 24, 16, 14), "facebook/dinov2-large"),
    "vit_base_patch16_224_dino": (
        DinoConfig(768, 12, 12, 16, layerscale=False, ln_eps=1e-6,
                   pretrain_image_size=224), "facebook/dino-vitb16"),
    "vit_base_patch8_224_dino": (
        DinoConfig(768, 12, 12, 8, layerscale=False, ln_eps=1e-6,
                   pretrain_image_size=224), "facebook/dino-vitb8"),
}


class _LNParams(nn.Module):
    """scale/bias matching flax nn.LayerNorm names/shapes/inits."""

    features: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))

    def __call__(self):
        return self.scale, self.bias


class _DenseParams(nn.Module):
    """kernel/bias matching flax nn.Dense names/shapes/inits."""

    in_features: int
    features: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))

    def __call__(self):
        return self.kernel, self.bias


class DinoBlock(nn.Module):
    config: DinoConfig
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x, cls_only: bool = False):
        """``cls_only``: compute only the first CLS_ROWS output rows (the
        final block of a token-pooled forward; row 0 == full block row 0)."""
        cfg = self.config
        b, s, _ = x.shape
        h = cfg.num_heads
        d = cfg.hidden_size // h
        dim = cfg.hidden_size

        # same fused-kernel structure as the CLIP blocks (ops.fused_attention
        # / ops.ln_matmul): the whole attention half-block (LN, QKV,
        # attention, out-projection, residual add) in one VMEM-resident
        # program, then LN+fc1+exact-GELU in another.  Param tree is
        # identical to the flax-module version; the layerscale vector is
        # folded into the out-projection (attn@wo*ls == attn@(wo*ls)).
        from uml_tpu.ops.fused_attention import ln_attn_block, ln_attn_block_cls
        from uml_tpu.ops.ln_matmul import ln_mlp_block

        ln1_scale, ln1_bias = _LNParams(dim, name="norm1")()
        qkv_kernel, qkv_bias = _DenseParams(dim, 3 * dim, name="qkv")()
        out_kernel, out_bias = _DenseParams(dim, dim, name="attn_out")()
        if cfg.layerscale:
            ls1 = self.param("layerscale1", nn.initializers.ones, (dim,))
            out_kernel = out_kernel * ls1[None, :]
            out_bias = out_bias * ls1
        if self.quant == "int8" and not cls_only:
            # W8A8 serving path (ops.quant) — the layerscale folds above
            # happen in float BEFORE quantization, so the per-channel
            # scales absorb them exactly.  The final cls_only block stays
            # bf16 (see models/clip.py).
            from uml_tpu.ops.quant import ln_attn_block_q8, ln_mlp_block_q8

            x = ln_attn_block_q8(x, ln1_scale, ln1_bias, qkv_kernel,
                                 qkv_bias, out_kernel.astype(self.dtype),
                                 out_bias, heads=h, eps=cfg.ln_eps)
            ln2_scale, ln2_bias = _LNParams(dim, name="norm2")()
            fc1_kernel, fc1_bias = _DenseParams(dim, cfg.mlp_ratio * dim,
                                                name="fc1")()
            fc2_kernel, fc2_bias = _DenseParams(cfg.mlp_ratio * dim, dim,
                                                name="fc2")()
            if cfg.layerscale:
                ls2 = self.param("layerscale2", nn.initializers.ones, (dim,))
                fc2_kernel = fc2_kernel * ls2[None, :]
                fc2_bias = fc2_bias * ls2
            return ln_mlp_block_q8(x, ln2_scale, ln2_bias, fc1_kernel,
                                   fc1_bias, fc2_kernel.astype(self.dtype),
                                   fc2_bias, eps=cfg.ln_eps,
                                   activation="gelu_exact")
        if cls_only:
            x = ln_attn_block_cls(x, ln1_scale, ln1_bias,
                                  qkv_kernel.astype(self.dtype), qkv_bias,
                                  out_kernel.astype(self.dtype), out_bias,
                                  heads=h, eps=cfg.ln_eps)
        else:
            x = ln_attn_block(x, ln1_scale, ln1_bias,
                              qkv_kernel.astype(self.dtype), qkv_bias,
                              out_kernel.astype(self.dtype), out_bias,
                              heads=h, eps=cfg.ln_eps)

        ln2_scale, ln2_bias = _LNParams(dim, name="norm2")()
        fc1_kernel, fc1_bias = _DenseParams(dim, cfg.mlp_ratio * dim,
                                            name="fc1")()
        fc2_kernel, fc2_bias = _DenseParams(cfg.mlp_ratio * dim, dim,
                                            name="fc2")()
        if cfg.layerscale:
            # fold layerscale2 into fc2 (y@W2*ls == y@(W2*ls))
            ls2 = self.param("layerscale2", nn.initializers.ones, (dim,))
            fc2_kernel = fc2_kernel * ls2[None, :]
            fc2_bias = fc2_bias * ls2
        return ln_mlp_block(x, ln2_scale, ln2_bias,
                            fc1_kernel.astype(self.dtype), fc1_bias,
                            fc2_kernel.astype(self.dtype), fc2_bias,
                            eps=cfg.ln_eps, activation="gelu_exact")


class _ConvKernelBias(nn.Module):
    """kernel/bias params matching flax nn.Conv's names, shapes, inits —
    so the uint8 fast path and the plain conv path share one param tree."""

    shape: tuple  # (kh, kw, in, out)

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 self.shape)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.shape[-1],))

    def __call__(self):
        return self.kernel, self.bias


class DinoViT(nn.Module):
    config: DinoConfig
    dtype: jnp.dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, pixels, return_tokens: bool = False, pool: str = "token",
                 from_uint8: bool = False):
        cfg = self.config
        b = pixels.shape[0]
        kernel, conv_bias = _ConvKernelBias(
            (cfg.patch_size, cfg.patch_size, 3, cfg.hidden_size),
            name="patch_embed")()
        if from_uint8:
            # uint8 fast path (same trick as the CLIP tower): the
            # reference applies one CLIP mean/std everywhere
            # (engine/transforms/default.py:19-20), so normalization folds
            # into the patch matmul and the uint8 batch (flat [B, H*W*3]
            # to avoid the 3-lane pad) feeds the MXU directly
            from uml_tpu.ops.patch_embed import patch_embed_u8

            if pixels.ndim == 2:
                # square RGB assumed; infer resolution from the flat dim
                r = int(round((pixels.shape[1] // 3) ** 0.5))
                pixels = pixels.reshape(b, r, r, 3)
            x = patch_embed_u8(pixels, kernel, dtype=self.dtype)
            x = (x + conv_bias.astype(jnp.float32)).astype(self.dtype)
        else:
            # identical to nn.Conv: VALID padding, stride = patch size
            x = jax.lax.conv_general_dilated(
                pixels.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(cfg.patch_size, cfg.patch_size),
                padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = x.reshape(b, cfg.grid_size**2, cfg.hidden_size)
            x = x + conv_bias.astype(x.dtype)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, cfg.hidden_size))
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (1, cfg.grid_size**2 + 1, cfg.hidden_size))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(x.dtype), (b, 1, cfg.hidden_size)), x],
            axis=1)
        x = x + pos.astype(x.dtype)

        cls_only_last = not return_tokens and pool == "token"
        for i in range(cfg.num_layers):
            x = DinoBlock(cfg, self.dtype, self.quant,
                          name=f"blocks_{i}")(
                x, cls_only=cls_only_last and i == cfg.num_layers - 1)

        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32,
                         name="norm")(x.astype(jnp.float32))
        if return_tokens:
            return x
        if pool == "token":
            return x[:, 0]
        if pool == "mean":
            return x[:, 1:].mean(axis=1)
        raise ValueError(f"unknown pool {pool!r}")


def interpolate_pos_embeddings(pos: np.ndarray, src_grid: int, dst_grid: int):
    """Bicubic-resample patch position embeddings [1, 1+src^2, D] to
    [1, 1+dst^2, D] (what timm/HF do when img_size differs from pretrain)."""
    if src_grid == dst_grid:
        return pos
    from PIL import Image

    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    d = patch_pos.shape[-1]
    grid = patch_pos.reshape(src_grid, src_grid, d)
    out = np.zeros((dst_grid, dst_grid, d), np.float32)
    # PIL resizes 2D planes; loop channels in chunks for memory sanity
    for c in range(d):
        img = Image.fromarray(grid[:, :, c].astype(np.float32), mode="F")
        out[:, :, c] = np.asarray(
            img.resize((dst_grid, dst_grid), Image.BICUBIC))
    return np.concatenate([cls_pos, out.reshape(1, dst_grid**2, d)], axis=1)


def port_dinov2_state_dict(sd, config: DinoConfig) -> dict:
    """HF Dinov2Model/ViTModel state_dict -> flax params for DinoViT."""

    def _np(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, np.float32)

    def linear(prefix):
        return {"kernel": _np(sd[f"{prefix}.weight"]).T,
                "bias": _np(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": _np(sd[f"{prefix}.weight"]),
                "bias": _np(sd[f"{prefix}.bias"])}

    # HF dinov2: encoder.layer.N...; HF ViT (dino v1): same schema via ViTModel
    def block(i):
        p = f"encoder.layer.{i}"
        q = _np(sd[f"{p}.attention.attention.query.weight"]).T
        k = _np(sd[f"{p}.attention.attention.key.weight"]).T
        v = _np(sd[f"{p}.attention.attention.value.weight"]).T
        qb = _np(sd[f"{p}.attention.attention.query.bias"])
        kb = _np(sd[f"{p}.attention.attention.key.bias"])
        vb = _np(sd[f"{p}.attention.attention.value.bias"])
        out = {
            "norm1": ln(f"{p}.norm1") if f"{p}.norm1.weight" in sd
            else ln(f"{p}.layernorm_before"),
            "norm2": ln(f"{p}.norm2") if f"{p}.norm2.weight" in sd
            else ln(f"{p}.layernorm_after"),
            "qkv": {"kernel": np.concatenate([q, k, v], axis=1),
                    "bias": np.concatenate([qb, kb, vb])},
            "attn_out": linear(f"{p}.attention.output.dense"),
            "fc1": linear(f"{p}.mlp.fc1") if f"{p}.mlp.fc1.weight" in sd
            else linear(f"{p}.intermediate.dense"),
            "fc2": linear(f"{p}.mlp.fc2") if f"{p}.mlp.fc2.weight" in sd
            else linear(f"{p}.output.dense"),
        }
        if config.layerscale:
            out["layerscale1"] = _np(sd[f"{p}.layer_scale1.lambda1"])
            out["layerscale2"] = _np(sd[f"{p}.layer_scale2.lambda1"])
        return out

    pos = _np(sd["embeddings.position_embeddings"])
    src_grid = round((pos.shape[1] - 1) ** 0.5)
    pos = interpolate_pos_embeddings(pos, src_grid, config.grid_size)

    params = {
        "patch_embed": {
            "kernel": _np(
                sd["embeddings.patch_embeddings.projection.weight"]
            ).transpose(2, 3, 1, 0),
            "bias": _np(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "cls_token": _np(sd["embeddings.cls_token"]),
        "position_embeddings": pos,
        "norm": ln("layernorm"),
        **{f"blocks_{i}": block(i) for i in range(config.num_layers)},
    }
    return {"params": params}


def load_dino(name: str, dtype=jnp.bfloat16, allow_random_init=False,
              quant: str = "none"):
    """-> (DinoViT, variables). Loads HF weights from the local cache.
    ``quant='int8'``: W8A8 serving mode for the transformer blocks (the
    CLIP-only mixed modes int8_mlp/int8_attn are not supported here)."""
    if quant not in ("none", "int8"):
        raise ValueError(f"Unknown DINO quant mode {quant!r}; have none/int8")
    cfg, repo = DINO_CONFIGS[name]
    model = DinoViT(cfg, dtype=dtype, quant=quant)
    try:
        import torch
        from transformers import AutoModel

        hf = AutoModel.from_pretrained(repo)
        variables = port_dinov2_state_dict(hf.state_dict(), cfg)
        print(f"=> Loaded {name} weights from {repo}")
        return model, variables
    except Exception as e:
        if not allow_random_init:
            raise FileNotFoundError(
                f"Could not load pretrained weights for {name} ({repo}): {e}. "
                "Populate the local HF cache or pass allow_random_init."
            ) from e
        print(f"=> [random-init] {name} ({e})")
        variables = jax.jit(model.init)(
            jax.random.key(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32))
        return model, variables
