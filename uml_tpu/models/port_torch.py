"""Port torch CLIP checkpoints into the flax CLIP parameter tree.

Consumes an OpenAI-CLIP-format state_dict (the .pt files clip.load() pulls,
or any state_dict produced by the reference's vendored model —
engine/clip/model.py:405-442 describes the key schema) and emits
``{'params': ...}`` for :class:`uml_tpu.models.clip.CLIP`.

Layout conversions:
  * Conv2d OIHW -> flax HWIO
  * Linear [out, in] -> Dense kernel [in, out]
  * MultiheadAttention packed in_proj stays packed (our QKV Dense is the
    same fused [W, 3W] matmul)
  * fp16 storage (model.py:381-402 convert_weights) is upcast to fp32

Torch is used only to *read* checkpoints on the host; no torch compute.
"""

from __future__ import annotations

import numpy as np

from uml_tpu.models.clip import CLIP_CONFIGS, ClipConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd, prefix):
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T,
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _ln(sd, prefix):
    return {"ln": {"scale": _np(sd[f"{prefix}.weight"]),
                   "bias": _np(sd[f"{prefix}.bias"])}}


def _resblock(sd, prefix):
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "qkv": {
            "kernel": _np(sd[f"{prefix}.attn.in_proj_weight"]).T,
            "bias": _np(sd[f"{prefix}.attn.in_proj_bias"]),
        },
        "out_proj": _linear(sd, f"{prefix}.attn.out_proj"),
        "c_fc": _linear(sd, f"{prefix}.mlp.c_fc"),
        "c_proj": _linear(sd, f"{prefix}.mlp.c_proj"),
    }


def _transformer(sd, prefix, layers):
    return {
        f"resblocks_{i}": _resblock(sd, f"{prefix}.resblocks.{i}")
        for i in range(layers)
    }


def is_vit_checkpoint(sd) -> bool:
    return "visual.proj" in sd


def _text_config_from_state_dict(sd) -> dict:
    return dict(
        embed_dim=sd["text_projection"].shape[1],
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
        transformer_layers=len({
            k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")
        }),
    )


def resnet_config_from_state_dict(sd):
    """Infer a ClipResNetConfig from an RN checkpoint (model.py:414-421)."""
    from uml_tpu.models.clip_resnet import ClipResNetConfig

    counts = tuple(
        len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
        for b in (1, 2, 3, 4)
    )
    width = sd["visual.layer1.0.conv1.weight"].shape[0]
    out_width = round(
        (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
    return ClipResNetConfig(
        layers=counts,
        output_dim=sd["text_projection"].shape[1],
        width=width,
        image_resolution=out_width * 32,
    )


def config_from_state_dict(sd) -> ClipConfig:
    """Infer the ViT architecture from checkpoint shapes (model.py:405-428)."""
    assert is_vit_checkpoint(sd), "use resnet_config_from_state_dict for RN"
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_layers = len([
        k for k in sd
        if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")
    ])
    vision_patch_size = sd["visual.conv1.weight"].shape[-1]
    grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
    return ClipConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=vision_patch_size * grid,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
        transformer_layers=len({
            k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")
        }),
    )


def _port_text(sd, layers: int) -> dict:
    return {
        "token_embedding": {"embedding": _np(sd["token_embedding.weight"])},
        "positional_embedding": _np(sd["positional_embedding"]),
        "transformer": _transformer(sd, "transformer", layers),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]),
    }


def port_clip_resnet_checkpoint(sd):
    """RN50/RN101 state_dict -> (resnet_cfg, text ClipConfig, variables)."""
    from uml_tpu.models.clip_resnet import port_clip_resnet_state_dict

    rn_cfg = resnet_config_from_state_dict(sd)
    tc = _text_config_from_state_dict(sd)
    text_cfg = ClipConfig(
        embed_dim=tc["embed_dim"], image_resolution=rn_cfg.image_resolution,
        vision_layers=0, vision_width=rn_cfg.width, vision_patch_size=0,
        context_length=tc["context_length"], vocab_size=tc["vocab_size"],
        transformer_width=tc["transformer_width"],
        transformer_heads=tc["transformer_heads"],
        transformer_layers=tc["transformer_layers"])
    params = {
        "visual": port_clip_resnet_state_dict(sd, rn_cfg)["params"],
        "text": _port_text(sd, text_cfg.transformer_layers),
        "logit_scale": _np(sd["logit_scale"]),
    }
    return rn_cfg, text_cfg, {"params": params}


def port_clip_state_dict(sd) -> dict:
    """torch state_dict -> flax variables for uml_tpu.models.clip.CLIP."""
    cfg = config_from_state_dict(sd)
    visual = {
        "patch_embed": {
            # OIHW -> HWIO
            "kernel": _np(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0),
        },
        "class_embedding": _np(sd["visual.class_embedding"]),
        "positional_embedding": _np(sd["visual.positional_embedding"]),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "transformer": _transformer(sd, "visual.transformer", cfg.vision_layers),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": _np(sd["visual.proj"]),
    }
    params = {
        "visual": visual,
        "text": _port_text(sd, cfg.transformer_layers),
        "logit_scale": _np(sd["logit_scale"]),
    }
    return {"params": params}


def load_clip_checkpoint(path: str, dtype=None, quant: str = "none"):
    """Read a torch .pt/.pth CLIP checkpoint -> (model, flax variables).

    Dispatches ViT vs ModifiedResNet checkpoints by key schema.
    ``quant='int8'`` builds the ViT model in W8A8 serving mode (ops.quant);
    RN checkpoints ignore it (conv towers stay bf16).
    """
    import jax.numpy as jnp
    import torch

    from uml_tpu.models.clip import CLIP, ClipResNetModel

    dtype = dtype if dtype is not None else jnp.float32
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):  # jit archive or module
        obj = obj.state_dict()
    sd = {k: v for k, v in obj.items()
          if k not in ("input_resolution", "context_length", "vocab_size")}
    if is_vit_checkpoint(sd):
        cfg = config_from_state_dict(sd)
        return (CLIP(cfg, dtype=dtype, quant=quant),
                port_clip_state_dict(sd))
    rn_cfg, text_cfg, variables = port_clip_resnet_checkpoint(sd)
    return ClipResNetModel(rn_cfg, text_cfg, dtype=dtype), variables
