"""CLIP ModifiedResNet image towers (RN50 / RN101) in flax.

Behavioral parity with the vendored OpenAI CLIP ResNet
(engine/clip/model.py:10-150):
  * 3-conv stem (each conv 3x3, BN+ReLU) followed by avg-pool 2
  * anti-aliased strided Bottlenecks: stride>1 is an avgpool *before* the
    3rd conv, and the downsample branch is avgpool -> 1x1 conv -> BN
  * final AttentionPool2d: mean token prepended, learned positional
    embedding, one multi-head attention where the mean-token query attends
    over all spatial tokens (model.py:56-90)

BatchNorm defaults to inference mode off ported running statistics (the
reference freezes BN when linear-probing, head.py:115-121).  Full-finetune
BN *training* (torch semantics: batch statistics normalize, running stats
follow with momentum 0.1) is available via ``train_bn=True``; the updated
running stats come back through the mutable "bn_updates" collection and
are merged into the parameter tree after the optimizer step
(UMLHead.merge_bn_updates), keeping the torch-portable param layout.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ClipResNetConfig:
    layers: tuple[int, int, int, int]
    output_dim: int
    width: int = 64
    image_resolution: int = 224

    @property
    def heads(self) -> int:
        return self.width * 32 // 64

    @property
    def embed_dim(self) -> int:
        return self.output_dim


CLIP_RESNET_CONFIGS = {
    "RN50": ClipResNetConfig((3, 4, 6, 3), 1024),
    "RN101": ClipResNetConfig((3, 4, 23, 3), 512),
}


class FrozenBatchNorm(nn.Module):
    """BN over ported running stats; optional torch-style training mode.

    ``use_running_average=False`` normalizes with the batch statistics and
    exposes momentum-updated running stats via the "bn_updates" mutable
    collection (torch BatchNorm2d train(): biased variance normalizes,
    unbiased variance feeds the running estimate, momentum 0.1).
    """

    features: int
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        if use_running_average:
            inv = scale / jnp.sqrt(var + 1e-5)
            return (x * inv.astype(x.dtype)
                    + (bias - mean * inv).astype(x.dtype))
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        bmean = jnp.mean(xf, axes)
        bvar = jnp.maximum(jnp.mean(xf * xf, axes) - bmean * bmean, 0.0)
        inv = scale / jnp.sqrt(bvar + 1e-5)
        y = xf * inv + (bias - bmean * inv)
        n = max(x.size // x.shape[-1], 2)
        unbiased = bvar * n / (n - 1)
        new_mean = (1 - self.momentum) * mean + self.momentum * bmean
        new_var = (1 - self.momentum) * var + self.momentum * unbiased
        self.variable("bn_updates", "mean", lambda: new_mean).value = new_mean
        self.variable("bn_updates", "var", lambda: new_var).value = new_var
        return y.astype(x.dtype)


def _avg_pool(x, window):
    return nn.avg_pool(x, (window, window), strides=(window, window))


class Bottleneck(nn.Module):
    in_planes: int
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    EXPANSION = 4

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        ura = not train_bn
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(out, ura))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(out, ura))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = nn.Conv(self.planes * self.EXPANSION, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * self.EXPANSION,
                              name="bn3")(out, ura)

        identity = x
        if self.stride > 1 or self.in_planes != self.planes * self.EXPANSION:
            identity = _avg_pool(x, self.stride) if self.stride > 1 else x
            identity = nn.Conv(self.planes * self.EXPANSION, (1, 1),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(identity)
            identity = FrozenBatchNorm(self.planes * self.EXPANSION,
                                       name="downsample_bn")(identity, ura)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    embed_dim: int
    num_heads: int
    output_dim: int
    spacial_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C] -> tokens [B, HW+1, C] with mean token first
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = jnp.concatenate(
            [tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(c**-0.5),
                         (self.spacial_dim**2 + 1, c))
        tokens = tokens + pos.astype(tokens.dtype)

        nh = self.num_heads
        dh = c // nh
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(tokens[:, :1])
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(tokens)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(tokens)
        q = q.reshape(b, 1, nh, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, nh, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, nh, dh).transpose(0, 2, 1, 3)
        scores = (q @ k.transpose(0, 1, 3, 2)).astype(jnp.float32) * (dh**-0.5)
        attn = nn.softmax(scores, axis=-1)
        pooled = (attn.astype(v.dtype) @ v).transpose(0, 2, 1, 3).reshape(b, 1, c)
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(pooled)
        return out[:, 0].astype(jnp.float32)


class ModifiedResNet(nn.Module):
    config: ClipResNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels, return_tokens: bool = False,
                 train_bn: bool = False):
        cfg = self.config
        w = cfg.width
        ura = not train_bn
        x = pixels.astype(self.dtype)
        # 3-conv stem (model.py:107-114)
        x = nn.Conv(w // 2, (3, 3), strides=2, padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(w // 2, name="bn1")(x, ura))
        x = nn.Conv(w // 2, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.relu(FrozenBatchNorm(w // 2, name="bn2")(x, ura))
        x = nn.Conv(w, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv3")(x)
        x = nn.relu(FrozenBatchNorm(w, name="bn3")(x, ura))
        x = _avg_pool(x, 2)

        in_planes = w
        for stage, (blocks, planes, stride) in enumerate(zip(
                cfg.layers, (w, w * 2, w * 4, w * 8), (1, 2, 2, 2))):
            for blk in range(blocks):
                x = Bottleneck(
                    in_planes, planes, stride if blk == 0 else 1,
                    self.dtype, name=f"layer{stage + 1}_{blk}")(
                        x, train_bn=train_bn)
                in_planes = planes * Bottleneck.EXPANSION

        if return_tokens:
            b, h, wdim, c = x.shape
            return x.reshape(b, h * wdim, c).astype(jnp.float32)
        return AttentionPool2d(
            embed_dim=w * 32, num_heads=cfg.heads, output_dim=cfg.output_dim,
            spacial_dim=cfg.image_resolution // 32, dtype=self.dtype,
            name="attnpool")(x)


# ---------------------------------------------------------------------------
# torch porter
# ---------------------------------------------------------------------------


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def _conv(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}


def _bn(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"]),
            "mean": _np(sd[f"{prefix}.running_mean"]),
            "var": _np(sd[f"{prefix}.running_var"])}


def _linear(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T,
            "bias": _np(sd[f"{prefix}.bias"])}


def port_clip_resnet_state_dict(sd, config: ClipResNetConfig,
                                prefix: str = "visual.") -> dict:
    """torch CLIP ModifiedResNet state_dict -> flax params."""
    p = prefix
    params = {
        "conv1": _conv(sd, f"{p}conv1"), "bn1": _bn(sd, f"{p}bn1"),
        "conv2": _conv(sd, f"{p}conv2"), "bn2": _bn(sd, f"{p}bn2"),
        "conv3": _conv(sd, f"{p}conv3"), "bn3": _bn(sd, f"{p}bn3"),
    }
    for stage, blocks in enumerate(config.layers):
        for blk in range(blocks):
            tp = f"{p}layer{stage + 1}.{blk}"
            entry = {
                "conv1": _conv(sd, f"{tp}.conv1"), "bn1": _bn(sd, f"{tp}.bn1"),
                "conv2": _conv(sd, f"{tp}.conv2"), "bn2": _bn(sd, f"{tp}.bn2"),
                "conv3": _conv(sd, f"{tp}.conv3"), "bn3": _bn(sd, f"{tp}.bn3"),
            }
            if f"{tp}.downsample.0.weight" in sd:
                entry["downsample_conv"] = _conv(sd, f"{tp}.downsample.0")
                entry["downsample_bn"] = _bn(sd, f"{tp}.downsample.1")
            params[f"layer{stage + 1}_{blk}"] = entry
    params["attnpool"] = {
        "positional_embedding": _np(sd[f"{p}attnpool.positional_embedding"]),
        "q_proj": _linear(sd, f"{p}attnpool.q_proj"),
        "k_proj": _linear(sd, f"{p}attnpool.k_proj"),
        "v_proj": _linear(sd, f"{p}attnpool.v_proj"),
        "c_proj": _linear(sd, f"{p}attnpool.c_proj"),
    }
    return {"params": params}
