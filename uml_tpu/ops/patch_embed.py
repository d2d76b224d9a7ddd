"""Patch embedding straight from uint8, normalization folded into weights.

The reference pipeline is `ToTensor -> Normalize -> conv` on float32
(engine/transforms/default.py:19-20 + clip/model.py:219).  Normalization is
an affine per-channel map, so it folds into the patch-embed convolution:

    normalize(u8)[c] = u8[c] * a[c] + d[c],   a = 1/(255*std), d = -mean/std
    conv(normalize(u8)) = conv_{W*a}(u8) + bias,  bias_o = sum_hwc W[h,w,c,o]*d[c]

which lets the uint8 batch (4x smaller than fp32, 2x smaller than bf16)
feed the MXU directly: patches are a reshape/transpose of the uint8 tensor,
cast to the compute dtype inside the matmul fusion — no separate
normalize pass over HBM, no C=3 convolution (XLA pads the 3-channel conv
to full lanes; measured 25 ms of a 204 ms ViT-B/16 bs512 forward).

Numerics: identical math to normalize->conv up to float reassociation
(the affine fold is exact in fp32; the matmul accumulates in fp32).
"""

from __future__ import annotations

import jax.numpy as jnp

from uml_tpu.ops.image_norm import PIXEL_MEAN, PIXEL_STD


def fold_normalization(kernel, mean=PIXEL_MEAN, std=PIXEL_STD):
    """conv kernel [p, p, 3, out] -> (scaled kernel, output bias [out])."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    a = 1.0 / (255.0 * std)                       # [3]
    d = -mean / std                               # [3]
    kf = kernel.astype(jnp.float32)
    scaled = kf * a[None, None, :, None]
    bias = jnp.einsum("hwco,c->o", kf, d)
    return scaled, bias


def extract_patches(images, patch: int):
    """[B, H, W, C] -> [B, (H/p)*(W/p), p*p*C] in (kh, kw, c) minor order,
    matching a [p, p, C, out] conv kernel reshaped to [p*p*C, out]."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


def patch_embed_u8(images_u8, kernel, *, dtype=jnp.bfloat16,
                   mean=PIXEL_MEAN, std=PIXEL_STD):
    """uint8 [B, H, W, 3] + conv kernel [p, p, 3, out] -> [B, N, out].

    Equals conv(normalize(images), kernel) with VALID padding and stride =
    patch size (the ViT patch embedding, clip/model.py:219).
    """
    p = kernel.shape[0]
    out = kernel.shape[-1]
    scaled, bias = fold_normalization(kernel, mean, std)
    patches = extract_patches(images_u8, p).astype(dtype)
    w = scaled.reshape(p * p * kernel.shape[2], out).astype(dtype)
    y = jnp.dot(patches, w, preferred_element_type=jnp.float32)
    return (y + bias).astype(dtype)
