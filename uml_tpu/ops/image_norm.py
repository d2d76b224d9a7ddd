"""Fused on-device image normalization.

Device half of the input pipeline: batches cross PCIe as uint8 HWC (4x
fewer bytes than float32) and are converted + CLIP-normalized on device.
Parity target: engine/transforms/default.py:19-20 mean/std.

Deliberately *not* a Pallas kernel: the op is a memory-bound elementwise
chain that XLA fuses into a single HBM pass (and usually straight into the
patch-embedding conv that consumes it), and an HWC uint8 block has a
3-wide lane dimension that Mosaic would pad to 128.  The performance lever
here is the uint8 host->device transfer, which this module's contract
(uint8 in, normalized dtype out, on device, inside jit) locks in.
"""

from __future__ import annotations

import jax.numpy as jnp

PIXEL_MEAN = (0.48145466, 0.4578275, 0.40821073)
PIXEL_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize_images(batch_uint8, dtype=jnp.float32):
    """uint8 [..., H, W, 3] -> CLIP-normalized dtype [..., H, W, 3].

    Call inside jit so the cast/scale/shift fuses with the consumer.
    """
    mean = jnp.asarray(PIXEL_MEAN, jnp.float32)
    inv_std = 1.0 / jnp.asarray(PIXEL_STD, jnp.float32)
    x = batch_uint8.astype(jnp.float32) * (1.0 / 255.0)
    return ((x - mean) * inv_std).astype(dtype)
