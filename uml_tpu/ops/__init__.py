from uml_tpu.ops.attention import multi_head_attention, mha_reference, flash_attention
from uml_tpu.ops.image_norm import normalize_images

__all__ = [
    "multi_head_attention",
    "mha_reference",
    "flash_attention",
    "normalize_images",
]
