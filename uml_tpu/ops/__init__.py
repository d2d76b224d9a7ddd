from uml_tpu.ops.attention import (
    dense_attention_bshd,
    flash_attention,
    mha_reference,
    multi_head_attention,
)
from uml_tpu.ops.image_norm import normalize_images
from uml_tpu.ops.layer_norm import layer_norm
from uml_tpu.ops.quant import (
    ln_attn_block_q8,
    ln_mlp_block_q8,
    quantize_weight,
)

__all__ = [
    "multi_head_attention",
    "mha_reference",
    "flash_attention",
    "dense_attention_bshd",
    "normalize_images",
    "layer_norm",
    "ln_attn_block_q8",
    "ln_mlp_block_q8",
    "quantize_weight",
]
