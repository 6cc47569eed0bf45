from sprc_tpu.ops.layers import LayerNormFP32, DenseGeneral, MlpBlock, quick_gelu
from sprc_tpu.ops.attention import dot_product_attention

__all__ = [
    "LayerNormFP32",
    "DenseGeneral",
    "MlpBlock",
    "quick_gelu",
    "dot_product_attention",
]
