"""Reusable pure layers (Flax modules) shared by the model zoo."""

from fer_vit_tpu.nn.initializers import (
    torch_linear_kernel_init,
    torch_linear_bias_init,
    torch_conv_kernel_init,
    trunc_normal_init,
)
from fer_vit_tpu.nn.transformer import (
    MultiHeadSelfAttention,
    TransformerEncoderLayer,
    TransformerEncoder,
)
from fer_vit_tpu.nn.preprocessing import LEAM, SemanticPE, LayerWiseNorm

__all__ = [
    "torch_linear_kernel_init",
    "torch_linear_bias_init",
    "torch_conv_kernel_init",
    "trunc_normal_init",
    "MultiHeadSelfAttention",
    "TransformerEncoderLayer",
    "TransformerEncoder",
    "LEAM",
    "SemanticPE",
    "LayerWiseNorm",
]
