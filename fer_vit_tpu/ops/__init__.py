"""Op-level building blocks: XLA-fused reference implementations plus Pallas
TPU kernels for the hot paths.

Every op has a pure-``jnp`` reference implementation (always correct, runs on
any backend — that is what the CPU-mesh tests exercise) and, where it pays
off, a Pallas TPU kernel selected automatically on TPU backends.
"""

from fer_vit_tpu.ops.attention import dot_product_attention
from fer_vit_tpu.ops.fused_irse_unit import (
    fused_irse_residual,
    fused_irse_residual_reference,
)

__all__ = [
    "dot_product_attention",
    "fused_irse_residual",
    "fused_irse_residual_reference",
]
