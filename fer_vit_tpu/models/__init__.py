"""FER model zoo — Flax reimplementations of the reference model family."""

from fer_vit_tpu.models.latent_vit import LatentViT
from fer_vit_tpu.models.latent_vit_v2 import LatentViTv2
from fer_vit_tpu.models.image_vit import (
    ImageViT,
    create_vit_tiny,
    create_vit_small,
    create_vit_base,
)
from fer_vit_tpu.models.latent_cnn import (
    LatentCNN,
    LatentCNNDeep,
    LatentCNNLight,
    LatentCNN2D,
    create_latent_cnn,
)
from fer_vit_tpu.models.latent_decomposer import LatentDecomposer
from fer_vit_tpu.models.hybrid_latent_vit import (
    HybridLatentViT,
    create_hybrid_latent_vit,
    RECOMMENDED_STRATEGIES,
)
from fer_vit_tpu.models.expression_aware_vit import ExpressionAwareViT

__all__ = [
    "LatentViT",
    "LatentViTv2",
    "ImageViT",
    "create_vit_tiny",
    "create_vit_small",
    "create_vit_base",
    "LatentCNN",
    "LatentCNNDeep",
    "LatentCNNLight",
    "LatentCNN2D",
    "create_latent_cnn",
    "LatentDecomposer",
    "HybridLatentViT",
    "create_hybrid_latent_vit",
    "RECOMMENDED_STRATEGIES",
    "ExpressionAwareViT",
]
