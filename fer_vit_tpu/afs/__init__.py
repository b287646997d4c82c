"""AFS (attribute-feature-style) subsystem: style extractor h, losses,
pair sampling, image providers, and the style-extractor trainer."""

from fer_vit_tpu.afs.style_extractor import (
    HighwayLayer,
    StyleBlock,
    StyleExtractor,
)
from fer_vit_tpu.afs.losses import AFSLoss
from fer_vit_tpu.afs.pair_sampling import PairLatentStore, sample_pair_indices
from fer_vit_tpu.afs.image_provider import (
    DiskImageProvider,
    GeneratedImageProvider,
    ImageProvider,
)

__all__ = [
    "HighwayLayer",
    "StyleBlock",
    "StyleExtractor",
    "AFSLoss",
    "PairLatentStore",
    "sample_pair_indices",
    "DiskImageProvider",
    "GeneratedImageProvider",
    "ImageProvider",
]
