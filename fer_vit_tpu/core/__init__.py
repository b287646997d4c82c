"""Runtime core: device mesh, sharding policy, PRNG management, dtype policy."""

from fer_vit_tpu.core.dtypes import DTypePolicy, default_policy
from fer_vit_tpu.core.mesh import (
    MeshConfig,
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from fer_vit_tpu.core.prng import PRNG

__all__ = [
    "DTypePolicy",
    "default_policy",
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "PRNG",
]
