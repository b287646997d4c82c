"""Parallelism: partition-spec policies over the device mesh."""

from fer_vit_tpu.parallel.sharding import (
    transformer_param_specs,
    shard_params,
    batch_spec,
)

__all__ = ["transformer_param_specs", "shard_params", "batch_spec"]
