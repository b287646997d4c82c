"""Partition-spec policies: DP over ``data``, optional TP over ``model``.

The reference has no distributed support at all (SURVEY.md §2.7); the
rebuild treats scaling as first-class. The scheme follows the standard
Megatron split expressed through ``NamedSharding`` — XLA inserts the
all-reduces over ICI:

* column-parallel (output-dim sharded): qkv / in_proj / FFN-up kernels
  → ``P(None, 'model')``, their biases ``P('model')``
* row-parallel (input-dim sharded): attention out-proj / FFN-down kernels
  → ``P('model', None)``, biases replicated (summed activations)
* everything else (norms, embeddings, heads at 7 classes) replicated.

For every FER workload here pure DP (``model=1``) is optimal — these
models are tiny — but the TP path is real and exercised by
``__graft_entry__.dryrun_multichip`` and the mesh tests.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fer_vit_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

# kernel names that are column-parallel (shard output dim) / row-parallel
_COL_KERNELS = ("in_proj_kernel", "qkv", "linear1", "fc1", "down")
_ROW_KERNELS = ("out_proj_kernel", "proj", "linear2", "fc2", "up")


def _spec_for_path(path: tuple, leaf) -> P:
    names = [p.key for p in path if hasattr(p, "key")]
    joined = "/".join(names)
    ndim = getattr(leaf, "ndim", 0)
    if ndim == 2:
        leaf_name = names[-1] if names else ""
        parent = names[-2] if len(names) >= 2 else ""
        if leaf_name in _COL_KERNELS or (leaf_name == "kernel" and parent in _COL_KERNELS):
            return P(None, MODEL_AXIS)
        if leaf_name in _ROW_KERNELS or (leaf_name == "kernel" and parent in _ROW_KERNELS):
            return P(MODEL_AXIS, None)
    if ndim == 1:
        parent = names[-2] if len(names) >= 2 else ""
        leaf_name = names[-1] if names else ""
        # packed-attention biases are flat siblings (in_proj_bias next to
        # in_proj_kernel), not 'bias' leaves under a named Dense — map the
        # _bias suffix back to its kernel to keep column biases P(model)
        if (parent in _COL_KERNELS or leaf_name in _COL_KERNELS
                or leaf_name.replace("_bias", "_kernel") in _COL_KERNELS):
            return P(MODEL_AXIS)
    del joined
    return P()


def transformer_param_specs(params: Any) -> Any:
    """PartitionSpec pytree for a transformer params tree (Megatron TP)."""
    return jax.tree_util.tree_map_with_path(_spec_for_path, params)


def shard_params(mesh: Mesh, params: Any, specs: Any = None) -> Any:
    """device_put params with the given (or derived) specs over the mesh."""
    specs = specs if specs is not None else transformer_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_spec(ndim: int) -> P:
    return P(DATA_AXIS, *([None] * (ndim - 1)))
