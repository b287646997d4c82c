"""Device mesh + sharding policy.

The reference is single-GPU (SURVEY.md §2.7: no torch.distributed anywhere);
here scaling is first-class: every train step is jitted over a
``jax.sharding.Mesh`` with a ``data`` axis (batch sharding / DP) and an
optional ``model`` axis (TP of large ViTs). XLA inserts the gradient
all-reduce over ICI — there is no hand-written collective in the data path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Shape of the device mesh.

    ``data`` × ``model`` must equal the number of participating devices.
    ``model=1`` (pure DP) is the right default for every FER workload here —
    the largest model (ViT-Base, ~86M params) fits one v5e chip with room to
    spare; the ``model`` axis exists for TP experiments and pod-slice scale.
    """

    data: int = -1  # -1: all devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        data = self.data if self.data > 0 else max(1, n_devices // self.model)
        return data, self.model


def make_mesh(
    config: MeshConfig | None = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh with axes (data, model) over the given devices."""
    config = config or MeshConfig()
    devices = list(devices) if devices is not None else jax.devices()
    data, model = config.resolve(len(devices))
    if data * model > len(devices):
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of arrays with batch-dim sharding over ``data``."""

    def _put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        return jax.device_put(x, batch_sharding(mesh, max(x.ndim, 1)))

    return jax.tree_util.tree_map(_put, tree)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``n`` (for even batch sharding)."""
    return ((n + m - 1) // m) * m
