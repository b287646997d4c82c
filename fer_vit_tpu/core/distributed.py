"""Multi-host (pod-slice) initialization.

SURVEY.md §2.7: the reference has no distributed support; the rebuild
treats multi-host scale-out (e.g. pod-slice ``generate_latents`` throughput
runs) as first-class. On a multi-host TPU slice call :func:`initialize`
once at program start; afterwards ``jax.devices()`` spans the slice and the
standard mesh/sharding machinery (``fer_vit_tpu.core.mesh``) works
unchanged — DP gradient all-reduce rides ICI within hosts and DCN across.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Thin wrapper over ``jax.distributed.initialize``.

    On Cloud TPU, argument-free initialization auto-discovers the slice
    topology; explicit args support other clusters. Opt-in: a no-op unless
    explicit args are given or ``FERVIT_MULTIHOST=1`` is set (this repo's
    dev environment sets TPU worker envs even on a single host, so env
    sniffing alone would misfire)."""
    if (num_processes in (None, 1) and coordinator_address is None
            and os.environ.get("FERVIT_MULTIHOST") != "1"):
        return  # single-process: nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise


def process_local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this host feeds (per-host data sharding
    for multi-host input pipelines)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
