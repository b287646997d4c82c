"""PRNG key management.

The reference relies on global ``torch.manual_seed`` + forced deterministic
algorithms (reference: train/train_latent_vit.py:30-40). JAX gives
determinism structurally: every random op consumes an explicit key. ``PRNG``
is a tiny splitting helper so call sites never reuse keys.
"""

from __future__ import annotations

import jax


class PRNG:
    """Stateful key splitter (host-side only; never trace through this)."""

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def split(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs
