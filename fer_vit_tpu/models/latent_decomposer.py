"""InterFaceGAN-style latent decomposition into expression / identity parts.

Capability parity with the reference ``LatentDecomposer`` (reference:
models_fer_vit/latent_decomposer.py:30-174). The directions are a *constant*
(C, L, D) array — not parameters — so the whole decomposition is a pair of
einsums that jit/vmap trivially and constant-fold into the surrounding
program.

    proj = w_flat @ dirsᵀ                  (B, C)
    all_classes: w_expr = proj @ dirs      — sum of projections
    max_class:   use only argmax |proj| class's direction
    w_id = w − w_expr

Directions load from the ``.npz`` files written by
:mod:`fer_vit_tpu.analysis.expression_directions` or from the reference's
``.pt`` files (via torch, host-side only).
"""

from __future__ import annotations

import dataclasses
from typing import Literal, Tuple

import jax
import jax.numpy as jnp
import numpy as np

OutputMode = Literal["expr_only", "id_only", "enhanced", "concat"]
DecomposeMode = Literal["all_classes", "max_class"]


def _normalize_directions(dirs: np.ndarray) -> np.ndarray:
    """L2-normalize each class direction over the flattened (L*D) dim
    (reference: latent_decomposer.py:57-65)."""
    c = dirs.shape[0]
    flat = dirs.reshape(c, -1).astype(np.float32)
    norms = np.linalg.norm(flat, axis=1, keepdims=True)
    flat = flat / (norms + 1e-12)
    return flat.reshape(dirs.shape)


@dataclasses.dataclass(frozen=True)
class LatentDecomposer:
    """Holds normalized class directions (C, seq_len, latent_dim).

    Frozen dataclass of a constant array — usable directly inside jitted
    functions (it is a pytree-free closure constant).
    """

    directions: jax.Array  # (C, L, D), rows L2-normalized over L*D
    seq_len: int = 18
    latent_dim: int = 512

    @property
    def num_classes(self) -> int:
        return self.directions.shape[0]

    @classmethod
    def from_array(cls, dirs: np.ndarray, seq_len: int = 18, latent_dim: int = 512):
        dirs = _normalize_directions(np.asarray(dirs))
        return cls(jnp.asarray(dirs), seq_len, latent_dim)

    @classmethod
    def from_file(cls, path: str) -> "LatentDecomposer":
        """Load directions from ``.npz`` (ours) or ``.pt`` (reference format:
        {'directions': {cls: (L,D) tensor}, 'seq_len', 'latent_dim'},
        reference latent_analysis/compute_expression_direction.py:119-142)."""
        if str(path).endswith(".npz"):
            data = np.load(path)
            dirs = np.asarray(data["directions"])
            seq_len = int(data["seq_len"]) if "seq_len" in data else 18
            latent_dim = int(data["latent_dim"]) if "latent_dim" in data else 512
        else:
            import torch  # host-side interop only

            data = torch.load(path, map_location="cpu", weights_only=False)
            dmap = data["directions"]
            dirs = np.stack(
                [np.asarray(dmap[i].detach().cpu()) for i in range(len(dmap))], axis=0
            )
            seq_len = int(data.get("seq_len", 18))
            latent_dim = int(data.get("latent_dim", 512))
        return cls.from_array(dirs, seq_len, latent_dim)

    # -- pure ops -----------------------------------------------------------

    def decompose(
        self, w_plus: jax.Array, mode: DecomposeMode = "all_classes"
    ) -> Tuple[jax.Array, jax.Array]:
        """(B, L, D) → (w_expr, w_id), each (B, L, D)."""
        b = w_plus.shape[0]
        c = self.num_classes
        dirs_flat = self.directions.reshape(c, -1)  # (C, LD)
        w_flat = w_plus.reshape(b, -1)  # (B, LD)
        proj = jnp.einsum(
            "bd,cd->bc", w_flat, dirs_flat, preferred_element_type=jnp.float32
        )
        if mode == "all_classes":
            w_expr_flat = jnp.einsum(
                "bc,cd->bd", proj, dirs_flat, preferred_element_type=jnp.float32
            )
        elif mode == "max_class":
            best = jnp.argmax(jnp.abs(proj), axis=1)  # (B,)
            best_dirs = dirs_flat[best]  # (B, LD)
            best_coeff = jnp.take_along_axis(proj, best[:, None], axis=1)  # (B,1)
            w_expr_flat = best_coeff * best_dirs
        else:
            raise ValueError(f"Unknown mode: {mode!r}")
        w_expr = w_expr_flat.reshape(b, self.seq_len, self.latent_dim)
        w_expr = w_expr.astype(w_plus.dtype)
        return w_expr, w_plus - w_expr

    def get_expression_scores(self, w_plus: jax.Array) -> jax.Array:
        """(B, L, D) → per-class SVM decision scores (B, C)."""
        dirs_flat = self.directions.reshape(self.num_classes, -1)
        w_flat = w_plus.reshape(w_plus.shape[0], -1)
        return jnp.einsum(
            "bd,cd->bc", w_flat, dirs_flat, preferred_element_type=jnp.float32
        )

    def enhance_expression(
        self,
        w_plus: jax.Array,
        alpha: float = 2.0,
        mode: DecomposeMode = "all_classes",
    ) -> jax.Array:
        w_expr, w_id = self.decompose(w_plus, mode=mode)
        return w_id + alpha * w_expr

    def __call__(
        self,
        w_plus: jax.Array,
        output_mode: OutputMode = "expr_only",
        enhance_alpha: float = 2.0,
        decompose_mode: DecomposeMode = "all_classes",
    ) -> jax.Array:
        """ViT-ready transform; 'concat' doubles seq_len to 2L
        (reference: latent_decomposer.py:147-174)."""
        w_expr, w_id = self.decompose(w_plus, mode=decompose_mode)
        if output_mode == "expr_only":
            return w_expr
        if output_mode == "id_only":
            return w_id
        if output_mode == "enhanced":
            return w_id + enhance_alpha * w_expr
        if output_mode == "concat":
            return jnp.concatenate([w_expr, w_id], axis=1)
        raise ValueError(f"Unknown output_mode: {output_mode!r}")

    def save_npz(self, path: str, method: str = "unknown") -> None:
        np.savez(
            path,
            directions=np.asarray(self.directions),
            seq_len=self.seq_len,
            latent_dim=self.latent_dim,
            method=method,
        )
