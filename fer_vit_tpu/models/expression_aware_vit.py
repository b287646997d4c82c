"""ExpressionAwareViT — frozen LatentDecomposer + HybridLatentViT.

Capability parity with the reference ``ExpressionAwareViT`` (reference:
models_fer_vit/expression_aware_vit.py:24-134): the SVM direction
decomposition runs first (a constant einsum, never trained), then the
hybrid ViT classifies the transformed latent. ``concat`` output mode doubles
the ViT's seq_len to 2L (reference :86-87).

Because the decomposer holds no parameters in this rebuild (it is a closure
constant), "train the ViT only" (reference :124-126) is automatic — the
params pytree *is* the ViT's params.
"""

from __future__ import annotations

import dataclasses
import jax

from fer_vit_tpu.models.hybrid_latent_vit import (
    HybridLatentViT,
    create_hybrid_latent_vit,
)
from fer_vit_tpu.models.latent_decomposer import (
    DecomposeMode,
    LatentDecomposer,
    OutputMode,
)


@dataclasses.dataclass(frozen=True)
class ExpressionAwareViT:
    """Composition wrapper. Not a Flax module on purpose: the decomposer is a
    constant transform, so ``apply(params, w)`` simply chains it with the
    inner ViT's apply — one jitted function, no parameter indirection."""

    decomposer: LatentDecomposer
    vit: HybridLatentViT
    output_mode: OutputMode = "expr_only"
    enhance_alpha: float = 2.0
    decompose_mode: DecomposeMode = "all_classes"

    @classmethod
    def from_config(
        cls,
        directions_path: str,
        model_size: str = "small",
        num_classes: int = 7,
        use_adapter: bool = False,
        adapter_dim: int = 64,
        output_mode: OutputMode = "expr_only",
        enhance_alpha: float = 2.0,
        decompose_mode: DecomposeMode = "all_classes",
        **vit_kw,
    ) -> "ExpressionAwareViT":
        """Factory mirroring the reference (expression_aware_vit.py:53-107).
        Freezing flags apply at optimizer level via
        :func:`fer_vit_tpu.models.hybrid_latent_vit.trainable_mask`."""
        decomposer = LatentDecomposer.from_file(directions_path)
        seq_len = decomposer.seq_len * (2 if output_mode == "concat" else 1)
        vit = create_hybrid_latent_vit(
            latent_dim=decomposer.latent_dim,
            seq_len=seq_len,
            model_size=model_size,
            num_classes=num_classes,
            use_adapter=use_adapter,
            adapter_dim=adapter_dim,
            **vit_kw,
        )
        return cls(
            decomposer=decomposer,
            vit=vit,
            output_mode=output_mode,
            enhance_alpha=enhance_alpha,
            decompose_mode=decompose_mode,
        )

    def transform(self, w_plus: jax.Array) -> jax.Array:
        return self.decomposer(
            w_plus,
            output_mode=self.output_mode,
            enhance_alpha=self.enhance_alpha,
            decompose_mode=self.decompose_mode,
        )

    def init(self, rng, w_plus: jax.Array):
        return self.vit.init(rng, self.transform(w_plus))

    def apply(self, variables, w_plus: jax.Array, **kw) -> jax.Array:
        """(B, 18, 512) w+ → (B, num_classes) logits."""
        return self.vit.apply(variables, self.transform(w_plus), **kw)
