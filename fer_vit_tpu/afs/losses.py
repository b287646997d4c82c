"""AFS training losses.

Capability parity with the reference (reference: afs/losses.py:95-136):

    L_id    = mean(1 − cos(ArcFace(img_gen), ArcFace(img_src)))
    L_lpips = LPIPS(img_gen, img_tgt)
    L_cons  = L1(h(w_new), stop_grad(h(w_tgt)))
    L_total = L_id + L_lpips + λ_cons · L_cons

ArcFace(img_src) carries no gradient (fixed reference — the stop_gradient
here reproduces the reference's torch.no_grad, afs/losses.py:116-119); both
feature nets are frozen constants.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fer_vit_tpu.encoders.arcface import ArcFaceExtractor
from fer_vit_tpu.encoders.lpips import LPIPS


@dataclasses.dataclass
class AFSLoss:
    """Holds the frozen ArcFace/LPIPS variables and computes L_total.

    ``arcface_variables`` come from
    :func:`fer_vit_tpu.encoders.arcface.convert_arcface_checkpoint`
    (model_ir_se50.pth); ``lpips_variables`` from
    :func:`fer_vit_tpu.encoders.lpips.convert_lpips_checkpoint`. Passing
    None random-initializes (smoke-test mode — the reference hard-requires
    the files instead, afs/losses.py:56-63).
    """

    arcface_variables: Optional[dict] = None
    lpips_variables: Optional[dict] = None
    lambda_cons: float = 0.1
    arcface_plan: Optional[tuple] = None  # None = real IR-SE50 layout
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        arc_kw = {} if self.arcface_plan is None else \
            {"plan": tuple(self.arcface_plan)}
        self.arcface = ArcFaceExtractor(dtype=self.dtype, **arc_kw)
        self.lpips = LPIPS(dtype=self.dtype)
        if self.arcface_variables is None:
            self.arcface_variables = self.arcface.init(
                jax.random.key(0), jnp.zeros((1, 256, 256, 3)))
        if self.lpips_variables is None:
            self.lpips_variables = self.lpips.init(
                jax.random.key(1), jnp.zeros((1, 64, 64, 3)),
                jnp.zeros((1, 64, 64, 3)))

    def __call__(
        self,
        img_gen: jax.Array,  # (B, 256, 256, 3) in [−1, 1], grads flow
        img_src: jax.Array,
        img_tgt: jax.Array,
        w_sty_new: jax.Array,  # (B, 18, 512) h(w_new), grads flow
        w_sty_tgt: jax.Array,  # (B, 18, 512) h(w_tgt), target side
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        feat_src = jax.lax.stop_gradient(
            self.arcface.apply(self.arcface_variables, img_src)
        )
        feat_gen = self.arcface.apply(self.arcface_variables, img_gen)

        def _unit(v):
            return v / jnp.maximum(
                jnp.linalg.norm(v, axis=1, keepdims=True), 1e-8)

        cos = jnp.sum(_unit(feat_gen) * _unit(feat_src), axis=1)
        l_id = jnp.mean(1.0 - cos)

        l_lpips = self.lpips.apply(
            self.lpips_variables, img_gen, jax.lax.stop_gradient(img_tgt)
        )

        l_cons = jnp.mean(jnp.abs(
            w_sty_new - jax.lax.stop_gradient(w_sty_tgt)))

        l_total = l_id + l_lpips + self.lambda_cons * l_cons
        metrics = {"id": l_id, "lpips": l_lpips, "cons": l_cons}
        return l_total, metrics
