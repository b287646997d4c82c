"""Frozen ArcFace (IR-SE50) identity-embedding extractor.

Capability parity with the reference ``ArcFaceExtractor`` (reference:
afs/losses.py:34-70): crop the face region ``[35:223, 32:220]`` from a
256px image in [−1, 1], adaptive-avg-pool to 112×112, run the IR-SE50
``Backbone`` (input layer + 24 SE-residual units + output layer:
BN2d → Dropout → Flatten → Linear(512·7·7 → 512) → BN1d), return the 512-d
embedding. Used frozen for the AFS identity loss.

TPU-native: the non-integer 188→112 adaptive pooling is exact — torch's
variable-window averaging is a linear map, implemented as two small
averaging-matrix contractions (MXU, no gathers). Weights convert from the
reference's ``model_ir_se50.pth`` via :func:`convert_arcface_checkpoint`.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fer_vit_tpu.encoders.irse import IR_SE_50_PLAN, BottleneckIRSE, PReLU


def _adaptive_avg_matrix(in_s: int, out_s: int) -> np.ndarray:
    """(out_s, in_s) row-stochastic matrix reproducing torch
    AdaptiveAvgPool2d window semantics exactly."""
    m = np.zeros((out_s, in_s), np.float32)
    for i in range(out_s):
        start = (i * in_s) // out_s
        end = -(-((i + 1) * in_s) // out_s)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool(x: jax.Array, out_size: int) -> jax.Array:
    """NHWC adaptive average pool via separable averaging matmuls."""
    b, h, w, c = x.shape
    if (h, w) == (out_size, out_size):
        return x
    in_dtype = x.dtype
    # HIGHEST + f32 averaging matrices AND f32 between the two passes:
    # this CPU's oneDNN (and TPU default) run f32 matmuls in bf16, and a
    # bf16 round-trip between the height and width contractions would
    # reintroduce the ~1e-2 error the exact-window-average comment below
    # promises to avoid. Cast back to the input dtype once, at the end.
    ah = jnp.asarray(_adaptive_avg_matrix(h, out_size), jnp.float32)
    aw = jnp.asarray(_adaptive_avg_matrix(w, out_size), jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,bhwc->bowc", ah, x.astype(jnp.float32),
                   preferred_element_type=jnp.float32, precision=hp)
    x = jnp.einsum("ow,bhwc->bhoc", aw, x,
                   preferred_element_type=jnp.float32, precision=hp)
    return x.astype(in_dtype)


class ArcFaceBackbone(nn.Module):
    """IR-SE50 ``Backbone(input_size=112, mode='ir_se')``: trunk + embedding
    head. Dropout is inert (the extractor is always frozen/eval)."""

    embedding_size: int = 512
    plan: tuple = IR_SE_50_PLAN
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        bn_kw = dict(use_running_average=True, epsilon=1e-5, momentum=0.9,
                     dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        x = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="input_conv")(x)
        x = nn.BatchNorm(name="input_bn", **bn_kw)(x)
        x = PReLU(64, dtype=self.dtype, param_dtype=self.param_dtype,
                  name="input_prelu")(x)
        unit = 0
        for in_c, out_c, n in self.plan:
            for u in range(n):
                x = BottleneckIRSE(
                    in_c if u == 0 else out_c, out_c, 2 if u == 0 else 1,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"body_{unit}",
                )(x)
                unit += 1
        # output layer: BN2d → (Dropout) → Flatten → Linear → BN1d
        x = nn.BatchNorm(name="output_bn2d", **bn_kw)(x)
        b = x.shape[0]
        # torch flattens NCHW (C,H,W); transpose so converted Linear weights
        # see the same element order.
        x = x.transpose(0, 3, 1, 2).reshape(b, -1)
        x = nn.Dense(self.embedding_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="output_linear")(x)
        # BN1d with affine, eval mode
        x = nn.BatchNorm(name="output_bn1d", **bn_kw)(x)
        return x.astype(jnp.float32)


class ArcFaceExtractor(nn.Module):
    """(B, 256, 256, 3) in [−1, 1] → (B, 512) identity embedding.

    ``plan`` defaults to the real IR-SE50 layout; reduced plans (same
    shape grammar) serve synthetic-parity and equivalence harnesses."""

    plan: tuple = IR_SE_50_PLAN
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x[:, 35:223, 32:220, :]  # face crop (reference afs/losses.py:68)
        x = adaptive_avg_pool(x.astype(self.dtype), 112)
        return ArcFaceBackbone(plan=self.plan, dtype=self.dtype,
                               param_dtype=self.param_dtype, name="net")(x)


def convert_arcface_state_dict(sd: Dict[str, np.ndarray],
                               plan=IR_SE_50_PLAN) -> dict:
    """model_ir_se50.pth state_dict → ArcFaceBackbone variables.

    InsightFace Backbone keys: input_layer.{0,1,2}, body.{i}.<res/shortcut>,
    output_layer.{0:BN2d, 3:Linear, 4:BN1d}.
    """
    from fer_vit_tpu.encoders.convert_psp import _bn, _conv, _linear

    params: dict = {}
    stats: dict = {}
    params["input_conv"] = {"kernel": _conv(sd["input_layer.0.weight"])}
    params["input_bn"], stats["input_bn"] = _bn(sd, "input_layer.1")
    params["input_prelu"] = {"alpha": sd["input_layer.2.weight"]}
    unit = 0
    for in_c, out_c, n in plan:
        for u in range(n):
            pfx = f"body.{unit}"
            b: dict = {}
            bs: dict = {}
            b["bn1"], bs["bn1"] = _bn(sd, f"{pfx}.res_layer.0")
            b["conv1"] = {"kernel": _conv(sd[f"{pfx}.res_layer.1.weight"])}
            b["prelu"] = {"alpha": sd[f"{pfx}.res_layer.2.weight"]}
            b["conv2"] = {"kernel": _conv(sd[f"{pfx}.res_layer.3.weight"])}
            b["bn2"], bs["bn2"] = _bn(sd, f"{pfx}.res_layer.4")
            b["se"] = {
                "fc1": {"kernel": _conv(sd[f"{pfx}.res_layer.5.fc1.weight"])},
                "fc2": {"kernel": _conv(sd[f"{pfx}.res_layer.5.fc2.weight"])},
            }
            if u == 0 and in_c != out_c:
                b["shortcut_conv"] = {
                    "kernel": _conv(sd[f"{pfx}.shortcut_layer.0.weight"])
                }
                b["shortcut_bn"], bs["shortcut_bn"] = _bn(
                    sd, f"{pfx}.shortcut_layer.1")
            params[f"body_{unit}"] = b
            stats[f"body_{unit}"] = bs
            unit += 1
    params["output_bn2d"], stats["output_bn2d"] = _bn(sd, "output_layer.0")
    params["output_linear"] = {
        "kernel": _linear(sd["output_layer.3.weight"]),
        "bias": sd["output_layer.3.bias"],
    }
    params["output_bn1d"], stats["output_bn1d"] = _bn(sd, "output_layer.4")
    return {"params": {"net": params}, "batch_stats": {"net": stats}}


def convert_arcface_checkpoint(path: str) -> dict:
    import torch

    sd_t = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd_t, "state_dict"):
        sd_t = sd_t.state_dict()
    sd = {k: np.asarray(v.detach().cpu(), np.float32) for k, v in sd_t.items()}
    return convert_arcface_state_dict(sd)
