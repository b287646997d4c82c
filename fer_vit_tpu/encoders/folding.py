"""Ahead-of-time BatchNorm folding for frozen (eval-mode) IR-SE encoders.

The pSp/ArcFace trunks run with frozen running stats — every BatchNorm is a
per-channel affine ``y = a·x + b`` with ``a = γ/√(σ²+ε)``, ``b = β − μ·a``.
When the BN *follows* a conv (bn2, shortcut_bn, input_bn in
:mod:`fer_vit_tpu.encoders.irse`), that affine folds exactly into the conv:

    kernel'[..., o] = kernel[..., o] · a[o]        bias'[o] = b[o]

removing one full HBM read+write pass over the activation per BN — ~28
passes over large tensors per pSp forward (round-1 profiling measured ~20 %
of step time in fusible elementwise work; reference hot path:
models_fer_vit/encoder_wrapper.py:184-220).

``bn1`` precedes its conv. Folding it is still exact, but needs care at
the borders: ``conv1(a1⊙x + b1) = conv1'(x) + bmap`` where ``conv1'``
scales the *input*-channel axis by ``a1`` and ``bmap`` is conv1 applied
to the constant ``b1`` image — constant in the interior, different on the
1-px border ring where zero padding removes taps. ``fold_bn1=True``
applies this (the module rebuilds ``bmap`` from the retained ``b1`` via a
tiny 9-term outer-product einsum — see ``irse.BottleneckIRSE``),
eliminating the last full elementwise HBM pass per trunk unit.

Usage:
    enc = PSpEncoder(fuse_bn=True, ...)
    variables = fold_psp_variables(unfused_variables)

    enc = PSpEncoder(fuse_bn=True, fold_bn1=True, ...)
    variables = fold_psp_variables(unfused_variables, fold_bn1=True)
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

_EPS = 1e-5  # matches the BatchNorm epsilon in irse.py

# (conv name, bn name) pairs foldable inside each bottleneck / trunk scope.
_FOLD_PAIRS = (
    ("input_conv", "input_bn"),
    ("conv2", "bn2"),
    ("shortcut_conv", "shortcut_bn"),
)


def _bn_affine(bn_params: Dict[str, Any], bn_stats: Dict[str, Any]):
    """Eval-mode BN → per-channel affine ``y = a·x + b`` (float64)."""
    gamma = np.asarray(bn_params["scale"], np.float64)
    beta = np.asarray(bn_params["bias"], np.float64)
    mean = np.asarray(bn_stats["mean"], np.float64)
    var = np.asarray(bn_stats["var"], np.float64)
    a = gamma / np.sqrt(var + _EPS)
    return a, beta - mean * a


def _fold_one(kernel: np.ndarray, bn_params: Dict[str, Any],
              bn_stats: Dict[str, Any]):
    """conv kernel (kh, kw, in, out) + eval BN → (kernel', bias')."""
    a, bias = _bn_affine(bn_params, bn_stats)
    kernel = np.asarray(kernel, np.float64) * a  # broadcast over out axis
    dt = jnp.float32
    return jnp.asarray(kernel, dt), jnp.asarray(bias, dt)


def fold_backbone_variables(params: Dict, batch_stats: Dict,
                            fold_bn1: bool = False):
    """Fold every post-conv BN in an IRSEBackbone params/batch_stats pair.

    Returns (params', batch_stats') matching the ``fuse_bn=True`` module
    structure: folded convs gain a ``bias``, their BNs disappear from both
    collections. With ``fold_bn1=False`` the pre-conv ``bn1`` entries
    survive untouched; with ``fold_bn1=True`` each ``bn1`` becomes its
    affine offset only (``{"bias": b1}``) and ``conv1``'s kernel absorbs
    the affine scale on the input-channel axis (``fold_bn1=True`` module
    structure).
    """
    new_params: Dict[str, Any] = {}
    new_stats: Dict[str, Any] = {}
    for scope, sub in params.items():
        stats_sub = batch_stats.get(scope, {})
        if isinstance(sub, dict) and any(
            conv in sub and bn in sub for conv, bn in _FOLD_PAIRS
        ):
            # a bottleneck scope (body_i) — recurse one level manually
            np_sub, ns_sub = fold_backbone_variables(sub, stats_sub,
                                                     fold_bn1=fold_bn1)
            new_params[scope] = np_sub
            if ns_sub:
                new_stats[scope] = ns_sub
            continue
        new_params[scope] = sub
        if scope in batch_stats:
            new_stats[scope] = batch_stats[scope]

    # fold pairs at THIS level
    for conv, bn in _FOLD_PAIRS:
        if conv in new_params and bn in new_params:
            kernel, bias = _fold_one(
                new_params[conv]["kernel"], new_params.pop(bn),
                new_stats.pop(bn),
            )
            new_params[conv] = {"kernel": kernel, "bias": bias}

    if fold_bn1 and "bn1" in new_params and "conv1" in new_params:
        bn_p, bn_s = new_params.pop("bn1"), new_stats.pop("bn1")
        a1, b1 = _bn_affine(bn_p, bn_s)
        kernel = np.asarray(new_params["conv1"]["kernel"], np.float64)
        # conv1(a1⊙x + b1) = conv1'(x) + bmap: the kernel absorbs a1 on
        # the INPUT-channel axis; the offset's contribution is stored as
        # the per-tap channel-contracted sums s[kh,kw,co] = Σ_ci
        # w1[kh,kw,ci,co]·b1[ci], computed from the PRE-fold kernel so
        # a1 == 0 channels (dead BN scales) keep their exact constant
        # contribution — the module expands s into the border-exact
        # bias map (see irse._bn1_bias_map).
        new_params["conv1"] = {
            "kernel": jnp.asarray(kernel * a1[None, None, :, None],
                                  jnp.float32)}
        new_params["bn1"] = {
            "tap_bias": jnp.asarray(
                np.einsum("abic,i->abc", kernel, b1), jnp.float32)}
    return new_params, new_stats


def fold_psp_variables(variables: Dict, fold_bn1: bool = False) -> Dict:
    """PSpEncoder variables (fuse_bn=False) → variables for fuse_bn=True
    (and, with ``fold_bn1=True``, for ``fold_bn1=True``)."""
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    bb_params, bb_stats = fold_backbone_variables(
        params["backbone"], stats.get("backbone", {}), fold_bn1=fold_bn1
    )
    params["backbone"] = bb_params
    out = {k: v for k, v in variables.items()
           if k not in ("params", "batch_stats")}
    out["params"] = params
    stats["backbone"] = bb_stats
    out["batch_stats"] = stats
    return out
