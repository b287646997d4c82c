"""IR-SE ResNet backbone (ArcFace-style) in JAX/Flax, NHWC.

This is the feature trunk of both the pSp GradualStyleEncoder and the
ArcFace identity extractor the reference uses frozen (reference:
models_fer_vit/encoder_wrapper.py loads the third-party pSp whose encoder is
`GradualStyleEncoder` over an IR-SE50; afs/losses.py:56-70 uses the same
IR-SE50 for identity loss). The third-party architecture (InsightFace
"bottleneck_IR_SE") is:

    input:  Conv3x3(3→64, s1) → BN → PReLU(per-channel)
    stage plan (ir_se50): depths (3,4,14,3), channels 64→64→128→256→512,
        stride 2 at each stage's first unit
    unit:   shortcut = identity/maxpool-or-1x1conv+BN;
            res = BN → Conv3x3 → PReLU → Conv3x3(stride) → BN → SE(r=16)
    out:    res + shortcut

TPU-native notes: everything NHWC; BatchNorm runs with frozen running stats
(the encoder is always used frozen/eval in this framework, matching the
reference which never trains it); SE's global pool + two 1×1 convs fuse into
a couple of VPU/MXU ops under XLA. bf16 compute via the dtype arg.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fer_vit_tpu.ops.fused_irse_unit import fused_irse_residual

# (in_channels, out_channels, num_units) per stage; stride 2 on first unit.
IR_SE_50_PLAN: Tuple[Tuple[int, int, int], ...] = (
    (64, 64, 3),
    (64, 128, 4),
    (128, 256, 14),
    (256, 512, 3),
)


class ActQuant(nn.Module):
    """int8 activation STORAGE tap (VERDICT r2 perf item (a)).

    The early trunk is HBM-bandwidth-bound (PARITY.md op table: the
    stride-2 small-channel convs run at 24-39 TF/s because their multi-GB
    bf16 activations dominate traffic). Inserting quantize→dequantize at a
    fusion boundary makes XLA materialize the crossing tensor as int8 —
    halving that pass's HBM bytes — while the convs themselves stay bf16
    (dequant fuses into the consumer's input read, quant into the
    producer's epilogue).

    Scales are STATIC per-tap scalars held in the ``act_quant`` variable
    collection: a dynamic max(|x|) scale would re-read the full tensor and
    spend the bandwidth it's trying to save. Calibrate once with
    ``calibrate=True`` + ``mutable=["act_quant"]`` on a representative
    batch (:func:`fer_vit_tpu.encoders.psp.calibrate_act_quant`), then run
    with the frozen scales. Lossy (~0.4 % per-tensor rel error at int8);
    keep off for parity-critical runs.
    """

    dtype: jnp.dtype = jnp.float32
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.variable("act_quant", "scale",
                              lambda: jnp.ones((), jnp.float32))
        if self.calibrate:
            scale.value = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
            return x
        s = jnp.maximum(scale.value, 1e-12)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127.0, 127.0)
        return q.astype(jnp.int8).astype(self.dtype) * s.astype(self.dtype)


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C), init 0.25)."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param(
            "alpha",
            lambda k, s, d: jnp.full(s, 0.25, d),
            (self.channels,),
            self.param_dtype,
        ).astype(self.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class SEModule(nn.Module):
    """Squeeze-and-Excitation: GAP → 1×1 conv (C→C/r) → ReLU → 1×1 conv → σ."""

    channels: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 squeezed: Optional[jax.Array] = None) -> jax.Array:
        if squeezed is None:
            squeezed = jnp.mean(x, axis=(1, 2), keepdims=True)  # (B,1,1,C)
        h = nn.Conv(self.channels // self.reduction, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="fc1")(squeezed)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="fc2")(h)
        return x * jax.nn.sigmoid(h)


class ConvS2ViaSpaceToDepth(nn.Module):
    """3×3 stride-2 conv computed as a 2×2 stride-1 conv on space-to-depth
    input — exact (kernel zero-embedded into 2×2 blocks; parity 3e-6) but
    4× the input-channel width, which un-starves the MXU: profiled on the
    v5e tunnel chip, the trunk's stride-2 convs run at 24-39 TF/s directly
    vs ~150 TF/s in this form (PARITY.md round-2 profile). Param layout is
    identical to ``nn.Conv`` (kernel (3,3,Cin,Cout) + bias), so folded/
    converted variables load unchanged.

    Derivation: out(i,j) = Σ_{di,dj∈[-1,1]} W[di,dj]·x[2i+di, 2j+dj]. With
    xp = pad(x, 1) and blocks xs[p,q,(a,b,c)] = xp[2p+a, 2q+b, c], the taps
    live in blocks (p,q) ∈ {i, i+1}², giving a VALID 2×2 conv over xs with
    W embedded at (bp, a) s.t. di = 2·bp + a − 1 (and likewise for width).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), self.param_dtype,
        ).astype(self.dtype)
        # embed (3,3,cin,cout) → (2[bp],2[bq],2[a],2[b],cin,cout), zeros at
        # (bp,a)=(1,1) / (bq,b)=(1,1) (di=2 taps don't exist)
        k2 = jnp.zeros((2, 2, 2, 2, cin, self.features), self.dtype)
        for bp in range(2):
            for a in range(2):
                di = 2 * bp + a - 1
                if not -1 <= di <= 1:
                    continue
                for bq in range(2):
                    for b in range(2):
                        dj = 2 * bq + b - 1
                        if not -1 <= dj <= 1:
                            continue
                        k2 = k2.at[bp, bq, a, b].set(kernel[di + 1, dj + 1])
        # I-dim flattening order (a, b, cin) matches the s2d channels below
        k2 = k2.reshape(2, 2, 4 * cin, self.features)

        bsz, h, w, _ = x.shape
        assert h % 2 == 0 and w % 2 == 0, (h, w)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        xs = (xp.reshape(bsz, (h + 2) // 2, 2, (w + 2) // 2, 2, cin)
              .transpose(0, 1, 3, 2, 4, 5)
              .reshape(bsz, (h + 2) // 2, (w + 2) // 2, 4 * cin))
        y = jax.lax.conv_general_dilated(
            xs, k2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


class ConvS2Polyphase(nn.Module):
    """3×3 stride-2 conv as four stride-1 convs on the 2×2 phase planes.

    Exact tap-by-tap decomposition (no FLOP overhead, unlike s2d's 1.78×):
    ``out(i,j) = Σ W[1+di,1+dj]·x[2i+di,2j+dj]`` splits by the parity of the
    tap offsets into 1×1 / 1×2 / 2×1 / 2×2 VALID convs over the four phase
    slices ``x[a::2, b::2]``. Why: profiled on the v5e chip, XLA's direct
    stride-2 trunk convs run at 21-27 TF/s in-graph (batch-minor layouts)
    while the equivalent stride-1 convs hit 146-190 TF/s; the phase slicing
    is elementwise and fuses into the surrounding passes. Param layout is
    identical to ``nn.Conv`` (kernel (3,3,Cin,Cout) + bias) so folded /
    converted variables load unchanged.

    Numerics: each phase conv accumulates in the MXU's f32; the three
    cross-phase adds happen in the compute dtype (one extra bf16 rounding
    vs the direct conv — parity-tested in tests/test_folding.py).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), self.param_dtype,
        ).astype(self.dtype)
        assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, x.shape
        xe, xo = x[:, 0::2], x[:, 1::2]
        xee, xeo = xe[:, :, 0::2], xe[:, :, 1::2]
        xoe, xoo = xo[:, :, 0::2], xo[:, :, 1::2]
        dn = ("NHWC", "HWIO", "NHWC")

        def conv(t, kk, pad):
            return jax.lax.conv_general_dilated(
                t, kk, (1, 1), pad, dimension_numbers=dn)

        # tap (0,0) / (0,±1) / (±1,0) / (±1,±1) groups; pad (1,0) supplies
        # the i−1 / j−1 zero rows at the top/left borders.
        y = conv(xee, k[1:2, 1:2], [(0, 0), (0, 0)])
        y = y + conv(xeo, k[1:2, 0::2], [(0, 0), (1, 0)])
        y = y + conv(xoe, k[0::2, 1:2], [(1, 0), (0, 0)])
        y = y + conv(xoo, k[0::2, 0::2], [(1, 0), (1, 0)])
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


_S2_MODES = ("direct", "s2d", "poly")

_fused_fallback_logged: set = set()


def _log_fused_fallback(cin: int, cout: int, stride: int) -> None:
    """One-time notice when fused_residual=True falls back to the XLA path
    for a hardware-ineligible unit (silent fallback otherwise hides which
    units the Pallas kernel actually covers)."""
    key = (cin, cout, stride)
    if key not in _fused_fallback_logged:
        _fused_fallback_logged.add(key)
        import sys

        print(f"fused_residual: unit Cin={cin} Cout={cout} stride={stride} "
              "ineligible on TPU (needs Cin%128==0, stride-2 Cout%128==0) — "
              "using the XLA path", file=sys.stderr)


class _BNParams(nn.Module):
    """Parameter-only stand-in for ``nn.BatchNorm`` — declares the exact
    same variables (params scale/bias, batch_stats mean/var) without
    executing the normalization, so the fused-kernel path shares
    checkpoints with the standard path bit-for-bit."""

    channels: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.channels,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.channels,), self.param_dtype)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.channels,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.channels,), jnp.float32))
        return scale, bias, mean.value, var.value


class _ConvParams(nn.Module):
    """Parameter-only stand-in for ``nn.Conv`` (kernel [+ bias])."""

    shape: Tuple[int, ...]
    use_bias: bool
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.shape, self.param_dtype)
        if not self.use_bias:
            return kernel, None
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.shape[-1],), self.param_dtype)
        return kernel, bias


class _PReLUParams(nn.Module):
    """Parameter-only stand-in for :class:`PReLU`."""

    channels: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        return self.param("alpha", lambda k, s, d: jnp.full(s, 0.25, d),
                          (self.channels,), self.param_dtype)


class _TapBiasParams(nn.Module):
    """What remains of ``bn1`` after full folding: the per-tap
    channel-contracted offset sums ``s[kh,kw,co] = Σ_ci
    w1_orig[kh,kw,ci,co]·b1[ci]`` (its scale lives in conv1's kernel;
    computed by folding.py from the PRE-fold kernel so it stays exact
    even for channels whose folded scale is 0)."""

    channels: int  # Cout
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        return self.param("tap_bias", nn.initializers.zeros_init(),
                          (3, 3, self.channels), self.param_dtype)


def _bn1_bias_map(s: jax.Array, H: int, W: int) -> jax.Array:
    """conv1 applied to the constant ``b1`` image with zero padding —
    ``conv1(a1⊙x + b1) = conv1'(x) + bmap``. Constant in the interior;
    the 1-px border ring loses the taps that fall outside the image, so
    bmap is the 9-term sum of separable tap-validity masks (an einsum
    over tiny operands that XLA folds into the conv epilogue).

    ``s``: (3, 3, Cout) per-tap offset sums (see :class:`_TapBiasParams`).
    """
    f32 = jnp.float32
    yi = jnp.arange(H)
    xi = jnp.arange(W)
    ones_y = jnp.ones((H,), f32)
    ones_x = jnp.ones((W,), f32)
    R = jnp.stack([(yi >= 1).astype(f32), ones_y, (yi <= H - 2).astype(f32)])
    C = jnp.stack([(xi >= 1).astype(f32), ones_x, (xi <= W - 2).astype(f32)])
    return jnp.einsum("ay,bx,abc->yxc", R, C, s.astype(f32))  # (H, W, C)


class BottleneckIRSE(nn.Module):
    """``fuse_bn=True`` is the inference-optimized variant: every BatchNorm
    that FOLLOWS a conv (bn2, shortcut_bn) is folded into that conv's
    weights+bias ahead of time (see :mod:`fer_vit_tpu.encoders.folding`),
    removing one full HBM scale-shift pass per BN. bn1 precedes its conv,
    so plain fuse_bn keeps it; ``fold_bn1=True`` additionally folds it —
    exactly, via a border-aware bias map (the zero-padding ring loses
    taps; see :func:`_bn1_bias_map`)."""

    in_channels: int
    out_channels: int
    stride: int
    fuse_bn: bool = False
    # stride-2 conv2 strategy: "direct" (lax.conv stride 2), "s2d"
    # (space-to-depth), "poly" (polyphase) — both rewrites measured SLOWER
    # end-to-end than direct on v5e (PARITY.md); kept for study.
    s2_mode: str = "direct"
    # Route the residual branch (bn1→conv1→PReLU→conv2→SE-squeeze) through
    # the single Pallas kernel (fer_vit_tpu/ops/fused_irse_unit.py).
    # Requires fuse_bn; on hardware only units with Cin % 128 == 0 (and,
    # for stride 2, Cout % 128 == 0) are eligible — others silently use
    # the standard XLA path. Variable names/shapes are IDENTICAL either
    # way, so checkpoints are interchangeable.
    fused_residual: bool = False
    fused_interpret: bool = False  # run the kernel in interpret mode (tests)
    # Full bn1 folding: conv1's kernel pre-scaled by bn1's affine slope
    # (input-channel axis) and the offset applied as a border-exact bias
    # map AFTER conv1 — removes the last full elementwise HBM pass per
    # unit. Requires fuse_bn; variables via
    # folding.fold_psp_variables(..., fold_bn1=True). Exclusive with
    # fused_residual (which consumes the intact bn1 variables).
    fold_bn1: bool = False
    # int8 storage of the conv1→conv2 intermediate (the largest tensor in
    # stride-2 units: full-resolution spatial at out_channels). 0 = off;
    # otherwise quantize when the spatial side is ≥ this value.
    act_quant_min_hw: int = 0
    act_quant_calibrate: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _fused_eligible(self) -> bool:
        if not (self.fused_residual and self.fuse_bn):
            return False
        if self.fused_interpret:
            return True
        ok = self.in_channels % 128 == 0 and (
            self.stride == 1 or self.out_channels % 128 == 0)
        if not ok:
            _log_fused_fallback(self.in_channels, self.out_channels,
                                self.stride)
        return ok

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.fold_bn1 and self.fused_residual:
            raise ValueError(
                "fold_bn1 and fused_residual are mutually exclusive: the "
                "fused kernel consumes the intact bn1 variables while "
                "fold_bn1 replaces them with the folded tap_bias.")
        if self.fold_bn1 and not self.fuse_bn:
            raise ValueError("fold_bn1 requires fuse_bn=True (it extends "
                             "the folded variable structure).")
        bn_kw = dict(use_running_average=True, epsilon=1e-5, momentum=0.9,
                     dtype=self.dtype, param_dtype=self.param_dtype)
        if self.in_channels == self.out_channels:
            if self.stride == 1:
                shortcut = x
            else:
                # torch MaxPool2d(1, stride): pure subsampling
                shortcut = x[:, :: self.stride, :: self.stride, :]
        else:
            shortcut = nn.Conv(self.out_channels, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=self.fuse_bn, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="shortcut_conv")(x)
            if not self.fuse_bn:
                shortcut = nn.BatchNorm(name="shortcut_bn", **bn_kw)(shortcut)

        if self._fused_eligible():
            scale, bias, mean, var = _BNParams(
                self.in_channels, param_dtype=self.param_dtype,
                name="bn1")()
            a1 = scale.astype(jnp.float32) * jax.lax.rsqrt(var + 1e-5)
            b1 = bias.astype(jnp.float32) - mean * a1
            w1, _ = _ConvParams(
                (3, 3, self.in_channels, self.out_channels), False,
                param_dtype=self.param_dtype, name="conv1")()
            alpha = _PReLUParams(self.out_channels,
                                 param_dtype=self.param_dtype, name="prelu")()
            w2, b2 = _ConvParams(
                (3, 3, self.out_channels, self.out_channels), True,
                param_dtype=self.param_dtype, name="conv2")()
            res, sums = fused_irse_residual(
                x.astype(self.dtype), a1, b1, w1, alpha, w2, b2,
                stride=self.stride, interpret=self.fused_interpret)
            hw = res.shape[1] * res.shape[2]
            squeezed = (sums / hw).reshape(
                res.shape[0], 1, 1, self.out_channels).astype(self.dtype)
            res = SEModule(self.out_channels, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="se")(
                               res, squeezed=squeezed)
            return res + shortcut

        if self.fold_bn1:
            w1, _ = _ConvParams(
                (3, 3, self.in_channels, self.out_channels), False,
                param_dtype=self.param_dtype, name="conv1")()
            s = _TapBiasParams(self.out_channels,
                               param_dtype=self.param_dtype, name="bn1")()
            res = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w1.astype(self.dtype), (1, 1),
                [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            bmap = _bn1_bias_map(s, x.shape[1], x.shape[2])
            res = res + bmap[None].astype(res.dtype)
        else:
            res = nn.BatchNorm(name="bn1", **bn_kw)(x)
            res = nn.Conv(self.out_channels, (3, 3), padding=1,
                          use_bias=False, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="conv1")(res)
        res = PReLU(self.out_channels, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="prelu")(res)
        if (self.act_quant_min_hw
                and res.shape[1] >= self.act_quant_min_hw):
            res = ActQuant(dtype=self.dtype,
                           calibrate=self.act_quant_calibrate,
                           name="aq_mid")(res)
        assert self.s2_mode in _S2_MODES, self.s2_mode
        if self.s2_mode != "direct" and self.stride == 2:
            conv2_cls = (ConvS2ViaSpaceToDepth if self.s2_mode == "s2d"
                         else ConvS2Polyphase)
            res = conv2_cls(
                self.out_channels, use_bias=self.fuse_bn, dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv2")(res)
        else:
            res = nn.Conv(self.out_channels, (3, 3),
                          strides=(self.stride, self.stride), padding=1,
                          use_bias=self.fuse_bn, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="conv2")(res)
        if not self.fuse_bn:
            res = nn.BatchNorm(name="bn2", **bn_kw)(res)
        res = SEModule(self.out_channels, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="se")(res)
        return res + shortcut


class IRSEBackbone(nn.Module):
    """IR-SE trunk returning the three pyramid features the pSp encoder taps:
    c1 (64×64×128, after unit 6), c2 (32×32×256, after unit 20), c3
    (16×16×512, final) for a 256×256 input — unit indices match the
    third-party GradualStyleEncoder's body-iteration taps."""

    plan: Sequence[Tuple[int, int, int]] = IR_SE_50_PLAN
    taps: Tuple[int, int] = (6, 20)
    fuse_bn: bool = False
    s2_mode: str = "direct"
    fused_residual: bool = False
    fused_interpret: bool = False
    fold_bn1: bool = False
    # int8 activation storage for the bandwidth-bound region: quantize the
    # input-layer output, each unit's conv1→conv2 intermediate, and each
    # inter-unit tensor whose spatial side is ≥ this value. 0 = off.
    act_quant_min_hw: int = 0
    act_quant_calibrate: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        bn_kw = dict(use_running_average=True, epsilon=1e-5, momentum=0.9,
                     dtype=self.dtype, param_dtype=self.param_dtype)
        aq = self.act_quant_min_hw
        x = x.astype(self.dtype)
        x = nn.Conv(64, (3, 3), padding=1, use_bias=self.fuse_bn,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype, name="input_conv")(x)
        if not self.fuse_bn:
            x = nn.BatchNorm(name="input_bn", **bn_kw)(x)
        x = PReLU(64, dtype=self.dtype, param_dtype=self.param_dtype,
                  name="input_prelu")(x)
        if aq and x.shape[1] >= aq:
            x = ActQuant(dtype=self.dtype,
                         calibrate=self.act_quant_calibrate,
                         name="aq_input")(x)

        feats = {}
        unit_idx = 0
        last_unit = sum(n for _, _, n in self.plan) - 1
        for in_c, out_c, n_units in self.plan:
            for u in range(n_units):
                stride = 2 if u == 0 else 1
                cin = in_c if u == 0 else out_c
                x = BottleneckIRSE(cin, out_c, stride, fuse_bn=self.fuse_bn,
                                   s2_mode=self.s2_mode,
                                   fused_residual=self.fused_residual,
                                   fused_interpret=self.fused_interpret,
                                   fold_bn1=self.fold_bn1,
                                   act_quant_min_hw=aq,
                                   act_quant_calibrate=self.act_quant_calibrate,
                                   dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name=f"body_{unit_idx}")(x)
                if (aq and x.shape[1] >= aq and unit_idx not in self.taps
                        and unit_idx != last_unit):
                    # taps AND the final trunk output (returned as c3)
                    # feed the style heads — keep them exact
                    x = ActQuant(dtype=self.dtype,
                                 calibrate=self.act_quant_calibrate,
                                 name=f"aq_out_{unit_idx}")(x)
                if unit_idx in self.taps:
                    feats[unit_idx] = x
                unit_idx += 1
        c1, c2 = feats[self.taps[0]], feats[self.taps[1]]
        return c1, c2, x
