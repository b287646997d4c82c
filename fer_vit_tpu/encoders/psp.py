"""pSp GradualStyleEncoder in JAX — the perf-critical component.

Maps a 256×256 face image to a StyleGAN2 ``w+`` code (18, 512). This is the
dominant FLOPs of the north-star pipeline (SURVEY.md §2.1, encoder row):
~15 GFLOPs/image through the IR-SE50 trunk + 18 style heads.

Architecture (third-party pixel2style2pixel ``GradualStyleEncoder``, loaded
by reference models_fer_vit/encoder_wrapper.py:84-89):

* IR-SE50 trunk taps a 3-level feature pyramid c1/c2/c3
  (:mod:`fer_vit_tpu.encoders.irse`).
* FPN top-down: p2 = up(c3) + 1×1(c2); p1 = up(p2) + 1×1(c1).
* 18 ``GradualStyleBlock`` heads — styles 0-2 read c3, 3-6 read p2,
  7-17 read p1; each head is a stack of stride-2 3×3 convs + LeakyReLU down
  to 1×1 then an EqualLinear to 512.
* ``w+ = styles + latent_avg`` (the reference adds the generator's average
  latent, encoder_wrapper.py:198-202).

TPU-native decisions:

* NHWC everywhere; bf16 compute / f32 params via dtype args.
* The 11 p1-heads (and 4 p2 / 3 c3 heads) are **vmapped over the head axis**
  instead of 18 sequential module calls: one batched conv stack per pyramid
  level keeps the MXU busy with one big GEMM instead of 18 slivers.
* Bilinear upsampling via ``jax.image.resize`` (align_corners=True to match
  torch ``F.interpolate(..., align_corners=True)`` used by pSp).
* Preprocessing (resize to 256 + mean/std 0.5 normalize, reference
  encoder_wrapper.py:136-145) is a jitted device-side function — no host
  torchvision transforms.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fer_vit_tpu.encoders.irse import IRSEBackbone, IR_SE_50_PLAN
from fer_vit_tpu.utils.compile_opts import tuned_jit


class EqualLinear(nn.Module):
    """StyleGAN2 equalized linear: out = x @ (W·scale)ᵀ·lr_mul + b·lr_mul,
    scale = lr_mul/√fan_in. Kept numerically identical to the third-party op
    so converted pSp weights reproduce the reference's latents exactly."""

    features: int
    lr_mul: float = 1.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        # torch init: weight ~ N(0,1)/lr_mul, bias zeros
        kernel = self.param(
            "kernel",
            lambda k, s, d: jax.random.normal(k, s, d) / self.lr_mul,
            (in_dim, self.features),
            self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), self.param_dtype)
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        y = x @ (kernel.astype(self.dtype) * scale)
        return y + bias.astype(self.dtype) * self.lr_mul


class GradualStyleBlock(nn.Module):
    """log2(spatial) stride-2 convs + LeakyReLU down to 1×1, then EqualLinear."""

    out_dim: int
    spatial: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        num_pools = int(math.log2(self.spatial))
        for i in range(num_pools):
            x = nn.Conv(self.out_dim, (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        x = x.reshape(x.shape[0], -1)  # (B, out_dim) after 1×1 spatial
        return EqualLinear(self.out_dim, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="linear")(x)


class _VmappedHeads(nn.Module):
    """n_heads GradualStyleBlocks over the same input, vmapped over params:
    one conv with n_heads× batch instead of n_heads sequential convs."""

    n_heads: int
    out_dim: int
    spatial: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        block = nn.vmap(
            GradualStyleBlock,
            in_axes=None, out_axes=1,  # share input; stack outputs on axis 1
            axis_size=self.n_heads,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )
        return block(self.out_dim, self.spatial, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="heads")(x)


def _upsample_add(x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear-upsample x to y's spatial size and add. pSp uses torch
    F.interpolate(bilinear, align_corners=True); jax.image.resize is
    half-pixel-centered (align_corners=False), so use an exact gather-based
    align-corners interpolation instead."""
    h, w = y.shape[1], y.shape[2]
    return _bilinear_align_corners(x, (h, w)) + y


def _interp_matrix(in_s: int, out_s: int) -> np.ndarray:
    """(out_s, in_s) align-corners bilinear interpolation matrix."""
    m = np.zeros((out_s, in_s), np.float32)
    if out_s == 1:
        m[0, 0] = 1.0
        return m
    src = np.arange(out_s, dtype=np.float64) * (in_s - 1) / (out_s - 1)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_s - 1)
    i1 = np.minimum(i0 + 1, in_s - 1)
    w = (src - i0).astype(np.float64)
    rows = np.arange(out_s)
    m[rows, i0] += (1.0 - w).astype(np.float32)
    m[rows, i1] += w.astype(np.float32)
    return m


def _bilinear_align_corners(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with align_corners=True (torch semantics).

    Implemented as two small interpolation-matrix contractions
    (out = A_h · x · A_wᵀ) instead of 4 gathers — separable bilinear is
    exactly this product, and on TPU it rides the MXU instead of doing
    strided HBM gathers."""
    b, in_h, in_w, c = x.shape
    out_h, out_w = size
    if (in_h, in_w) == (out_h, out_w):
        return x
    orig = x.dtype
    ah = jnp.asarray(_interp_matrix(in_h, out_h), orig)
    aw = jnp.asarray(_interp_matrix(in_w, out_w), orig)
    # HIGHEST precision: interpolation weights are exact; the default f32
    # matmul path on this CPU (oneDNN/AMX) and on TPU quantizes to bf16.
    hp = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,bhwc->bowc", ah, x,
                   preferred_element_type=jnp.float32, precision=hp).astype(orig)
    x = jnp.einsum("ow,bhwc->bhoc", aw, x,
                   preferred_element_type=jnp.float32, precision=hp).astype(orig)
    return x


class PSpEncoder(nn.Module):
    """GradualStyleEncoder: (B, 256, 256, 3) preprocessed image → (B, 18, 512).

    ``latent_avg`` (the StyleGAN2 mean latent added by the reference wrapper,
    encoder_wrapper.py:198-202) is a variable in the ``constants`` collection
    (zeros unless loaded from a converted checkpoint).
    """

    n_styles: int = 18
    coarse_ind: int = 3
    middle_ind: int = 7
    style_dim: int = 512
    plan: tuple = IR_SE_50_PLAN
    input_size: int = 256  # head conv depths derive from this (c3 = size/16)
    fuse_bn: bool = False  # inference: post-conv BNs folded into conv weights
    s2_mode: str = "direct"  # trunk stride-2 convs: direct | s2d | poly
    # Pallas-fused residual branches for eligible trunk units (Cin %
    # 128 == 0; see fer_vit_tpu/ops/fused_irse_unit.py). Needs fuse_bn.
    fused_residual: bool = False
    fused_interpret: bool = False
    # Full bn1 folding (kernel-scaled conv1 + border-exact bias map; see
    # encoders/folding.py). Needs fuse_bn + fold_bn1-folded variables.
    fold_bn1: bool = False
    # int8 activation storage for trunk tensors with spatial side ≥ this
    # value (0 = off). Lossy — calibrate scales first via
    # :func:`calibrate_act_quant`. See encoders/irse.py::ActQuant.
    act_quant_min_hw: int = 0
    act_quant_calibrate: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def taps(self) -> Tuple[int, int]:
        # c1 after the last unit of stage 2, c2 after the last of stage 3
        # (third-party body-iteration indices 6 and 20 for ir_se50).
        t1 = self.plan[0][2] + self.plan[1][2] - 1
        return (t1, t1 + self.plan[2][2])

    @nn.compact
    def __call__(self, x: jax.Array, add_latent_avg: bool = True) -> jax.Array:
        c1, c2, c3 = IRSEBackbone(
            plan=self.plan, taps=self.taps, fuse_bn=self.fuse_bn,
            s2_mode=self.s2_mode, fused_residual=self.fused_residual,
            fused_interpret=self.fused_interpret, fold_bn1=self.fold_bn1,
            act_quant_min_hw=self.act_quant_min_hw,
            act_quant_calibrate=self.act_quant_calibrate,
            dtype=self.dtype,
            param_dtype=self.param_dtype, name="backbone",
        )(x)

        fpn_width = self.plan[-1][1]  # 512 for ir_se50
        lat1 = nn.Conv(fpn_width, (1, 1), dtype=self.dtype,
                       param_dtype=self.param_dtype, name="latlayer1")(c2)
        p2 = _upsample_add(c3, lat1)
        lat2 = nn.Conv(fpn_width, (1, 1), dtype=self.dtype,
                       param_dtype=self.param_dtype, name="latlayer2")(c1)
        p1 = _upsample_add(p2, lat2)

        s16 = self.input_size // 16
        s_coarse = _VmappedHeads(
            self.coarse_ind, self.style_dim, spatial=s16, dtype=self.dtype,
            param_dtype=self.param_dtype, name="coarse",
        )(c3)  # (B, 3, 512)
        s_middle = _VmappedHeads(
            self.middle_ind - self.coarse_ind, self.style_dim, spatial=2 * s16,
            dtype=self.dtype, param_dtype=self.param_dtype, name="middle",
        )(p2)  # (B, 4, 512)
        s_fine = _VmappedHeads(
            self.n_styles - self.middle_ind, self.style_dim, spatial=4 * s16,
            dtype=self.dtype, param_dtype=self.param_dtype, name="fine",
        )(p1)  # (B, 11, 512)

        w = jnp.concatenate([s_coarse, s_middle, s_fine], axis=1)

        latent_avg = self.variable(
            "constants", "latent_avg",
            lambda: jnp.zeros((self.n_styles, self.style_dim),
                              self.param_dtype),
        )
        if add_latent_avg:
            w = w + latent_avg.value[None].astype(w.dtype)
        return w.astype(jnp.float32)


def to_unit_floats(images: jax.Array) -> jax.Array:
    """uint8/float [0,255] or [0,1] (B,H,W,3) → f32 in [0,1]. THE input
    scale heuristic — every image entry point (pSp preprocess, image-route
    serving) must route through this one function so the rule can't drift.
    Integer inputs are ALWAYS 0-255 (a batch-max heuristic misclassifies
    uniformly dark uint8 frames); the value heuristic only disambiguates
    float inputs, whose scale is not knowable from dtype."""
    if jnp.issubdtype(images.dtype, jnp.integer):
        return images.astype(jnp.float32) / 255.0
    x = images.astype(jnp.float32)
    return jnp.where(jnp.max(jnp.abs(x)) > 2.0, x / 255.0, x)


def preprocess_images(images: jax.Array, size: int = 256) -> jax.Array:
    """uint8/float [0,255] or [0,1] (B,H,W,3) → resized, (x−0.5)/0.5
    normalized f32 — the reference transform (encoder_wrapper.py:136-145)
    as a jittable device-side op."""
    x = to_unit_floats(images)
    if x.shape[1] != size or x.shape[2] != size:
        x = jax.image.resize(x, (x.shape[0], size, size, x.shape[3]),
                             method=jax.image.ResizeMethod.LINEAR)
    return (x - 0.5) / 0.5


def calibrate_act_quant(encoder: PSpEncoder, variables, sample_images,
                        margin: float = 1.1):
    """One calibration forward for int8 activation storage: runs the
    encoder with ``act_quant_calibrate=True`` on a representative batch and
    returns ``variables`` with the per-tap scales (max|x|·margin / 127)
    filled into the ``act_quant`` collection. The returned variables feed an
    ``act_quant_min_hw``-enabled encoder."""
    import dataclasses

    import jax

    cal_enc = dataclasses.replace(encoder, act_quant_calibrate=True)
    # seed the collection structure so calibrate-mode apply can mutate it.
    # Init must run at input_size — the apply below resizes to it, and the
    # spatial >= min_hw tap conditions depend on H/W at trace time.
    if "act_quant" not in variables:
        sample = jnp.zeros(
            (1, encoder.input_size, encoder.input_size, 3), jnp.float32)
        aq0 = cal_enc.init(jax.random.key(0), sample).get("act_quant", {})
        variables = dict(variables, act_quant=aq0)
    _, upd = cal_enc.apply(variables, preprocess_images(
        jnp.asarray(sample_images), size=encoder.input_size),
        mutable=["act_quant"])
    scales = jax.tree_util.tree_map(lambda s: s * margin, upd["act_quant"])
    out = dict(variables)
    out["act_quant"] = scales
    return out


class EncoderWrapper:
    """Convenience inference wrapper mirroring the reference's
    ``EncoderWrapper`` API (encoder_wrapper.py:29-220): holds variables,
    jits preprocess→encode, exposes encode_image/encode_batch."""

    def __init__(self, variables=None, seed: int = 0,
                 dtype=jnp.bfloat16, encoder: Optional[PSpEncoder] = None,
                 fold_bn: bool = True, s2_mode: str = "direct",
                 fused_residual: bool = False, fold_bn1: bool = False):
        """``fold_bn``: fold eval-mode BNs into conv weights at load time
        (exact — parity-tested in tests/test_folding.py; the wrapper is
        inference-only, matching the reference which never trains pSp).
        ``s2_mode``: stride-2 trunk conv strategy — "direct" measures
        fastest end-to-end on v5e (the exact "s2d"/"poly" rewrites lose to
        XLA's layout choices; PARITY.md round-2 measurements).
        ``fused_residual``: Pallas-fused residual branches for the
        eligible (≥128-channel) trunk units; requires fold_bn.
        ``fold_bn1``: fold the pre-conv bn1 affines fully into conv1
        (+ border-exact bias map); requires fold_bn."""
        if fold_bn1 and not fold_bn:
            raise ValueError("fold_bn1 requires fold_bn=True")
        if fold_bn1 and fused_residual:
            raise ValueError(
                "fold_bn1 and fused_residual are mutually exclusive "
                "(the fused kernel consumes the intact bn1 variables)")
        if encoder is None and fold_bn:
            encoder = PSpEncoder(dtype=dtype, fuse_bn=True, s2_mode=s2_mode,
                                 fused_residual=fused_residual,
                                 fold_bn1=fold_bn1)
        self.encoder = encoder or PSpEncoder(dtype=dtype)
        if variables is None:
            size = self.encoder.input_size
            variables = self.encoder.init(
                jax.random.key(seed), jnp.zeros((1, size, size, 3))
            )
        elif getattr(self.encoder, "fuse_bn", False):
            from fer_vit_tpu.encoders.folding import fold_psp_variables

            # converted checkpoints arrive unfused; fold unless already —
            # the fold mode follows the ENCODER's own flag, so a
            # caller-supplied fold_bn1 encoder gets matching variables
            bb = variables["params"]["backbone"]
            if "input_bn" in bb:
                variables = fold_psp_variables(
                    variables,
                    fold_bn1=getattr(self.encoder, "fold_bn1", False))
        self.variables = variables

        @tuned_jit
        def _encode(variables, images):
            x = preprocess_images(images, size=self.encoder.input_size)
            return self.encoder.apply(variables, x)

        self._encode = _encode

    @classmethod
    def from_npz(cls, path: str, dtype=jnp.bfloat16) -> "EncoderWrapper":
        """Load converted pSp weights (see encoders/convert_psp.py)."""
        from fer_vit_tpu.encoders.convert_psp import load_npz_variables

        return cls(variables=load_npz_variables(path), dtype=dtype)

    def encode_batch(self, images) -> jax.Array:
        """(B, H, W, 3) images → (B, 18, 512) w+ latents."""
        return self._encode(self.variables, jnp.asarray(images))

    def encode_image(self, image) -> jax.Array:
        """(H, W, 3) single image → (18, 512)."""
        return self.encode_batch(jnp.asarray(image)[None])[0]
