"""StyleGAN2 generator (rosinality layout) in JAX, NHWC.

The reference extracts this generator frozen from the pSp checkpoint's
``decoder.*`` keys and uses it for AFS training and image providers
(reference: train/train_style_extractor.py:50-79, afs/image_provider.py:
57-89). This port is weight-faithful to the rosinality implementation the
pSp checkpoint was trained with:

* EqualLinear / EqualConv with runtime weight scaling (1/√fan_in),
* modulated conv with demodulation via the per-sample scaling identity
  (modulate input channels, demodulate output channels — no grouped conv
  with batch folded into groups, which XLA:TPU handles poorly),
* upfirdn2d blur ([1,3,3,1] separable) implemented as a depthwise conv,
* fused leaky ReLU (bias + lrelu(0.2) followed by √2 gain),
* noise injection from stored buffers (``randomize_noise=False`` path, the
  only one the reference uses) or fresh PRNG noise,
* skip-connection ToRGB chain.

Only the synthesis network runs in the AFS path (``input_is_latent=True``);
the 8-layer mapping MLP is included for completeness (``style`` attr) and
for SeFa's fc0 weight.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BLUR_KERNEL = (1, 3, 3, 1)


def _make_blur_kernel(k: Sequence[int] = BLUR_KERNEL) -> np.ndarray:
    k1 = np.asarray(k, np.float32)
    k2 = np.outer(k1, k1)
    return k2 / k2.sum()


def upfirdn2d(x: jax.Array, kernel: np.ndarray, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0)) -> jax.Array:
    """NHWC up-sample (zero-stuff) → pad → FIR filter → down-sample."""
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    if up > 1:
        x = x.reshape(b, h, 1, w, 1, c)
        x = jnp.pad(x, [(0, 0), (0, 0), (0, up - 1), (0, 0), (0, up - 1),
                        (0, 0)])
        x = x.reshape(b, h * up, w * up, c)
    p0, p1 = pad
    x = jnp.pad(x, [(0, 0), (max(p0, 0), max(p1, 0)),
                    (max(p0, 0), max(p1, 0)), (0, 0)])
    if p0 < 0 or p1 < 0:  # negative pad = crop
        x = x[:, max(-p0, 0): x.shape[1] - max(-p1, 0),
              max(-p0, 0): x.shape[2] - max(-p1, 0)]
    # depthwise FIR filter
    kern = jnp.asarray(kernel[::-1, ::-1].copy(), x.dtype)  # correlation flip
    kern = kern[:, :, None, None]  # (kh, kw, 1, 1)
    kern = jnp.tile(kern, (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        x, kern, window_strides=(down, down), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


class EqualLinearSG(nn.Module):
    """StyleGAN2 EqualLinear with optional fused-lrelu activation."""

    features: int
    lr_mul: float = 1.0
    bias_init_val: float = 0.0
    activation: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        kernel = self.param(
            "kernel",
            lambda k, s, d: jax.random.normal(k, s, d) / self.lr_mul,
            (in_dim, self.features), self.param_dtype,
        )
        bias = self.param(
            "bias",
            lambda k, s, d: jnp.full(s, self.bias_init_val, d),
            (self.features,), self.param_dtype,
        )
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        out = x @ (kernel.astype(self.dtype) * scale)
        b = bias.astype(self.dtype) * self.lr_mul
        if self.activation:  # fused leaky relu: (lrelu(x + b)) * sqrt(2)
            return nn.leaky_relu(out + b, 0.2) * math.sqrt(2.0)
        return out + b


class ModulatedConv2d(nn.Module):
    """Per-sample modulated (and optionally demodulated) conv, NHWC."""

    in_channels: int
    out_channels: int
    kernel_size: int
    style_dim: int = 512
    demodulate: bool = True
    upsample: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, style: jax.Array) -> jax.Array:
        k = self.kernel_size
        fan_in = self.in_channels * k * k
        scale = 1.0 / math.sqrt(fan_in)
        weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (k, k, self.in_channels, self.out_channels), self.param_dtype,
        ).astype(self.dtype)
        s = EqualLinearSG(
            self.in_channels, bias_init_val=1.0,
            dtype=self.dtype, param_dtype=self.param_dtype, name="modulation",
        )(style)  # (B, in)

        w_scaled = weight * scale  # (k,k,in,out)
        if self.demodulate:
            # demod[b,out] = rsqrt(Σ_{k,k,in} (scale·w·s[b,in])² + 1e-8)
            w2 = jnp.einsum("klio,bi->bo", (w_scaled.astype(jnp.float32)) ** 2,
                            (s.astype(jnp.float32)) ** 2)
            demod = jax.lax.rsqrt(w2 + 1e-8).astype(self.dtype)  # (B, out)

        x = x * s[:, None, None, :]  # modulate input channels

        if self.upsample:
            # torch F.conv_transpose2d semantics == jax conv_transpose with
            # transpose_kernel=True and the kernel's channel dims swapped
            # (verified exact in f64 against torch).
            out = jax.lax.conv_transpose(
                x, jnp.swapaxes(w_scaled, 2, 3), strides=(2, 2),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True,
            )
            blur = _make_blur_kernel() * 4.0
            p = len(BLUR_KERNEL) - 2 - (k - 1)  # = 0 for k=3
            out = upfirdn2d(out, blur, pad=((p + 1) // 2 + 1, p // 2 + 1))
        else:
            pad = k // 2
            out = jax.lax.conv_general_dilated(
                x, w_scaled, window_strides=(1, 1),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.demodulate:
            out = out * demod[:, None, None, :]
        return out


class StyledConv(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int
    style_dim: int = 512
    upsample: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, style: jax.Array,
                 noise: Optional[jax.Array]) -> jax.Array:
        out = ModulatedConv2d(
            self.in_channels, self.out_channels, self.kernel_size,
            self.style_dim, upsample=self.upsample,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x, style)
        noise_weight = self.param(
            "noise_weight", nn.initializers.zeros_init(), (), self.param_dtype
        )
        if noise is not None:
            out = out + noise_weight.astype(self.dtype) * noise.astype(self.dtype)
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.out_channels,),
            self.param_dtype,
        )
        # FusedLeakyReLU: lrelu(x + bias) * sqrt(2)
        return nn.leaky_relu(out + bias.astype(self.dtype), 0.2) * math.sqrt(2.0)


class ToRGB(nn.Module):
    in_channels: int
    style_dim: int = 512
    upsample: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, style: jax.Array,
                 skip: Optional[jax.Array] = None) -> jax.Array:
        out = ModulatedConv2d(
            self.in_channels, 3, 1, self.style_dim, demodulate=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x, style)
        bias = self.param("bias", nn.initializers.zeros_init(), (3,),
                          self.param_dtype)
        out = out + bias.astype(self.dtype)
        if skip is not None:
            blur = _make_blur_kernel() * 4.0
            p = len(BLUR_KERNEL) - 2  # = 2
            skip = upfirdn2d(skip, blur, up=2,
                             pad=((p + 1) // 2 + 1, p // 2))
            out = out + skip
        return out


def channel_map(size: int, channel_multiplier: int = 2) -> Dict[int, int]:
    return {
        4: 512, 8: 512, 16: 512, 32: 512,
        64: 256 * channel_multiplier, 128: 128 * channel_multiplier,
        256: 64 * channel_multiplier, 512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


class Generator(nn.Module):
    """StyleGAN2 synthesis + mapping. ``__call__`` mirrors the rosinality
    signature subset the reference uses: (styles list, input_is_latent,
    randomize_noise)."""

    size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    def setup(self):
        ch = channel_map(self.size, self.channel_multiplier)
        self.style = [
            EqualLinearSG(self.style_dim, lr_mul=0.01, activation=True,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name=f"style_{i}")
            for i in range(self.n_mlp)
        ]
        self.const_input = self.param(
            "input", nn.initializers.normal(1.0), (1, 4, 4, ch[4]),
            self.param_dtype,
        )
        self.conv1 = StyledConv(ch[4], ch[4], 3, self.style_dim,
                                dtype=self.dtype,
                                param_dtype=self.param_dtype)
        self.to_rgb1 = ToRGB(ch[4], self.style_dim, upsample=False,
                             dtype=self.dtype, param_dtype=self.param_dtype)

        convs: List[StyledConv] = []
        to_rgbs: List[ToRGB] = []
        in_ch = ch[4]
        for i in range(3, self.log_size + 1):
            out_ch = ch[2 ** i]
            convs.append(StyledConv(in_ch, out_ch, 3, self.style_dim,
                                    upsample=True, dtype=self.dtype,
                                    param_dtype=self.param_dtype))
            convs.append(StyledConv(out_ch, out_ch, 3, self.style_dim,
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype))
            to_rgbs.append(ToRGB(out_ch, self.style_dim,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype))
            in_ch = out_ch
        self.convs = convs
        self.to_rgbs = to_rgbs

        # stored noise buffers (NHWC), matching rosinality's noises.noise_{i}
        noises = []
        for layer_idx in range(self.num_layers):
            res = 2 ** ((layer_idx + 5) // 2)
            noises.append(self.variable(
                "noises", f"noise_{layer_idx}",
                lambda r=res: jnp.zeros((1, r, r, 1), jnp.float32),
            ))
        self._noises = noises

    def mapping(self, z: jax.Array) -> jax.Array:
        """z → w (PixelNorm + 8 EqualLinear/fused-lrelu)."""
        x = z * jax.lax.rsqrt(jnp.mean(z**2, axis=-1, keepdims=True) + 1e-8)
        for layer in self.style:
            x = layer(x)
        return x

    def __call__(
        self,
        styles: Sequence[jax.Array],
        input_is_latent: bool = True,
        randomize_noise: bool = False,
        noise_rng: Optional[jax.Array] = None,
        return_latents: bool = False,
    ):
        if not input_is_latent:
            styles = [self.mapping(s) for s in styles]
        latent = styles[0]
        if latent.ndim == 2:  # (B, 512) → broadcast to w+
            latent = jnp.repeat(latent[:, None], self.n_latent, axis=1)
        b = latent.shape[0]

        if randomize_noise:
            if noise_rng is None:
                raise ValueError("noise_rng required with randomize_noise")
            keys = jax.random.split(noise_rng, self.num_layers)
            noise = [
                jax.random.normal(keys[i], (b,) + self._noises[i].value.shape[1:])
                for i in range(self.num_layers)
            ]
        else:
            noise = [v.value for v in self._noises]

        out = jnp.broadcast_to(
            self.const_input.astype(self.dtype),
            (b,) + self.const_input.shape[1:],
        )
        out = self.conv1(out, latent[:, 0], noise[0])
        skip = self.to_rgb1(out, latent[:, 1])

        i = 1
        for conv_up, conv, to_rgb in zip(self.convs[::2], self.convs[1::2],
                                         self.to_rgbs):
            out = conv_up(out, latent[:, i], noise[i])
            out = conv(out, latent[:, i + 1], noise[i + 1])
            skip = to_rgb(out, latent[:, i + 2], skip)
            i += 2

        image = skip  # (B, size, size, 3)
        if return_latents:
            return image, latent
        return image, None


def face_pool(images: jax.Array, out_size: int = 256) -> jax.Array:
    """AdaptiveAvgPool2d((256, 256)) equivalent with exact torch window
    semantics in both directions (down- or up-sizing)."""
    from fer_vit_tpu.encoders.arcface import adaptive_avg_pool

    if images.shape[1] == out_size:
        return images
    return adaptive_avg_pool(images, out_size)
