"""U-Net model family for regional regular grids (CNN alternative stack).

~ reference ``src/unet/model.py`` (WeatherUNet: 3-level DoubleConv U-Net,
BatchNorm+GELU, bilinear align-corners upsampling) and
``src/unet/model_v2.py`` (WeatherUNetV2: 4-level residual U-Net with
GroupNorm ResConv blocks, SE channel attention, and a bottleneck of parallel
spatial self-attention + learned-mode spectral convolution).

TPU-native differences: NHWC layout (feeds the MXU/conv units directly,
torch uses NCHW), explicit align-corners bilinear upsampling (jax.image has
half-pixel semantics only), jnp.fft for the spectral layer.

Also includes ``DownscalerUNet`` — the coarse→fine cascade model of
``scripts/train_downscaler.py`` (same V1 topology; input = bilinear-upsampled
coarse field + static fields, output = fine-grid delta).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "WeatherUNet",
    "WeatherUNetV2",
    "DownscalerUNet",
    "upsample_align_corners",
]


def upsample_align_corners(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear upsample with torch align_corners=True semantics.

    x: [B, H, W, C] -> [B, out_h, out_w, C].  Source coordinate of output
    index i is i·(H−1)/(H'−1) (endpoints map to endpoints).
    """
    b, h, w, c = x.shape
    oh, ow = out_hw

    def axis_weights(n_in, n_out):
        if n_out == 1 or n_in == 1:
            idx0 = np.zeros(n_out, np.int32)
            return idx0, idx0, np.zeros(n_out, np.float32)
        pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        i0 = np.floor(pos).astype(np.int32)
        i0 = np.minimum(i0, n_in - 2)
        frac = (pos - i0).astype(np.float32)
        return i0, i0 + 1, frac

    r0, r1, rf = axis_weights(h, oh)
    c0, c1, cf = axis_weights(w, ow)
    rf = jnp.asarray(rf)[None, :, None, None]
    cf = jnp.asarray(cf)[None, None, :, None]

    top = x[:, r0][:, :, c0] * (1 - cf) + x[:, r0][:, :, c1] * cf
    bot = x[:, r1][:, :, c0] * (1 - cf) + x[:, r1][:, :, c1] * cf
    return top * (1 - rf) + bot * rf


class BatchStatNorm(nn.Module):
    """Stateless batch normalization: normalize by the CURRENT batch's
    (B, H, W) statistics with learnable scale/bias.

    Equivalent to torch BatchNorm2d's training-mode forward, applied at eval
    too.  Chosen over running-average BN so the whole model stays a pure
    function (no mutable collections threaded through jit/rollout); for
    full-field weather batches the batch statistics are stable, so the
    train/eval gap of real BN is negligible here.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = x.mean(axis=(0, 1, 2))
        var = x.var(axis=(0, 1, 2))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class DoubleConv(nn.Module):
    """Conv3x3 -> BN -> GELU, twice (reference model.py:12-26)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                        name=f"conv_{i}")(x)
            x = BatchStatNorm(name=f"bn_{i}")(x)
            x = nn.gelu(x)
        return x


def _match_and_concat(x, skip):
    dh = skip.shape[1] - x.shape[1]
    dw = skip.shape[2] - x.shape[2]
    if dh > 0 or dw > 0:
        x = jnp.pad(x, ((0, 0), (0, max(dh, 0)), (0, max(dw, 0)), (0, 0)))
    return jnp.concatenate([skip, x], axis=-1)


class WeatherUNet(nn.Module):
    """3-level U-Net predicting a per-step delta.  Input [B, H, W, obs·C]."""

    out_channels: int
    base_filters: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_filters
        x1 = DoubleConv(f, name="inc")(x, train)
        x2 = DoubleConv(2 * f, name="down1")(
            nn.max_pool(x1, (2, 2), strides=(2, 2)), train)
        x3 = DoubleConv(4 * f, name="down2")(
            nn.max_pool(x2, (2, 2), strides=(2, 2)), train)
        x4 = DoubleConv(8 * f, name="down3")(
            nn.max_pool(x3, (2, 2), strides=(2, 2)), train)

        y = upsample_align_corners(x4, (x4.shape[1] * 2, x4.shape[2] * 2))
        y = DoubleConv(4 * f, name="up1")(_match_and_concat(y, x3), train)
        y = upsample_align_corners(y, (y.shape[1] * 2, y.shape[2] * 2))
        y = DoubleConv(2 * f, name="up2")(_match_and_concat(y, x2), train)
        y = upsample_align_corners(y, (y.shape[1] * 2, y.shape[2] * 2))
        y = DoubleConv(f, name="up3")(_match_and_concat(y, x1), train)
        return nn.Conv(self.out_channels, (1, 1), name="out_conv")(y)


class SEBlock(nn.Module):
    """Squeeze-and-Excitation channel attention (reference model_v2.py:22-38)."""

    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = x.mean(axis=(1, 2))  # [B, C]
        w = nn.Dense(max(c // self.reduction, 4), name="fc1")(w)
        w = nn.gelu(w)
        w = nn.Dense(c, name="fc2")(w)
        w = jax.nn.sigmoid(w)
        return x * w[:, None, None, :]


class ResConvBlock(nn.Module):
    """Conv-GN-GELU x2 + 1x1 skip + SE (reference model_v2.py:41-62)."""

    features: int
    num_groups: int = 8

    @nn.compact
    def __call__(self, x):
        g = min(self.num_groups, self.features)
        while self.features % g != 0 and g > 1:
            g -= 1
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    name="conv_0")(x)
        h = nn.GroupNorm(num_groups=g, name="gn_0")(h)
        h = nn.gelu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    name="conv_1")(h)
        h = nn.GroupNorm(num_groups=g, name="gn_1")(h)
        h = nn.gelu(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), use_bias=False, name="skip")(x)
        return SEBlock(name="se")(h + x)


class SelfAttention2D(nn.Module):
    """Spatial multi-head self-attention over H·W tokens with pre-LN and
    residual (reference model_v2.py:65-91)."""

    heads: int = 4

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        normed = nn.LayerNorm(name="norm")(tokens)
        head_dim = c // self.heads
        qkv = nn.Dense(3 * c, use_bias=False, name="qkv")(normed)
        qkv = qkv.reshape(b, h * w, 3, self.heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q = jnp.swapaxes(q, 1, 2)  # [B, heads, N, hd]
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        attn = jax.nn.softmax(
            (q @ jnp.swapaxes(k, -2, -1)) * head_dim**-0.5, axis=-1
        )
        out = (attn @ v)
        out = jnp.swapaxes(out, 1, 2).reshape(b, h * w, c)
        out = nn.Dense(c, name="proj")(out)
        return (normed + out).reshape(b, h, w, c)


class SpectralConv2d(nn.Module):
    """Learned low-mode Fourier layer (reference model_v2.py:94-122)."""

    features: int
    modes_h: int = 4
    modes_w: int = 4

    @nn.compact
    def __call__(self, x):
        b, h, w, c_in = x.shape
        scale = 1.0 / (c_in * self.features)
        wr = self.param(
            "weights_re",
            lambda key, shape: scale * jax.random.normal(key, shape),
            (c_in, self.features, self.modes_h, self.modes_w),
        )
        wi = self.param(
            "weights_im",
            lambda key, shape: scale * jax.random.normal(key, shape),
            (c_in, self.features, self.modes_h, self.modes_w),
        )
        x_ft = jnp.fft.rfft2(x.transpose(0, 3, 1, 2), norm="ortho")
        mh = min(self.modes_h, h)
        mw = min(self.modes_w, x_ft.shape[-1])
        wcplx = (wr + 1j * wi)[:, :, :mh, :mw]
        low = jnp.einsum("bihw,iohw->bohw", x_ft[:, :, :mh, :mw], wcplx)
        out_ft = jnp.zeros(
            (b, self.features, h, x_ft.shape[-1]), jnp.complex64
        ).at[:, :, :mh, :mw].set(low)
        out = jnp.fft.irfft2(out_ft, s=(h, w), norm="ortho")
        return out.transpose(0, 2, 3, 1)


class WeatherUNetV2(nn.Module):
    """4-level residual U-Net with attention+spectral bottleneck."""

    out_channels: int
    base_filters: int = 64
    attn_heads: int = 4
    spectral_modes: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_filters
        x1 = ResConvBlock(f, name="inc")(x)
        x2 = ResConvBlock(2 * f, name="down1")(
            nn.max_pool(x1, (2, 2), strides=(2, 2)))
        x3 = ResConvBlock(4 * f, name="down2")(
            nn.max_pool(x2, (2, 2), strides=(2, 2)))
        x4 = ResConvBlock(8 * f, name="down3")(
            nn.max_pool(x3, (2, 2), strides=(2, 2)))

        b_attn = SelfAttention2D(self.attn_heads, name="bottleneck_attn")(x4)
        b_spec = SpectralConv2d(8 * f, self.spectral_modes,
                                self.spectral_modes,
                                name="bottleneck_spectral")(x4)
        b = ResConvBlock(8 * f, name="bottleneck_mix")(
            jnp.concatenate([b_attn, b_spec], axis=-1))

        y = upsample_align_corners(b, (b.shape[1] * 2, b.shape[2] * 2))
        y = ResConvBlock(4 * f, name="up1")(_match_and_concat(y, x3))
        y = upsample_align_corners(y, (y.shape[1] * 2, y.shape[2] * 2))
        y = ResConvBlock(2 * f, name="up2")(_match_and_concat(y, x2))
        y = upsample_align_corners(y, (y.shape[1] * 2, y.shape[2] * 2))
        y = ResConvBlock(f, name="up3")(_match_and_concat(y, x1))
        return nn.Conv(self.out_channels, (1, 1), name="out_conv")(y)


class DownscalerUNet(nn.Module):
    """Coarse(0.7°, bilinearly upsampled)→fine(0.25°) refinement UNet.

    Input: [B, H_f, W_f, C + n_static] — coarse fields interpolated to the
    fine grid concatenated with fine-grid static fields; output: fine delta.
    ~ reference scripts/train_downscaler.py (same V1 topology).
    """

    out_channels: int
    base_filters: int = 48

    @nn.compact
    def __call__(self, x, train: bool = False):
        return WeatherUNet(self.out_channels, self.base_filters,
                           name="unet")(x, train)
