"""Causal temporal VAE (MAGVIT-style) in Flax, channel-last.

Behavioral reference: `videosys/models/autoencoders/autoencoder_kl_open_sora.py`
(CausalConv3d :89-124, ResBlock :127-164, Encoder :177-272, Decoder :275-376,
VAE_Temporal :379-485). 4x temporal compression via two stride-2 causal convs
in the encoder; decoder upsamples time with depth-to-space. Layout
[B, T, H, W, C]; the causal pad is front-only on T.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videosys_tpu.models.modules.normalization import GroupNormMXU


class CausalConv3d(nn.Module):
    """Conv3D with front-only temporal padding (CausalConv3d :89-124).
    time_pad = kt - 1 + (1 - time_stride); spatial is symmetric SAME."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    time_stride: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        time_pad = kt - 1 + (1 - self.time_stride)
        pad = ((time_pad, 0), (kh // 2, kh // 2), (kw // 2, kw // 2))
        return nn.Conv(
            self.features, self.kernel_size,
            strides=(self.time_stride, 1, 1),
            padding=pad, use_bias=self.use_bias,
            dtype=self.dtype, name="conv",
        )(x)


class ResBlock3D(nn.Module):
    """GroupNorm-SiLU-CausalConv x2 + (1x1x1) shortcut (ResBlock :127-164)."""

    filters: int
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GroupNormMXU(num_groups=self.num_groups, epsilon=1e-5,
                         dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = CausalConv3d(self.filters, (3, 3, 3), use_bias=False,
                         dtype=self.dtype, name="conv1")(h)
        h = GroupNormMXU(num_groups=self.num_groups, epsilon=1e-5,
                         dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = CausalConv3d(self.filters, (3, 3, 3), use_bias=False,
                         dtype=self.dtype, name="conv2")(h)
        if in_ch != self.filters:
            x = CausalConv3d(self.filters, (1, 1, 1), use_bias=False,
                             dtype=self.dtype, name="conv3")(x)
        return x + h


class EncoderTemporal(nn.Module):
    """Encoder (:177-272): conv_in, 4 stages x num_res_blocks with temporal
    stride-2 convs between stages 1-2 and 2-3, final res blocks + 1x1 conv."""

    latent_embed_dim: int = 8  # 2 * latent (moments)
    filters: int = 128
    num_res_blocks: int = 4
    channel_multipliers: Tuple[int, ...] = (1, 2, 2, 4)
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = CausalConv3d(self.filters, (3, 3, 3), use_bias=False,
                         dtype=self.dtype, name="conv_in")(x)
        num_blocks = len(self.channel_multipliers)
        for i in range(num_blocks):
            filters = self.filters * self.channel_multipliers[i]
            for j in range(self.num_res_blocks):
                h = ResBlock3D(filters, self.num_groups, dtype=self.dtype,
                               name=f"block_{i}_res_{j}")(h)
            if i < num_blocks - 1 and self.temporal_downsample[i]:
                h = CausalConv3d(filters, (3, 3, 3), time_stride=2,
                                 dtype=self.dtype, name=f"conv_down_{i}")(h)
        for j in range(self.num_res_blocks):
            h = ResBlock3D(h.shape[-1], self.num_groups, dtype=self.dtype,
                           name=f"final_res_{j}")(h)
        h = GroupNormMXU(num_groups=self.num_groups, epsilon=1e-5,
                         dtype=self.dtype, name="norm1")(h)
        h = nn.silu(h).astype(self.dtype)
        return CausalConv3d(self.latent_embed_dim, (1, 1, 1),
                            dtype=self.dtype, name="conv2")(h)


class DecoderTemporal(nn.Module):
    """Decoder (:275-376): temporal depth-to-space upsampling."""

    out_channels: int = 4
    filters: int = 128
    num_res_blocks: int = 4
    channel_multipliers: Tuple[int, ...] = (1, 2, 2, 4)
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        num_blocks = len(self.channel_multipliers)
        top = self.filters * self.channel_multipliers[-1]
        h = CausalConv3d(top, (3, 3, 3), dtype=self.dtype, name="conv1")(z)
        for j in range(self.num_res_blocks):
            h = ResBlock3D(top, self.num_groups, dtype=self.dtype,
                           name=f"first_res_{j}")(h)
        for i in reversed(range(num_blocks)):
            filters = self.filters * self.channel_multipliers[i]
            for j in range(self.num_res_blocks):
                h = ResBlock3D(filters, self.num_groups, dtype=self.dtype,
                               name=f"block_{i}_res_{j}")(h)
            if i > 0:
                t_stride = 2 if self.temporal_downsample[i - 1] else 1
                if t_stride > 1:
                    h = CausalConv3d(filters * t_stride, (3, 3, 3),
                                     dtype=self.dtype, name=f"conv_up_{i-1}")(h)
                    # depth-to-space on time: [B,T,H,W,(C ts)] -> [B,(T ts),H,W,C]
                    # (reference rearrange "B (C ts ...) T H W -> B C (T ts) ..."
                    # :365-371; channel-major split == ts-minor here)
                    B, T, H, W, Cts = h.shape
                    h = h.reshape(B, T, H, W, Cts // t_stride, t_stride)
                    h = jnp.moveaxis(h, 5, 2)  # [B,T,ts,H,W,C]
                    h = h.reshape(B, T * t_stride, H, W, Cts // t_stride)
        h = GroupNormMXU(num_groups=self.num_groups, epsilon=1e-5,
                         dtype=self.dtype, name="norm1")(h)
        h = nn.silu(h).astype(self.dtype)
        return CausalConv3d(self.out_channels, (3, 3, 3),
                            dtype=self.dtype, name="conv_out")(h)


class VAETemporal(nn.Module):
    """VAE_Temporal_SD (:474-485): latent 4ch, 4x temporal compression."""

    in_out_channels: int = 4
    latent_embed_dim: int = 4
    embed_dim: int = 4
    filters: int = 128
    num_res_blocks: int = 4
    channel_multipliers: Tuple[int, ...] = (1, 2, 2, 4)
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @property
    def time_downsample_factor(self) -> int:
        return 2 ** sum(self.temporal_downsample)

    def setup(self):
        self.encoder = EncoderTemporal(
            latent_embed_dim=self.latent_embed_dim * 2, filters=self.filters,
            num_res_blocks=self.num_res_blocks,
            channel_multipliers=self.channel_multipliers,
            temporal_downsample=self.temporal_downsample,
            num_groups=self.num_groups, dtype=self.dtype,
        )
        self.quant_conv = CausalConv3d(2 * self.embed_dim, (1, 1, 1), dtype=self.dtype)
        self.post_quant_conv = CausalConv3d(self.latent_embed_dim, (1, 1, 1),
                                            dtype=self.dtype)
        self.decoder = DecoderTemporal(
            out_channels=self.in_out_channels, filters=self.filters,
            num_res_blocks=self.num_res_blocks,
            channel_multipliers=self.channel_multipliers,
            temporal_downsample=self.temporal_downsample,
            num_groups=self.num_groups, dtype=self.dtype,
        )

    def encode_moments(self, x):
        """x: [B, T, H, W, C]; front-pads T to a multiple of the downsample
        factor (VAE_Temporal.encode :441-451). Returns (mean, logvar)."""
        tdf = self.time_downsample_factor
        time_padding = (-x.shape[1]) % tdf
        if time_padding:
            x = jnp.pad(x, ((0, 0), (time_padding, 0), (0, 0), (0, 0), (0, 0)))
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z, num_frames: int):
        """z: [B, T_lat, h, w, C] -> [B, num_frames, h, w, C_out] (:453-462)."""
        tdf = self.time_downsample_factor
        time_padding = (-num_frames) % tdf
        x = self.decoder(self.post_quant_conv(z))
        return x[:, time_padding:time_padding + num_frames]

    def __call__(self, x, rng):
        mean, logvar = self.encode_moments(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
        return self.decode(z, x.shape[1]), mean, logvar
