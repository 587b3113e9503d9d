"""2D image VAE (SD/SDXL AutoencoderKL architecture) in Flax, channel-last.

Replaces the diffusers `AutoencoderKL` the reference wraps in
`VideoAutoencoderKL` (`autoencoder_kl_open_sora.py:488-555`,
pretrained "PixArt-alpha/pixart_sigma_sdxlvae_T5_diffusers"). Architecture is
the standard SD VAE: 4 down blocks (128,256,512,512) x2 resnets + mid
attention; decoder mirrors with 3 resnets per up block. NHWC layout for TPU.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videosys_tpu.models.modules.normalization import GroupNormMXU


class ResnetBlock2D(nn.Module):
    out_channels: int
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        h = GroupNormMXU(num_groups=self.num_groups, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNormMXU(num_groups=self.num_groups, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class AttnBlock2D(nn.Module):
    """Single-head full self-attention over spatial positions (VAE mid block)."""

    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from videosys_tpu.ops.attention import scaled_dot_product_attention

        B, H, W, C = x.shape
        h = GroupNormMXU(num_groups=self.num_groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        h = h.astype(self.dtype).reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        # online-softmax kernel: at 480p latents (60x106 = 6360 positions)
        # the naive einsum materializes a 647 MB fp32 score tensor — 594 ms
        # of the 4.8 s VAE decode on v5e
        o = scaled_dot_product_attention(q[:, None], k[:, None], v[:, None],
                                         scale=C**-0.5)[:, 0]
        o = nn.Dense(C, dtype=self.dtype, name="to_out")(o)
        return x + o.reshape(B, H, W, C)


class Encoder2D(nn.Module):
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    # diffusers AutoencoderKL `mid_block_add_attention`; the full bottleneck
    # self-attention is O(S^2) — tiny test VAEs (one downsample -> large S)
    # turn it off
    mid_block_add_attention: bool = True

    @nn.compact
    def __call__(self, x):
        ch = self.block_out_channels
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(c, num_groups=self.num_groups, dtype=self.dtype, name=f"down_{i}_res_{j}")(h)
            if i < len(ch) - 1:
                # diffusers Downsample2D: asymmetric pad (0,1,0,1) + stride-2 VALID
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(c, (3, 3), strides=2, padding="VALID",
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
        h = ResnetBlock2D(ch[-1], num_groups=self.num_groups, dtype=self.dtype, name="mid_res_0")(h)
        if self.mid_block_add_attention:
            h = AttnBlock2D(num_groups=self.num_groups, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(ch[-1], num_groups=self.num_groups, dtype=self.dtype, name="mid_res_1")(h)
        h = GroupNormMXU(num_groups=self.num_groups, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h).astype(self.dtype)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


class Decoder2D(nn.Module):
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    mid_block_add_attention: bool = True

    @nn.compact
    def __call__(self, z):
        ch = self.block_out_channels
        h = nn.Conv(ch[-1], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock2D(ch[-1], num_groups=self.num_groups, dtype=self.dtype, name="mid_res_0")(h)
        if self.mid_block_add_attention:
            h = AttnBlock2D(num_groups=self.num_groups, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(ch[-1], num_groups=self.num_groups, dtype=self.dtype, name="mid_res_1")(h)
        for i, c in enumerate(reversed(ch)):
            for j in range(self.layers_per_block + 1):
                h = ResnetBlock2D(c, num_groups=self.num_groups, dtype=self.dtype, name=f"up_{i}_res_{j}")(h)
            if i < len(ch) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        h = GroupNormMXU(num_groups=self.num_groups, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h).astype(self.dtype)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL2D(nn.Module):
    """SD-style KL autoencoder. encode -> moments [B,H/8,W/8,2*latent];
    decode(z [B,h,w,latent]) -> [B,H,W,3]."""

    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    out_channels: int = 3
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    mid_block_add_attention: bool = True

    def setup(self):
        self.encoder = Encoder2D(self.block_out_channels, self.layers_per_block,
                                 self.latent_channels, self.num_groups,
                                 dtype=self.dtype,
                                 mid_block_add_attention=self.mid_block_add_attention)
        self.decoder = Decoder2D(self.block_out_channels, self.layers_per_block,
                                 self.out_channels, self.num_groups,
                                 dtype=self.dtype,
                                 mid_block_add_attention=self.mid_block_add_attention)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype)

    def encode(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng):
        moments = self.encode(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        z = mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        return self.decode(z), mean, logvar
