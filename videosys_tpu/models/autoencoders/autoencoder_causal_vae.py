"""Open-Sora-Plan CausalVAE (v1.1 + v1.2) — Flax, channel-last, tiled codec.

Behavioral reference:
`videosys/models/autoencoders/autoencoder_kl_open_sora_plan_v110.py`
(CausalConv3d :1112-1166, ResnetBlock2D/3D :1393-1450, AttnBlock3D :899-936,
SpatialDownsample2x :1488-1508, SpatialUpsample2x :1511-1530,
TimeDownsample2x :1533-1543, TimeUpsample2x :1546-1555,
TimeDown/UpsampleRes2x :1558-1597, Encoder :134-250, Decoder :251-355,
CausalVAEModel :357-500, tiling :632-773) and
`..._v120.py` (Spatial2xTime2x3DDown/Upsample :344-358,418-428,
AttnBlock3DFix :360-416, Downsample undown :430-466, CausalVAEModel
:741-1006 with tile_sample_min_size_t=33 / overlap 0.125).

Both released checkpoints are instances of the same op-registry architecture;
this module keeps the registry (`VAE_OPS`) so either version's config.json
maps directly. TPU-native notes:
* activations are channel-last [B, T, H, W, C] (TPU conv layout); the
  reference's [B, C, T, H, W] enters/leaves at the wrapper boundary;
* causal time padding replicates the first frame ((k_t - 1) copies);
* spatial down convs use the reference's asymmetric (0,1) zero pad;
* tiling (temporal chunks with 1-frame overlap + 2D tiles with linear
  blending) runs host-side over jitted per-tile codecs, so every tile shape
  compiles once.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videosys_tpu.models.modules.normalization import GroupNormMXU
import numpy as np


def _swish(x):
    return x * jax.nn.sigmoid(x)


class CausalConv3d(nn.Module):
    """CausalConv3d (v110 :1112-1166): replicate-pad (k_t - 1) first frames,
    VALID in time, explicit symmetric spatial pad. Input [B, T, H, W, C]."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    spatial_padding: Optional[int] = None  # None -> k//2 ("same"); 0 -> VALID
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        if kt > 1:
            first = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([first, x], axis=1)
        ph = self.spatial_padding if self.spatial_padding is not None else kh // 2
        pw = self.spatial_padding if self.spatial_padding is not None else kw // 2
        return nn.Conv(self.features, self.kernel_size, strides=self.strides,
                       padding=((0, 0), (ph, ph), (pw, pw)),
                       dtype=self.dtype, name="conv")(x)


class Conv2dOp(nn.Module):
    """Per-frame Conv2d (video_to_image wrapper :962-971)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        h = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides),
                    padding=self.padding, dtype=self.dtype, name="conv")(
            x.reshape(B * T, H, W, C))
        return h.reshape((B, T) + h.shape[1:])


def _groups(c: int) -> int:
    """Reference Normalize uses 32 groups (channels are always multiples of 32
    in released configs); clamp for small test configs."""
    g = min(32, c)
    while c % g:
        g -= 1
    return g


def _group_norm(x):
    return GroupNormMXU(num_groups=_groups(x.shape[-1]), epsilon=1e-6,
                        dtype=x.dtype, name="norm")(x)


class ResnetBlock3D(nn.Module):
    """ResnetBlock3D (v110 :1418-1450): GN -> swish -> CausalConv3d x2 with
    1x1x1 nin shortcut on channel change."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GroupNormMXU(num_groups=_groups(x.shape[-1]), epsilon=1e-6,
                         dtype=x.dtype, name="norm1")(x)
        h = _swish(h)
        h = CausalConv3d(self.out_channels, dtype=self.dtype, name="conv1")(h)
        h = GroupNormMXU(num_groups=_groups(h.shape[-1]), epsilon=1e-6,
                         dtype=h.dtype, name="norm2")(h)
        h = _swish(h)
        h = CausalConv3d(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = CausalConv3d(self.out_channels, (1, 1, 1), dtype=self.dtype,
                             name="nin_shortcut")(x)
        return x + h


class ResnetBlock2D(nn.Module):
    """ResnetBlock2D (v110 :1375-1410): per-frame 2D convs."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GroupNormMXU(num_groups=_groups(x.shape[-1]), epsilon=1e-6,
                         dtype=x.dtype, name="norm1")(x)
        h = _swish(h)
        h = Conv2dOp(self.out_channels, dtype=self.dtype, name="conv1")(h)
        h = GroupNormMXU(num_groups=_groups(h.shape[-1]), epsilon=1e-6,
                         dtype=h.dtype, name="norm2")(h)
        h = _swish(h)
        h = Conv2dOp(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = Conv2dOp(self.out_channels, kernel_size=1, padding=0,
                         dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock3D(nn.Module):
    """Per-frame spatial self-attention with CausalConv3d 1x1x1 projections
    (AttnBlock3DFix, v110 :939-996 — the corrected per-frame layout)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        h = _group_norm(x)
        q = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="q")(h)
        k = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="k")(h)
        v = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="v")(h)
        from videosys_tpu.ops.attention import scaled_dot_product_attention

        q = q.reshape(B * T, 1, H * W, C)
        k = k.reshape(B * T, 1, H * W, C)
        v = v.reshape(B * T, 1, H * W, C)
        # online-softmax kernel on TPU: avoids the [B*T, HW, HW] fp32 score
        # tensor (67 MB per frame at 64x64 latents)
        h = scaled_dot_product_attention(q, k, v, scale=C**-0.5)
        h = h.reshape(B, T, H, W, C)
        h = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="proj_out")(h)
        return x + h


class AttnBlock3DLegacy(nn.Module):
    """v110 `AttnBlock3D` (:899-936) — the PRE-FIX attention: the reference
    reshapes [b, c, t, h, w] -> [b*t, c, h*w] WITHOUT moving t in front of c,
    scrambling channels and time into the attention rows. The released v1.1
    checkpoint was trained with this bug, so output parity requires
    reproducing it bit-for-bit (the corrected math lives in AttnBlock3D /
    AttnBlock3DFix, v110 :939-991)."""

    out_channels: int = 0  # unused
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        h_ = _group_norm(x)
        q = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="q")(h_)
        k = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="k")(h_)
        v = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="v")(h_)

        def scramble(t):  # channel-last -> torch layout -> buggy reshape
            t = jnp.transpose(t, (0, 4, 1, 2, 3))         # [b, c, t, h, w]
            return t.reshape(B * T, C, H * W)             # rows mix c and t

        qs, ks, vs = scramble(q), scramble(k), scramble(v)
        w_ = jnp.einsum("bci,bcj->bij", qs * (C ** -0.5), ks)
        w_ = jax.nn.softmax(w_, axis=2)
        h_ = jnp.einsum("bci,bji->bcj", vs, w_)
        h_ = h_.reshape(B, C, T, H, W)
        h_ = jnp.transpose(h_, (0, 2, 3, 4, 1))
        h_ = CausalConv3d(C, (1, 1, 1), dtype=self.dtype, name="proj_out")(h_)
        return x + h_


class SpatialDownsample2x(nn.Module):
    """(v110 :1488-1508): asymmetric (0,1) zero pad then 3x3 stride-2 causal
    conv (time kernel 1)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_channels, (1, 3, 3), strides=(1, 2, 2),
                       padding="VALID", dtype=self.dtype, name="conv")(x)


class Downsample(nn.Module):
    """Per-frame 2D stride-2 conv with (0,1) pad (v120 Downsample :430-466)."""

    out_channels: int
    undown: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        xi = x.reshape(B * T, H, W, C)
        if self.undown:
            h = nn.Conv(self.out_channels, (3, 3), padding=1,
                        dtype=self.dtype, name="conv")(xi)
        else:
            xi = jnp.pad(xi, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding="VALID", dtype=self.dtype, name="conv")(xi)
        return h.reshape((B, T) + h.shape[1:])


class SpatialUpsample2x(nn.Module):
    """(v110 :1511-1530): nearest 2x spatial then 3x3 causal conv (t-k 1)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        x = jax.image.resize(x, (B, T, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.out_channels, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                       dtype=self.dtype, name="conv")(x)


class TimeDownsample2x(nn.Module):
    """(v110 :1533-1543): first-frame pad (k-1) then temporal avg-pool k=3 s=2."""

    out_channels: int = 0  # unused (pool only)
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        first = jnp.repeat(x[:, :1], self.kernel_size - 1, axis=1)
        x = jnp.concatenate([first, x], axis=1)
        T = x.shape[1]
        n_out = (T - self.kernel_size) // 2 + 1
        idx = np.arange(n_out) * 2
        windows = [x[:, i:i + self.kernel_size] for i in idx]
        return jnp.stack([w.mean(axis=1) for w in windows], axis=1)


class TimeUpsample2x(nn.Module):
    """(v110 :1546-1555): keep frame 0; linear-in-time 2x the rest."""

    out_channels: int = 0  # unused
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.shape[1] > 1:
            head, rest = x[:, :1], x[:, 1:]
            B, T, H, W, C = rest.shape
            rest = jax.image.resize(rest, (B, T * 2, H, W, C), method="trilinear")
            x = jnp.concatenate([head, rest], axis=1)
        return x


class TimeDownsampleRes2x(nn.Module):
    """(v110 :1558-1576): sigmoid(mix)·avgpool + (1-sigmoid)·conv3d s=(2,1,1)."""

    out_channels: int
    kernel_size: int = 3
    mix_factor: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mix = self.param("mix_factor", lambda k: jnp.full((1,), self.mix_factor))
        alpha = jax.nn.sigmoid(mix)[0]
        first = jnp.repeat(x[:, :1], self.kernel_size - 1, axis=1)
        xp = jnp.concatenate([first, x], axis=1)
        T = xp.shape[1]
        n_out = (T - self.kernel_size) // 2 + 1
        idx = np.arange(n_out) * 2
        pooled = jnp.stack(
            [xp[:, i:i + self.kernel_size].mean(axis=1) for i in idx], axis=1)
        conv = nn.Conv(self.out_channels, (self.kernel_size, 3, 3),
                       strides=(2, 1, 1),
                       padding=((0, 0), (1, 1), (1, 1)),
                       dtype=self.dtype, name="conv")(xp)
        return alpha * pooled + (1 - alpha) * conv


class TimeUpsampleRes2x(nn.Module):
    """(v110 :1579-1597): sigmoid(mix)·upsampled + (1-sigmoid)·causal conv."""

    out_channels: int
    mix_factor: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mix = self.param("mix_factor", lambda k: jnp.full((1,), self.mix_factor))
        alpha = jax.nn.sigmoid(mix)[0]
        if x.shape[1] > 1:
            head, rest = x[:, :1], x[:, 1:]
            B, T, H, W, C = rest.shape
            rest = jax.image.resize(rest, (B, T * 2, H, W, C), method="trilinear")
            x = jnp.concatenate([head, rest], axis=1)
        return alpha * x + (1 - alpha) * CausalConv3d(
            self.out_channels, dtype=self.dtype, name="conv")(x)


class Spatial2xTime2x3DDownsample(nn.Module):
    """(v120 :418-428): (0,1,0,1) pad + stride-2 causal 3x3x3 conv."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        return CausalConv3d(self.out_channels, (3, 3, 3), strides=(2, 2, 2),
                            spatial_padding=0, dtype=self.dtype, name="conv")(x)


class Spatial2xTime2x3DUpsample(nn.Module):
    """(v120 :344-358): trilinear 2x2x2 on frames 1.. (2x2 on frame 0)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        if T > 1:
            head, rest = x[:, :1], x[:, 1:]
            rest = jax.image.resize(
                rest, (B, (T - 1) * 2, H * 2, W * 2, C), method="trilinear")
            head = jax.image.resize(head, (B, 1, H * 2, W * 2, C),
                                    method="trilinear")
            x = jnp.concatenate([head, rest], axis=1)
        else:
            x = jax.image.resize(x, (B, 1, H * 2, W * 2, C), method="trilinear")
        return CausalConv3d(self.out_channels, dtype=self.dtype, name="conv")(x)


VAE_OPS = {
    "CausalConv3d": CausalConv3d,
    "Conv2d": Conv2dOp,
    "ResnetBlock2D": ResnetBlock2D,
    "ResnetBlock3D": ResnetBlock3D,
    "AttnBlock": AttnBlock3D,
    # v110 "AttnBlock3D" is the pre-fix buggy reshape the released v1.1
    # checkpoint was trained with; "AttnBlock3DFix" is the corrected math
    "AttnBlock3D": AttnBlock3DLegacy,
    "AttnBlock3DFix": AttnBlock3D,
    "Downsample": Downsample,
    "SpatialDownsample2x": SpatialDownsample2x,
    "SpatialUpsample2x": SpatialUpsample2x,
    "TimeDownsample2x": TimeDownsample2x,
    "TimeUpsample2x": TimeUpsample2x,
    "TimeDownsampleRes2x": TimeDownsampleRes2x,
    "TimeUpsampleRes2x": TimeUpsampleRes2x,
    "Spatial2xTime2x3DDownsample": Spatial2xTime2x3DDownsample,
    "Spatial2xTime2x3DUpsample": Spatial2xTime2x3DUpsample,
}


@dataclasses.dataclass(frozen=True)
class CausalVAEConfig:
    """Mirrors CausalVAEModel's registry config (v110 :357-470 defaults =
    the released CausalVAEModel_4x8x8). `v120()` below builds the v1.2 one."""

    hidden_size: int = 128
    z_channels: int = 4
    embed_dim: int = 4
    hidden_size_mult: Tuple[int, ...] = (1, 2, 4, 4)
    attn_resolutions: Tuple[int, ...] = ()
    resolution: int = 256
    num_res_blocks: int = 2
    double_z: bool = True
    use_quant_layer: bool = True
    encoder_conv_in: str = "CausalConv3d"
    encoder_conv_out: str = "CausalConv3d"
    encoder_attention: str = "AttnBlock3D"
    encoder_resnet_blocks: Tuple[str, ...] = ("ResnetBlock3D",) * 4
    encoder_spatial_downsample: Tuple[str, ...] = (
        "SpatialDownsample2x", "SpatialDownsample2x", "SpatialDownsample2x", "")
    encoder_temporal_downsample: Tuple[str, ...] = (
        "", "TimeDownsample2x", "TimeDownsample2x", "")
    encoder_mid_resnet: str = "ResnetBlock3D"
    decoder_conv_in: str = "CausalConv3d"
    decoder_conv_out: str = "CausalConv3d"
    decoder_attention: str = "AttnBlock3D"
    decoder_resnet_blocks: Tuple[str, ...] = ("ResnetBlock3D",) * 4
    decoder_spatial_upsample: Tuple[str, ...] = (
        "", "SpatialUpsample2x", "SpatialUpsample2x", "SpatialUpsample2x")
    decoder_temporal_upsample: Tuple[str, ...] = (
        "", "", "TimeUpsample2x", "TimeUpsample2x")
    decoder_mid_resnet: str = "ResnetBlock3D"
    scale_factor: float = 0.18215  # CausalVAEModelWrapper :806-815
    dtype: Any = jnp.float32

    @staticmethod
    def v120(**overrides) -> "CausalVAEConfig":
        """Released v1.2 VAE (LanguageBind/Open-Sora-Plan-v1.2.0 vae config):
        AttnBlock3DFix, Downsample + Spatial2xTime2x3D for 4x8x8 stride."""
        base = dict(
            encoder_attention="AttnBlock3DFix",
            decoder_attention="AttnBlock3DFix",
            encoder_spatial_downsample=(
                "Downsample", "Spatial2xTime2x3DDownsample",
                "Spatial2xTime2x3DDownsample", ""),
            encoder_temporal_downsample=("", "", "", ""),
            decoder_spatial_upsample=(
                "", "Spatial2xTime2x3DUpsample", "Spatial2xTime2x3DUpsample",
                "SpatialUpsample2x"),
            decoder_temporal_upsample=("", "", "", ""),
        )
        base.update(overrides)
        return CausalVAEConfig(**base)


def _make(op: str, out_ch: int, dtype, name: str):
    return VAE_OPS[op](out_ch, dtype=dtype, name=name)


class CausalVAEEncoder(nn.Module):
    """Encoder (v110 :134-250)."""

    config: CausalVAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dt = cfg.dtype
        mult = cfg.hidden_size_mult
        h = _make(cfg.encoder_conv_in, cfg.hidden_size, dt, "conv_in")(x)
        curr_res = cfg.resolution
        in_mult = (1,) + tuple(mult)
        for i, m in enumerate(mult):
            block_out = cfg.hidden_size * m
            for j in range(cfg.num_res_blocks):
                h = _make(cfg.encoder_resnet_blocks[i], block_out, dt,
                          f"down{i}_block{j}")(h)
                if curr_res in cfg.attn_resolutions:
                    h = VAE_OPS[cfg.encoder_attention](
                        dtype=dt, name=f"down{i}_attn{j}")(h)
            if cfg.encoder_spatial_downsample[i]:
                h = _make(cfg.encoder_spatial_downsample[i], h.shape[-1], dt,
                          f"down{i}_downsample")(h)
                curr_res //= 2
            if cfg.encoder_temporal_downsample[i]:
                h = _make(cfg.encoder_temporal_downsample[i], h.shape[-1], dt,
                          f"down{i}_time_downsample")(h)
        h = _make(cfg.encoder_mid_resnet, h.shape[-1], dt, "mid_block1")(h)
        h = VAE_OPS[cfg.encoder_attention](dtype=dt, name="mid_attn")(h)
        h = _make(cfg.encoder_mid_resnet, h.shape[-1], dt, "mid_block2")(h)
        h = GroupNormMXU(num_groups=_groups(h.shape[-1]), epsilon=1e-6,
                         dtype=h.dtype, name="norm_out")(h)
        h = _swish(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return _make(cfg.encoder_conv_out, out_ch, dt, "conv_out")(h)


class CausalVAEDecoder(nn.Module):
    """Decoder (v110 :251-355)."""

    config: CausalVAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        dt = cfg.dtype
        mult = cfg.hidden_size_mult
        n = len(mult)
        curr_res = cfg.resolution // 2 ** (n - 1)
        h = _make(cfg.decoder_conv_in, cfg.hidden_size * mult[-1], dt, "conv_in")(z)
        h = _make(cfg.decoder_mid_resnet, h.shape[-1], dt, "mid_block1")(h)
        h = VAE_OPS[cfg.decoder_attention](dtype=dt, name="mid_attn")(h)
        h = _make(cfg.decoder_mid_resnet, h.shape[-1], dt, "mid_block2")(h)
        for i in reversed(range(n)):
            block_out = cfg.hidden_size * mult[i]
            for j in range(cfg.num_res_blocks + 1):
                h = _make(cfg.decoder_resnet_blocks[i], block_out, dt,
                          f"up{i}_block{j}")(h)
                if curr_res in cfg.attn_resolutions:
                    h = VAE_OPS[cfg.decoder_attention](
                        dtype=dt, name=f"up{i}_attn{j}")(h)
            if cfg.decoder_spatial_upsample[i]:
                h = _make(cfg.decoder_spatial_upsample[i], h.shape[-1], dt,
                          f"up{i}_upsample")(h)
                curr_res *= 2
            if cfg.decoder_temporal_upsample[i]:
                h = _make(cfg.decoder_temporal_upsample[i], h.shape[-1], dt,
                          f"up{i}_time_upsample")(h)
        h = GroupNormMXU(num_groups=_groups(h.shape[-1]), epsilon=1e-6,
                         dtype=h.dtype, name="norm_out")(h)
        h = _swish(h)
        return _make(cfg.decoder_conv_out, 3, dt, "conv_out")(h)


class CausalVAEModule(nn.Module):
    """encoder/quant/post_quant/decoder as one Flax module (for init)."""

    config: CausalVAEConfig

    def setup(self):
        cfg = self.config
        self.encoder = CausalVAEEncoder(cfg, name="encoder")
        self.decoder = CausalVAEDecoder(cfg, name="decoder")
        if cfg.use_quant_layer:
            self.quant_conv = CausalConv3d(2 * cfg.embed_dim, (1, 1, 1),
                                           dtype=cfg.dtype, name="quant_conv")
            self.post_quant_conv = CausalConv3d(cfg.z_channels, (1, 1, 1),
                                                dtype=cfg.dtype,
                                                name="post_quant_conv")

    def encode_moments(self, x):
        h = self.encoder(x)
        if self.config.use_quant_layer:
            h = self.quant_conv(h)
        return h

    def decode(self, z):
        if self.config.use_quant_layer:
            z = self.post_quant_conv(z)
        return self.decoder(z)

    def __call__(self, x):
        moments = self.encode_moments(x)
        mean, _ = jnp.split(moments, 2, axis=-1)
        return self.decode(mean)


class CausalVAE:
    """Host-side wrapper: sampling, 0.18215 scaling, temporal chunking and 2D
    tiled codec (CausalVAEModel tiling :632-773 / v120 :860-1006 +
    CausalVAEModelWrapper scaling :799-820).

    Public layout matches the pipelines: x [B, C, T, H, W] pixels in [-1, 1];
    latents [B, C_z, T_z, H/8, W/8]."""

    def __init__(self, config: CausalVAEConfig = CausalVAEConfig(),
                 version: str = "v110"):
        self.config = config
        self.module = CausalVAEModule(config)
        self.use_tiling = False
        if version == "v110":
            self.tile_sample_min_size = 256
            self.tile_sample_min_size_t = 65
            self.tile_overlap_factor = 0.25
        else:  # v120 (:799-806)
            self.tile_sample_min_size = 256
            self.tile_sample_min_size_t = 33
            self.tile_overlap_factor = 0.125
        self.tile_latent_min_size = self.tile_sample_min_size // 2 ** (
            len(config.hidden_size_mult) - 1)
        self.time_down = 2 ** sum(
            1 for s in config.encoder_spatial_downsample +
            config.encoder_temporal_downsample
            if s and ("Time" in s or "Time2x" in s))
        self.tile_latent_min_size_t = (
            (self.tile_sample_min_size_t - 1) // self.time_down + 1)
        self._enc = jax.jit(
            lambda p, x: self.module.apply(p, x, method="encode_moments"))
        self._dec = jax.jit(
            lambda p, z: self.module.apply(p, z, method="decode"))

    # ------------------------------------------------------------------ #
    def enable_tiling(self, overlap_factor: Optional[float] = None):
        self.use_tiling = True
        if overlap_factor is not None:
            self.tile_overlap_factor = overlap_factor

    def init(self, rng, sample_t: int = 1, sample_hw: int = 32) -> dict:
        def build(rng):
            x = jnp.zeros((1, sample_t, sample_hw, sample_hw, 3),
                          self.config.dtype)
            return self.module.init(rng, x)

        return jax.jit(build)(rng)  # single cacheable init program

    def get_latent_size(self, input_size: Sequence[int]) -> Tuple[int, int, int]:
        T, H, W = input_size
        t = (T - 1) // self.time_down + 1 if T is not None else None
        return (t, H // 8 if H else H, W // 8 if W else W)

    # ------------------------------------------------------------------ #
    def encode(self, params, x: jax.Array, rng=None, sample: bool = True):
        """x: [B, C, T, H, W] -> latents [B, C_z, T_z, H/8, W/8] (x 0.18215)."""
        xin = jnp.transpose(x, (0, 2, 3, 4, 1)).astype(self.config.dtype)
        if self.use_tiling and (
                xin.shape[2] > self.tile_sample_min_size
                or xin.shape[3] > self.tile_sample_min_size
                or xin.shape[1] > self.tile_sample_min_size_t):
            moments = self._tiled_codec(params, xin, encode=True)
        else:
            moments = self._enc(params, xin)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if sample:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            noise = jax.random.normal(rng, mean.shape, mean.dtype)
            z = mean + jnp.exp(0.5 * logvar) * noise
        else:
            z = mean
        return jnp.transpose(z, (0, 4, 1, 2, 3)) * self.config.scale_factor

    def decode(self, params, z: jax.Array) -> jax.Array:
        """z: [B, C_z, T_z, h, w] -> pixels [B, C, T, H, W]."""
        zin = jnp.transpose(z, (0, 2, 3, 4, 1)).astype(self.config.dtype)
        zin = zin / self.config.scale_factor
        if self.use_tiling and (
                zin.shape[2] > self.tile_latent_min_size
                or zin.shape[3] > self.tile_latent_min_size
                or zin.shape[1] > self.tile_latent_min_size_t):
            out = self._tiled_codec(params, zin, encode=False)
        else:
            out = self._dec(params, zin)
        return jnp.transpose(out, (0, 4, 1, 2, 3)).astype(jnp.float32)

    # ------------------------------------------------------------------ #
    def _t_chunks(self, t: int, size: int):
        """Temporal chunk plan with 1-frame overlap (tiled_encode :648-670);
        chunk k>0 drops its first output frame after the codec."""
        idx = list(range(0, t, size - 1))
        if len(idx) == 1 and idx[0] == 0:
            return [(0, t)]
        spans = [[idx[i], idx[i + 1] + 1] for i in range(len(idx) - 1)]
        if spans[-1][-1] > t:
            spans[-1][-1] = t
        elif spans[-1][-1] < t:
            spans.append([idx[-1], t])
        return [tuple(s) for s in spans]

    def _tiled_codec(self, params, x, encode: bool):
        t_size = (self.tile_sample_min_size_t if encode
                  else self.tile_latent_min_size_t)
        outs = []
        for k, (s, e) in enumerate(self._t_chunks(x.shape[1], t_size)):
            o = self._tiled_2d(params, x[:, s:e], encode)
            outs.append(o[:, 1:] if k != 0 else o)
        return jnp.concatenate(outs, axis=1)

    def _tiled_2d(self, params, x, encode: bool):
        """Spatial tiles with linear blending (tiled_encode2d :695-773)."""
        if encode:
            in_size, out_size = self.tile_sample_min_size, self.tile_latent_min_size
            fn = self._enc
        else:
            in_size, out_size = self.tile_latent_min_size, self.tile_sample_min_size
            fn = self._dec
        overlap = int(in_size * (1 - self.tile_overlap_factor))
        blend = int(out_size * self.tile_overlap_factor)
        limit = out_size - blend
        H, W = x.shape[2], x.shape[3]
        if H <= in_size and W <= in_size:
            return fn(params, x)

        rows = []
        for i in range(0, H, overlap):
            row = []
            for j in range(0, W, overlap):
                tile = x[:, :, i:i + in_size, j:j + in_size]
                row.append(fn(params, tile))
            rows.append(row)

        def blend_v(a, b, ext):
            ext = min(a.shape[2], b.shape[2], ext)
            w = (jnp.arange(ext) / ext).reshape(1, 1, ext, 1, 1)
            top = a[:, :, -ext:] * (1 - w) + b[:, :, :ext] * w
            return jnp.concatenate([top, b[:, :, ext:]], axis=2)

        def blend_h(a, b, ext):
            ext = min(a.shape[3], b.shape[3], ext)
            w = (jnp.arange(ext) / ext).reshape(1, 1, 1, ext, 1)
            left = a[:, :, :, -ext:] * (1 - w) + b[:, :, :, :ext] * w
            return jnp.concatenate([left, b[:, :, :, ext:]], axis=3)

        out_rows = []
        for i, row in enumerate(rows):
            res = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = blend_v(rows[i - 1][j], tile, blend)
                if j > 0:
                    tile = blend_h(row[j - 1], tile, blend)
                res.append(tile[:, :, :limit, :limit])
            out_rows.append(jnp.concatenate(res, axis=3))
        return jnp.concatenate(out_rows, axis=2)
