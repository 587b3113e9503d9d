"""CogVideoX causal 3D VAE — Flax, channel-last, tiled decode.

Behavioral reference: `videosys/models/autoencoders/autoencoder_kl_cogvideox.py`
(CogVideoXCausalConv3d :59-136, CogVideoXSpatialNorm3D :138-178,
CogVideoXResnetBlock3D :181-299, Down/Mid/Up blocks :302-595,
Encoder :597-729, Decoder :731-870, AutoencoderKLCogVideoX :872-1257) and
`videosys/models/modules/{down,up}sampling.py`.

Key behavioral points preserved:
* causal time padding REPLICATES the first frame (k-1 copies), not zeros
  (fake_context_parallel_forward :112-117);
* temporal downsampling is avg-pool-2 with the first frame kept untouched for
  odd lengths (downsampling.py :46-60); upsampling is nearest x2 with the same
  first-frame special case (upsampling.py :40-56);
* the decoder conditions every norm on the latent via SpatialNorm3D;
* spatial tiling with linear blending (tiled_decode :1161-1239).

Decode follows the reference's DEFAULT framewise streaming (:1095-1113):
latent frames go through the decoder 2 at a time (first chunk absorbs the
remainder) with each causal conv's trailing input frames threaded between
chunks via the flax "cache" variable collection — semantics identical to
the reference (including per-chunk norm statistics) with peak activation
memory O(chunk); `decode(..., streaming=False)` keeps the whole-axis
single-program path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from videosys_tpu.models.modules.normalization import GroupNormMXU


class CausalConv3dCog(nn.Module):
    """CogVideoXCausalConv3d: first-frame-replicate temporal pad (:112-117),
    zero spatial pad, stride (s,1,1). Input [B, T, H, W, C]."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    time_stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        time_pad = kt - 1 + (1 - self.time_stride)
        if time_pad > 0:
            # streaming decode (reference fake-context-parallel conv cache,
            # :112-126): when the "cache" collection is active, the front pad
            # comes from the PREVIOUS chunk's last raw input frames, and this
            # chunk's tail is written back for the next one. First chunk (or
            # whole-axis mode) replicate-pads the first frame.
            init = self.is_initializing()  # init() must not bake caches in
            writing = self.is_mutable_collection("cache") and not init
            cached = self.has_variable("cache", "t") and not init
            cv = (self.variable("cache", "t", lambda: jnp.zeros((0,)))
                  if (writing or cached) else None)
            prev = cv.value if cv is not None else None
            if (prev is not None and getattr(prev, "ndim", 0) == x.ndim
                    and prev.shape[1] == time_pad):
                front = prev.astype(x.dtype)
            else:
                front = jnp.repeat(x[:, :1], time_pad, axis=1)
            tail = x[:, -time_pad:]
            x = jnp.concatenate([front, x], axis=1)
            if writing:
                cv.value = tail
        return nn.Conv(
            self.features, self.kernel_size,
            strides=(self.time_stride, 1, 1),
            padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
            dtype=self.dtype, name="conv",
        )(x)


def _resize_nearest(x, t, h, w):
    B, _, _, _, C = x.shape
    return jax.image.resize(x, (B, t, h, w, C), method="nearest")


class SpatialNorm3D(nn.Module):
    """CogVideoXSpatialNorm3D (:138-178): GN(f) * conv_y(zq) + conv_b(zq)
    with first-frame-aware nearest resize of zq to f's dims."""

    f_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f, zq):
        Tf, Hf, Wf = f.shape[1], f.shape[2], f.shape[3]
        if f.shape[1] > 1 and f.shape[1] % 2 == 1:
            z_first = _resize_nearest(zq[:, :1], 1, Hf, Wf)
            z_rest = _resize_nearest(zq[:, 1:], Tf - 1, Hf, Wf)
            zq = jnp.concatenate([z_first, z_rest], axis=1)
        else:
            zq = _resize_nearest(zq, Tf, Hf, Wf)
        norm_f = GroupNormMXU(num_groups=self.groups, epsilon=1e-6,
                              dtype=f.dtype, name="norm_layer")(f)
        cy = CausalConv3dCog(self.f_channels, (1, 1, 1), dtype=self.dtype,
                             name="conv_y")(zq)
        cb = CausalConv3dCog(self.f_channels, (1, 1, 1), dtype=self.dtype,
                             name="conv_b")(zq)
        return norm_f * cy + cb


class ResnetBlock3DCog(nn.Module):
    """CogVideoXResnetBlock3D (:181-299), temb unused (temb_channels=0)."""

    out_channels: int
    groups: int = 32
    eps: float = 1e-6
    spatial_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zq=None):
        in_ch = x.shape[-1]

        def norm(h, name):
            if self.spatial_norm:
                return SpatialNorm3D(h.shape[-1], self.groups, self.dtype,
                                     name=name)(h, zq)
            return GroupNormMXU(num_groups=self.groups, epsilon=self.eps,
                                dtype=h.dtype, name=name)(h)

        h = nn.silu(norm(x, "norm1"))
        h = CausalConv3dCog(self.out_channels, (3, 3, 3), dtype=self.dtype,
                            name="conv1")(h)
        h = nn.silu(norm(h, "norm2"))
        h = CausalConv3dCog(self.out_channels, (3, 3, 3), dtype=self.dtype,
                            name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class Downsample3DCog(nn.Module):
    """downsampling.py CogVideoXDownsample3D: optional temporal avg-pool-2
    (first frame kept for odd T), spatial pad (0,1) + stride-2 conv."""

    out_channels: int
    compress_time: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.compress_time:
            T = x.shape[1]
            if T % 2 == 1 and T > 1:
                first, rest = x[:, :1], x[:, 1:]
                rest = (rest[:, 0::2] + rest[:, 1::2]) / 2.0
                x = jnp.concatenate([first, rest], axis=1)
            elif T > 1:
                x = (x[:, 0::2] + x[:, 1::2]) / 2.0
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        B, T2, H, W, C = x.shape
        x = nn.Conv(self.out_channels, (3, 3), strides=2, padding="VALID",
                    dtype=self.dtype, name="conv")(x.reshape(B * T2, H, W, C))
        return x.reshape(B, T2, x.shape[1], x.shape[2], x.shape[3])


class Upsample3DCog(nn.Module):
    """upsampling.py CogVideoXUpsample3D: nearest x2 (+time if compress_time,
    first-frame special case), then 3x3 conv per frame."""

    out_channels: int
    compress_time: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, H, W, C = x.shape
        if self.compress_time:
            if T > 1 and T % 2 == 1:
                first = _resize_nearest(x[:, :1], 1, H * 2, W * 2)
                rest = _resize_nearest(x[:, 1:], (T - 1) * 2, H * 2, W * 2)
                x = jnp.concatenate([first, rest], axis=1)
            elif T > 1:
                x = _resize_nearest(x, T * 2, H * 2, W * 2)
            else:
                x = _resize_nearest(x, 1, H * 2, W * 2)
        else:
            x = _resize_nearest(x, T, H * 2, W * 2)
        B, T2, H2, W2, C = x.shape
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x.reshape(B * T2, H2, W2, C))
        return x.reshape(B, T2, H2, W2, self.out_channels)


class CogVideoXEncoder3D(nn.Module):
    """Encoder (:597-729)."""

    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    norm_num_groups: int = 32
    temporal_compression_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = self.block_out_channels
        tcl = {4: 2, 2: 1, 1: 0}[self.temporal_compression_ratio]
        h = CausalConv3dCog(ch[0], (3, 3, 3), dtype=self.dtype, name="conv_in")(x)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                h = ResnetBlock3DCog(c, self.norm_num_groups, dtype=self.dtype,
                                     name=f"down_{i}_res_{j}")(h)
            if i < len(ch) - 1:
                h = Downsample3DCog(c, compress_time=i < tcl, dtype=self.dtype,
                                    name=f"down_{i}_downsample")(h)
        for j in range(2):
            h = ResnetBlock3DCog(ch[-1], self.norm_num_groups, dtype=self.dtype,
                                 name=f"mid_res_{j}")(h)
        h = GroupNormMXU(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=h.dtype, name="norm_out")(h)
        h = nn.silu(h)
        return CausalConv3dCog(2 * self.latent_channels, (3, 3, 3),
                               dtype=self.dtype, name="conv_out")(h)


class CogVideoXDecoder3D(nn.Module):
    """Decoder (:731-870) — every norm is latent-conditioned SpatialNorm3D."""

    latent_channels: int = 16
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    norm_num_groups: int = 32
    temporal_compression_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        rev = tuple(reversed(self.block_out_channels))
        tcl = {4: 2, 2: 1, 1: 0}[self.temporal_compression_ratio]
        h = CausalConv3dCog(rev[0], (3, 3, 3), dtype=self.dtype, name="conv_in")(z)
        for j in range(2):
            h = ResnetBlock3DCog(rev[0], self.norm_num_groups, spatial_norm=True,
                                 dtype=self.dtype, name=f"mid_res_{j}")(h, z)
        for i, c in enumerate(rev):
            for j in range(self.layers_per_block + 1):
                h = ResnetBlock3DCog(c, self.norm_num_groups, spatial_norm=True,
                                     dtype=self.dtype, name=f"up_{i}_res_{j}")(h, z)
            if i < len(rev) - 1:
                h = Upsample3DCog(c, compress_time=i < tcl, dtype=self.dtype,
                                  name=f"up_{i}_upsample")(h)
        h = SpatialNorm3D(rev[-1], self.norm_num_groups, dtype=self.dtype,
                          name="norm_out")(h, z)
        h = nn.silu(h)
        return CausalConv3dCog(self.out_channels, (3, 3, 3), dtype=self.dtype,
                               name="conv_out")(h)


@dataclasses.dataclass(frozen=True)
class CogVideoXVAEConfig:
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    norm_num_groups: int = 32
    temporal_compression_ratio: int = 4
    scaling_factor: float = 1.15258426
    # reference framewise decode chunk (num_latent_frames_batch_size, :951):
    # the decoder streams 2 latent frames at a time through per-conv caches,
    # bounding decode memory to O(chunk) instead of O(T)
    num_latent_frames_batch_size: int = 2
    # tiling (:1013-1047): tile sizes in latent space + overlap factors
    tile_latent_min_height: int = 30
    tile_latent_min_width: int = 45
    tile_overlap_factor_height: float = 1 / 6
    tile_overlap_factor_width: float = 1 / 5
    dtype: object = jnp.float32


class AutoencoderKLCogVideoX:
    """Functional wrapper (API layout [B, C, T, H, W] like the reference)."""

    def __init__(self, config: CogVideoXVAEConfig = CogVideoXVAEConfig()):
        self.config = config
        kw = dict(
            latent_channels=config.latent_channels,
            block_out_channels=config.block_out_channels,
            layers_per_block=config.layers_per_block,
            norm_num_groups=config.norm_num_groups,
            temporal_compression_ratio=config.temporal_compression_ratio,
            dtype=config.dtype,
        )
        self.encoder = CogVideoXEncoder3D(**kw)
        self.decoder = CogVideoXDecoder3D(out_channels=3, **kw)
        self.use_tiling = False
        self.spatial_factor = 2 ** (len(config.block_out_channels) - 1)

    def enable_tiling(self):
        self.use_tiling = True

    def init(self, rng) -> dict:
        def build(rng):
            k1, k2 = jax.random.split(rng)
            t = self.config.temporal_compression_ratio
            s = self.spatial_factor
            p_e = self.encoder.init(k1, jnp.zeros((1, t + 1, s * 2, s * 2, 3),
                                                  self.config.dtype))
            p_d = self.decoder.init(k2, jnp.zeros((1, 2, 2, 2,
                                                   self.config.latent_channels),
                                                  self.config.dtype))
            return {"encoder": p_e, "decoder": p_d}

        return jax.jit(build)(rng)  # single cacheable init program

    # ------------------------------------------------------------------ #
    def encode(self, params, x: jax.Array, rng) -> jax.Array:
        """x: [B, 3, T, H, W] -> latent sample [B, C_lat, T', H/8, W/8].
        Jitted (one program per input shape)."""
        from videosys_tpu.utils.jit import jit_method

        return jit_method(self, "_encode_impl")(params, x, rng)

    def _encode_impl(self, params, x: jax.Array, rng) -> jax.Array:
        xl = jnp.transpose(x, (0, 2, 3, 4, 1)).astype(self.config.dtype)
        moments = self.encoder.apply(params["encoder"], xl)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return jnp.transpose(z, (0, 4, 1, 2, 3))

    def _decode_tile(self, params, z):
        from videosys_tpu.utils.jit import jit_method

        return jit_method(self, "_decode_tile_impl")(params, z)

    def _decode_tile_impl(self, params, z):
        return self.decoder.apply(params["decoder"], z)

    def _decode_streamed(self, params, zl: jax.Array) -> jax.Array:
        """Frame-pair streaming decode (reference _decode :1095-1113): chunk
        the latent T axis (first chunk absorbs the remainder), thread every
        causal conv's last raw input frames between chunks via the "cache"
        variable collection. Matches the reference's default decode
        semantics EXACTLY (including per-chunk norm statistics) and bounds
        peak activation memory to O(chunk) — 49-frame 720p decode fits
        16 GiB chips."""
        fbs = self.config.num_latent_frames_batch_size
        T = zl.shape[1]
        if T <= fbs:
            return self._decode_tile(params, zl)
        rem = T % fbs
        bounds = [(0, fbs + rem)]
        start = fbs + rem
        while start < T:
            bounds.append((start, start + fbs))
            start += fbs
        if not hasattr(self, "_stream_fns"):
            self._stream_fns = {}

        def first_fn(p, zc):
            p = {"params": p["params"]}  # drop any stale init-time caches
            return self.decoder.apply(p, zc, mutable=["cache"])

        def next_fn(p, cache, zc):
            return self.decoder.apply({"params": p["params"], "cache": cache},
                                      zc, mutable=["cache"])

        jf = self._stream_fns.setdefault("first", jax.jit(first_fn))
        jn = self._stream_fns.setdefault("next", jax.jit(next_fn))
        outs = []
        cache = None
        for (s0, s1) in bounds:
            zc = zl[:, s0:s1]
            if cache is None:
                out, vars_ = jf(params["decoder"], zc)
            else:
                out, vars_ = jn(params["decoder"], cache, zc)
            cache = vars_["cache"]
            outs.append(out)
        return jnp.concatenate(outs, axis=1)

    def decode(self, params, z: jax.Array, streaming: bool = True) -> jax.Array:
        """z: [B, C_lat, T', h, w] -> pixels [B, 3, T, H, W]. ``streaming``
        follows the reference default (framewise conv-cache decode);
        streaming=False decodes the whole T axis in one program."""
        zl = jnp.transpose(z, (0, 2, 3, 4, 1)).astype(self.config.dtype)
        c = self.config
        if not self.use_tiling or (
            zl.shape[2] <= c.tile_latent_min_height
            and zl.shape[3] <= c.tile_latent_min_width
        ):
            if streaming:
                out = self._decode_streamed(params, zl)
            else:
                out = self._decode_tile(params, zl)
            return jnp.transpose(out, (0, 4, 1, 2, 3))
        return jnp.transpose(self._tiled_decode(params, zl), (0, 4, 1, 2, 3))

    def _tiled_decode(self, params, z):
        """Spatial tiles with linear blending (tiled_decode :1161-1239)."""
        c = self.config
        sf = self.spatial_factor
        # exact reference formulas (tiled_decode :1186-1196): the latent step
        # is int(tile*(1-f)); the pixel blend extent is int(tile*sf*f)
        step_h = int(c.tile_latent_min_height * (1 - c.tile_overlap_factor_height))
        step_w = int(c.tile_latent_min_width * (1 - c.tile_overlap_factor_width))
        blend_h = int(c.tile_latent_min_height * sf * c.tile_overlap_factor_height)
        blend_w = int(c.tile_latent_min_width * sf * c.tile_overlap_factor_width)
        row_limit_h = c.tile_latent_min_height * sf - blend_h
        row_limit_w = c.tile_latent_min_width * sf - blend_w

        H, W = z.shape[2], z.shape[3]
        rows = []
        for i in range(0, H, step_h):
            row = []
            for j in range(0, W, step_w):
                tile = z[:, :, i:i + c.tile_latent_min_height,
                         j:j + c.tile_latent_min_width]
                # frame-pair streaming INSIDE each spatial tile, like the
                # reference (tiled_decode :1205-1218 loops num_batches with
                # the conv cache): a 13-latent-frame 720p-class tile decoded
                # in one program holds ~GiB-scale up-block activations and
                # OOMs a 16 GiB chip.
                row.append(self._decode_streamed(params, tile))
            rows.append(row)

        def blend_v(a, b, extent):
            n = min(a.shape[2], extent)
            w = (jnp.arange(n) / n)[None, None, :, None, None]
            mixed = a[:, :, -n:] * (1 - w) + b[:, :, :n] * w
            return mixed.astype(b.dtype), n

        def blend_hz(a, b, extent):
            n = min(a.shape[3], extent)
            w = (jnp.arange(n) / n)[None, None, None, :, None]
            mixed = a[:, :, :, -n:] * (1 - w) + b[:, :, :, :n] * w
            return mixed.astype(b.dtype), n

        result_rows = []
        for i, row in enumerate(rows):
            result_row = []
            for j, tile in enumerate(row):
                if i > 0:
                    mixed, n = blend_v(rows[i - 1][j], tile, blend_h)
                    tile = tile.at[:, :, :n].set(mixed)
                if j > 0:
                    mixed, n = blend_hz(row[j - 1], tile, blend_w)
                    tile = tile.at[:, :, :, :n].set(mixed)
                result_row.append(tile[:, :, :row_limit_h, :row_limit_w])
            result_rows.append(jnp.concatenate(result_row, axis=3))
        return jnp.concatenate(result_rows, axis=2)
