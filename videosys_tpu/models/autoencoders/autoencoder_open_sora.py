"""Open-Sora v1.2 video VAE: 2D spatial VAE composed with the causal temporal
VAE, with micro-batched spatial processing and 17-frame temporal chunking.

Behavioral reference: `videosys/models/autoencoders/autoencoder_kl_open_sora.py`
(VideoAutoencoderPipeline :621-728, OpenSoraVAE_V1_2 :731-761). Key math:
* spatial VAE latents are scaled by 0.18215 (:509,:527);
* temporal encode/decode runs in micro_frame_size=17 chunks -> 5 latent
  frames each (:653-695);
* channel norm: z = (z_raw - shift) / scale with per-channel constants
  (:748-749, :670, :677).

This wrapper is a plain functional class (not a linen module): it owns two
linen submodules and exposes pure (params, x) -> y methods so the spatial
micro-batching can use `jax.lax.map` for bounded memory.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videosys_tpu.core import parallel as par
from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D
from videosys_tpu.models.autoencoders.vae_temporal import VAETemporal

SHIFT = (-0.10, 0.34, 0.27, 0.98)
SCALE = (3.85, 2.32, 2.33, 3.06)
SPATIAL_SCALING = 0.18215


@dataclasses.dataclass(frozen=True)
class OpenSoraVAEConfig:
    micro_frame_size: int = 17
    micro_batch_size: Optional[int] = 4
    latent_channels: int = 4
    dtype: object = jnp.float32


class OpenSoraVAE:
    """Composition of AutoencoderKL2D (8x spatial) and VAETemporal (4x time)."""

    def __init__(
        self,
        config: OpenSoraVAEConfig = OpenSoraVAEConfig(),
        spatial: Optional[AutoencoderKL2D] = None,
        temporal: Optional[VAETemporal] = None,
    ):
        self.config = config
        self.spatial = spatial or AutoencoderKL2D(dtype=config.dtype)
        self.temporal = temporal or VAETemporal(dtype=config.dtype)
        # 17 pixel frames -> 5 latent frames (ceil(17/4)); :635
        self.micro_z_frame_size = -(-config.micro_frame_size // 4)
        # combined compression: temporal 4x, spatial 2^(num 2D blocks - 1)
        sf = 2 ** (len(self.spatial.block_out_channels) - 1)
        self.patch_size = (self.temporal.time_downsample_factor, sf, sf)
        self.out_channels = config.latent_channels

    # ------------------------------------------------------------------ #
    def init(self, rng) -> dict:
        def build(rng):
            k1, k2 = jax.random.split(rng)
            dummy_img = jnp.zeros((1, 32, 32, 3), self.config.dtype)
            dummy_lat2d = jnp.zeros((1, 5, 4, 4, self.config.latent_channels),
                                    self.config.dtype)
            p_s = self.spatial.init(k1, dummy_img, k1)
            p_t = self.temporal.init(k2, dummy_lat2d, k2)
            return {"spatial": p_s, "temporal": p_t}

        # one jitted (persistently cacheable) program instead of op-by-op
        # eager dispatch — see utils/jit.jit_init
        return jax.jit(build)(rng)

    def get_latent_size(self, input_size: Tuple[int, int, int]) -> list:
        """(T, H, W) pixels -> latent sizes (VideoAutoencoderPipeline
        :706-717 with micro_frame_size chunk math)."""
        T, H, W = input_size
        mf = self.config.micro_frame_size
        tdf, sf = self.patch_size[0], self.patch_size[1]
        if T is None:
            t_lat = None
        elif mf is None:
            t_lat = -(-T // tdf)
        else:
            t_lat = (T // mf) * self.micro_z_frame_size
            rem = T % mf
            if rem > 0:
                t_lat += -(-rem // tdf)
        return [t_lat, H // sf if H else None, W // sf if W else None]

    # ------------------------------------------------------------------ #
    def _spatial_map(self, fn, frames: jax.Array) -> jax.Array:
        """Apply `fn` over [N, H, W, C] frames in micro-batches via lax.map
        (VideoAutoencoderKL micro_batch_size loop :508-536).

        Multi-chip: each micro-batch is sharded frame-wise over the whole
        mesh (par.shard_frames) — 2D convs are frame-local, so the VAE
        splits N-way with zero comm — and the micro-batch size scales by
        the world size so the PER-DEVICE batch stays at the single-chip
        memory bound. The reference runs its VAE replicated on every rank."""
        ws = par.mesh_world_size()
        mbs = self.config.micro_batch_size
        if mbs is not None:
            mbs = mbs * ws

        def sharded_fn(f):
            return fn(par.shard_frames(f))

        N = frames.shape[0]
        if mbs is None or N <= mbs:
            return sharded_fn(frames)
        pad = (-N) % mbs
        if pad:
            frames = jnp.concatenate([frames, frames[:pad]], axis=0)
        chunks = frames.reshape((-1, mbs) + frames.shape[1:])
        out = jax.lax.map(sharded_fn, chunks)
        out = out.reshape((-1,) + out.shape[2:])
        return out[:N]

    def spatial_encode(self, params, x: jax.Array, rng) -> jax.Array:
        """x: [B, T, H, W, 3] -> sampled 2D latents [B, T, H/8, W/8, 4]*0.18215."""
        B, T = x.shape[:2]
        frames = x.reshape((B * T,) + x.shape[2:])

        def enc(f):
            return self.spatial.apply(params["spatial"], f, method="encode")

        moments = self._spatial_map(enc, frames)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        noise = jax.random.normal(rng, mean.shape, mean.dtype)
        z = (mean + std * noise) * SPATIAL_SCALING
        return z.reshape((B, T) + z.shape[1:])

    def spatial_decode(self, params, z: jax.Array) -> jax.Array:
        """z: [B, T, h, w, 4] -> [B, T, H, W, 3]."""
        B, T = z.shape[:2]
        frames = z.reshape((B * T,) + z.shape[2:])

        def dec(f):
            return self.spatial.apply(params["spatial"], f / SPATIAL_SCALING,
                                      method="decode")

        x = self._spatial_map(dec, frames)
        return x.reshape((B, T) + x.shape[1:])

    # ------------------------------------------------------------------ #
    def encode(self, params, x: jax.Array, rng) -> jax.Array:
        """x: [B, C, T, H, W] pixels -> normalized latent [B, C, T_lat, h, w].
        Jitted end-to-end (see decode)."""
        from videosys_tpu.utils.jit import jit_method

        return jit_method(self, "_encode_impl")(params, x, rng)

    def _encode_impl(self, params, x: jax.Array, rng) -> jax.Array:
        x = jnp.transpose(x, (0, 2, 3, 4, 1)).astype(self.config.dtype)
        r1, r2 = jax.random.split(rng)
        x_z = self.spatial_encode(params, x, r1)  # [B, T, h, w, 4]
        x_z = par.shard_vae_rows(x_z)  # multi-chip: latent rows over sp
        mf = self.config.micro_frame_size
        T = x_z.shape[1]
        z_list = []
        for i in range(0, T, mf or T):
            chunk = x_z[:, i:i + (mf or T)]
            mean, logvar = self.temporal.apply(params["temporal"], chunk,
                                               method="encode_moments")
            noise = jax.random.normal(jax.random.fold_in(r2, i),
                                      mean.shape, mean.dtype)
            z_list.append(mean + jnp.exp(0.5 * logvar) * noise)
        z = jnp.concatenate(z_list, axis=1)
        shift = jnp.asarray(SHIFT, z.dtype)
        scale = jnp.asarray(SCALE, z.dtype)
        z = (z - shift) / scale
        return jnp.transpose(z, (0, 4, 1, 2, 3))

    def decode(self, params, z: jax.Array, num_frames: int) -> jax.Array:
        """z: [B, C, T_lat, h, w] -> pixels [B, 3, num_frames, H, W].
        Jitted end-to-end (one compiled program per latent shape) — the
        chunk/micro-batch loops below unroll at trace time."""
        from videosys_tpu.utils.jit import jit_method

        return jit_method(self, "_decode_impl", static_argnums=(2,))(
            params, z, num_frames)

    def decode_chunks_u8(self, params, z: jax.Array, num_frames: int):
        """Streaming decode: list of DEVICE uint8 chunks [B, nf, H, W, 3]
        (postprocess layout), one per micro_frame_size chunk, each from its
        own jitted program. The pipeline starts the device->host copy of
        chunk i while chunk i+1 is still decoding — on remote-TPU setups the
        D2H link is slow enough (~8 s for a fp32 2s/480p video) that this
        overlap plus the fused on-device uint8 conversion removes most of
        the postprocess phase. Numerically identical to decode() + the
        pipeline's uint8 conversion (elementwise, chunked on T only)."""
        from videosys_tpu.utils.jit import jit_method

        mf = self.config.micro_frame_size
        if mf is None:
            return [jit_method(self, "_decode_chunk_u8", static_argnums=(2,))(
                params, z, num_frames)]
        outs = []
        remaining = num_frames
        for i in range(0, z.shape[2], self.micro_z_frame_size):
            z_bs = z[:, :, i:i + self.micro_z_frame_size]
            nf = min(mf, remaining)
            outs.append(jit_method(self, "_decode_chunk_u8",
                                   static_argnums=(2,))(params, z_bs, nf))
            remaining -= mf
        return outs

    def _decode_chunk_u8(self, params, z: jax.Array, num_frames: int) -> jax.Array:
        """One chunk of _decode_impl + the pipeline's uint8 postprocess math
        ((clip(x,-1,1)+1)/2*255+0.5 in the [B,T,H,W,3] layout), fused so the
        transfer moves 1/4 the bytes and no fp32 video is ever materialized."""
        z = jnp.transpose(z, (0, 2, 3, 4, 1)).astype(self.config.dtype)
        shift = jnp.asarray(SHIFT, z.dtype)
        scale = jnp.asarray(SCALE, z.dtype)
        z = z * scale + shift
        # multi-chip: latent rows over sp (halo-exchanged 3D convs)
        x_z = self.temporal.apply(params["temporal"], par.shard_vae_rows(z),
                                  num_frames, method="decode")
        x = self.spatial_decode(params, x_z)  # [B, T, H, W, 3]
        u8 = jnp.clip((jnp.clip(x, -1, 1) + 1) / 2 * 255 + 0.5, 0, 255)
        return u8.astype(jnp.uint8)

    def _decode_impl(self, params, z: jax.Array, num_frames: int) -> jax.Array:
        z = jnp.transpose(z, (0, 2, 3, 4, 1)).astype(self.config.dtype)
        shift = jnp.asarray(SHIFT, z.dtype)
        scale = jnp.asarray(SCALE, z.dtype)
        z = z * scale + shift
        mf = self.config.micro_frame_size
        z = par.shard_vae_rows(z)  # multi-chip: latent rows over sp
        if mf is None:
            x_z = self.temporal.apply(params["temporal"], z, num_frames,
                                      method="decode")
        else:
            chunks = []
            remaining = num_frames
            for i in range(0, z.shape[1], self.micro_z_frame_size):
                z_bs = z[:, i:i + self.micro_z_frame_size]
                nf = min(mf, remaining)
                chunks.append(self.temporal.apply(params["temporal"], z_bs, nf,
                                                  method="decode"))
                remaining -= mf
            x_z = jnp.concatenate(chunks, axis=1)
        x = self.spatial_decode(params, x_z)  # [B, T, H, W, 3]
        return jnp.transpose(x, (0, 4, 1, 2, 3))
