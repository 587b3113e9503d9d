"""Embedders: timestep/size/caption/patch + 2D sincos position + rotary.

Behavioral reference: `videosys/models/modules/embeddings.py`
(TimestepEmbedder :107-146, SizeEmbedder :149-180, OpenSoraCaptionEmbedder
:183-228, OpenSoraPatchEmbed3D :54-104, OpenSoraPositionEmbedding2D :231-280)
and `rotary_embedding_torch.RotaryEmbedding` (interleaved-pair rotation,
theta=10000) used by STDiT3's temporal attention
(open_sora_transformer_3d.py:388-390).

TPU notes: position tables are computed with numpy at trace time (H, W are
static per compiled shape → XLA constant-folds them); convolutions use
channel-last layout.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def timestep_embedding(t: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
    """Sinusoidal embedding, cos-first ordering (embeddings.py:121-139)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    """MLP(sinusoid(t)): Linear(256->C) SiLU Linear(C->C) (embeddings.py:107-146)."""

    hidden_size: int
    freq_embed_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        x = timestep_embedding(t, self.freq_embed_size).astype(self.dtype)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_0")(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_2")(x)
        return x


class SizeEmbedder(nn.Module):
    """Embeds scalar sizes (fps etc.); same net as TimestepEmbedder but
    flattens multiple scalar dims into the channel dim (embeddings.py:149-180)."""

    hidden_size: int
    freq_embed_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s: jax.Array, batch: int) -> jax.Array:
        if s.ndim == 1:
            s = s[:, None]
        if s.shape[0] != batch:
            s = jnp.tile(s, (batch // s.shape[0], 1))
        b, dims = s.shape
        x = timestep_embedding(s.reshape(-1), self.freq_embed_size).astype(self.dtype)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_0")(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_2")(x)
        return x.reshape(b, dims * self.hidden_size)


class Mlp(nn.Module):
    """timm-style MLP with tanh-approximated GELU (activations.py:3)."""

    hidden_features: int
    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=True)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        return x


class CaptionEmbedder(nn.Module):
    """Projects T5 features to the model dim; owns the learned null-caption
    table used for CFG (embeddings.py:183-228)."""

    in_channels: int
    hidden_size: int
    token_num: int = 300
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.y_proj = Mlp(self.hidden_size, self.hidden_size, dtype=self.dtype)
        self.y_embedding = self.param(
            "y_embedding",
            lambda key, shape: jax.random.normal(key, shape) / shape[-1] ** 0.5,
            (self.token_num, self.in_channels),
        )

    def __call__(self, caption: jax.Array) -> jax.Array:
        """caption: [B, L, in_channels] -> [B, L, hidden]."""
        return self.y_proj(caption.astype(self.dtype))

    def null_embedding(self, batch: int) -> jax.Array:
        """The uncond caption features for CFG (pipeline-side `null()`)."""
        return jnp.broadcast_to(
            self.y_embedding[None], (batch,) + self.y_embedding.shape
        ).astype(self.dtype)


class PatchEmbed3D(nn.Module):
    """Video-to-patch embedding via strided Conv3D, channel-last
    (embeddings.py:54-104). Input [B, T, H, W, C_in] -> [B, T', H', W', C]."""

    patch_size: Tuple[int, int, int] = (1, 2, 2)
    embed_dim: int = 1152
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pt, ph, pw = self.patch_size
        _, T, H, W, _ = x.shape
        pad_t = (-T) % pt
        pad_h = (-H) % ph
        pad_w = (-W) % pw
        if pad_t or pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_t), (0, pad_h), (0, pad_w), (0, 0)))
        x = nn.Conv(
            self.embed_dim,
            kernel_size=self.patch_size,
            strides=self.patch_size,
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x.astype(self.dtype))
        return x


def pos_embed_2d(
    dim: int,
    h: int,
    w: int,
    scale: float = 1.0,
    base_size: int | None = None,
) -> np.ndarray:
    """2D sincos position table (embeddings.py:231-280). Returns [h*w, dim]
    numpy fp32; token (i, j) gets [sincos(w_j), sincos(h_i)] — note the
    reference concatenates the *width* embedding first (its meshgrid swap).
    """
    assert dim % 4 == 0
    half = dim // 2
    inv_freq = 1.0 / (10000 ** (np.arange(0, half, 2, dtype=np.float32) / half))
    grid_h = np.arange(h, dtype=np.float32) / scale
    grid_w = np.arange(w, dtype=np.float32) / scale
    if base_size is not None:
        grid_h = grid_h * (base_size / h)
        grid_w = grid_w * (base_size / w)

    def sincos(coords):  # [n] -> [n, half]
        out = np.outer(coords, inv_freq)
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    emb_w = sincos(grid_w)  # [w, half]
    emb_h = sincos(grid_h)  # [h, half]
    emb_w_full = np.broadcast_to(emb_w[None, :, :], (h, w, half))
    emb_h_full = np.broadcast_to(emb_h[:, None, :], (h, w, half))
    return np.concatenate([emb_w_full, emb_h_full], axis=-1).reshape(h * w, dim)


def rope_freqs(dim: int, theta: float = 10000.0) -> np.ndarray:
    """rotary_embedding_torch default frequencies: [dim/2]."""
    return 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32)[: dim // 2] / dim))


def rotate_interleaved_pairs(x: jax.Array, cos: jax.Array, sin: jax.Array,
                             compute_dtype=jnp.float32) -> jax.Array:
    """out = x*cos + swap(x)*sin with the adjacent-pair swap
    ``(x0, x1) -> (-x1, x0)`` expressed as two full-lane rolls + a parity
    select (alternating sign folded into the sin table).

    Bit-exact in fp32 vs the reshape-to-pairs form, which forces
    ``[..., D/2, 2]`` intermediates with T(2,128) tilings on TPU (measured
    45 GB/s effective; this form is ~2.4x faster). cos/sin: [..., D] with
    each frequency duplicated onto its channel pair."""
    even = (jnp.arange(x.shape[-1]) % 2) == 0
    sin_alt = jnp.where(even, -sin, sin).astype(compute_dtype)
    xd = x.astype(compute_dtype)
    swapped = jnp.where(even, jnp.roll(xd, -1, -1), jnp.roll(xd, 1, -1))
    return (xd * cos.astype(compute_dtype) + swapped * sin_alt).astype(x.dtype)


def apply_rope(x: jax.Array, positions: jax.Array | np.ndarray, freqs: np.ndarray) -> jax.Array:
    """Interleaved-pair RoPE (rotary_embedding_torch.rotate_queries_or_keys).

    x: [..., N, D] rotated over its second-to-last axis; positions: [N].
    rotate_half pairs (x0, x1) -> (-x1, x0) on adjacent elements.
    """
    angles = jnp.asarray(positions, dtype=jnp.float32)[:, None] * jnp.asarray(freqs)[None]
    cos = jnp.repeat(jnp.cos(angles), 2, axis=-1)  # [N, D]
    sin = jnp.repeat(jnp.sin(angles), 2, axis=-1)
    return rotate_interleaved_pairs(x, cos, sin)


def rope_axis_tables(dim: int, length: int, scale: float = 1.0,
                     theta: float = 10000.0) -> tuple[np.ndarray, np.ndarray]:
    """1D RoPE (cos, sin) tables with duplicated halves ([freqs, freqs]),
    rotate-half convention (OSP RoPE1D/RoPE2D/RoPE3D get_cos_sin,
    open_sora_plan_v110_transformer_3d.py:199-243 /
    open_sora_plan_v120_transformer_3d.py:73-84). Returns [length, dim]."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(length, dtype=np.float32) / scale
    freqs = np.outer(t, inv_freq)
    freqs = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(freqs), np.sin(freqs)


def apply_rope_multiaxis(x: jax.Array, cos, sin, n_axes: int) -> jax.Array:
    """Split the head dim into `n_axes` equal chunks and rotate each with its
    axis table (OSP RoPE2D.forward :167-186 / RoPE3D.forward :97-119).

    x: [..., N, D_total]; cos/sin: [N, D_total] (per-token, axes concatenated),
    broadcastable against x. rotate_half is applied within each chunk."""
    D = x.shape[-1] // n_axes
    cos = jnp.asarray(cos, jnp.float32)
    sin = jnp.asarray(sin, jnp.float32)
    xf = x.astype(jnp.float32)
    parts = []
    for i in range(n_axes):
        tok = xf[..., i * D:(i + 1) * D]
        c = cos[..., i * D:(i + 1) * D]
        s = sin[..., i * D:(i + 1) * D]
        x1, x2 = tok[..., : D // 2], tok[..., D // 2:]
        rot = jnp.concatenate([-x2, x1], axis=-1)
        parts.append(tok * c + rot * s)
    return jnp.concatenate(parts, axis=-1).astype(x.dtype)


def rope_channel_tables(positions, freqs: np.ndarray,
                        num_heads: int) -> tuple[np.ndarray, np.ndarray]:
    """Interleaved-pair RoPE (apply_rope convention) as channel-layout
    [N, C=H*D] cos/sin tables (per-head table tiled across heads)."""
    angles = np.asarray(positions, np.float32)[:, None] * np.asarray(freqs)[None]
    cos = np.repeat(np.cos(angles), 2, axis=-1)  # [N, D]
    sin = np.repeat(np.sin(angles), 2, axis=-1)
    return np.tile(cos, (1, num_heads)), np.tile(sin, (1, num_heads))


def apply_rope_channel(x: jax.Array, cos, sin) -> jax.Array:
    """apply_rope in the [B, N, C] channel layout: the interleaved-pair
    rotation is position-uniform across heads, so rotating adjacent pairs
    over the full C axis is exactly the per-head rotation — with C (a lane
    multiple) as the minor dim instead of head_dim.

    Compute follows x.dtype (fp32 in tests — bit-exact vs the pair-reshape
    form; bf16 on TPU adds only bf16 rounding). See
    ``rotate_interleaved_pairs`` for the roll-based swap."""
    dt = x.dtype if x.dtype in (jnp.float32, jnp.bfloat16) else jnp.float32
    return rotate_interleaved_pairs(x, jnp.asarray(cos, jnp.float32),
                                    jnp.asarray(sin, jnp.float32),
                                    compute_dtype=dt)
