"""Attention blocks shared across the DiT families.

Behavioral reference: `videosys/models/modules/attentions.py`
(OpenSoraAttention :20-120, OpenSoraMultiHeadCrossAttention :135-270).
The flash-attn / apex wheels are replaced by the Pallas kernel in
`videosys_tpu.ops` (dispatched per backend / sequence length).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from videosys_tpu.models.modules.embeddings import apply_rope_channel
from videosys_tpu.models.modules.normalization import RMSNorm
from videosys_tpu.ops.attention import scaled_dot_product_attention


class SelfAttention(nn.Module):
    """Multi-head self-attention with optional RMS qk-norm and RoPE
    (OpenSoraAttention). Operates on [B, N, C].

    TPU note: qk-norm and (interleaved-pair) RoPE run in the CHANNEL layout
    [B, N, C] before the head split — C is a lane multiple while head_dim is
    not, and the channel-layout ops measured ~3.5x faster at DiT shapes.
    `rope_channel` takes precomputed [N, C] (cos, sin) tables
    (embeddings.rope_channel_tables); the `rope` callable fallback operates
    on the split [B, H, N, D] layout (used by the 2D/3D-RoPE families)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    rope: Optional[Callable[[jax.Array], jax.Array]] = None
    rope_channel: Any = None  # (cos [N, C], sin [N, C]) numpy tables

    @nn.compact
    def __call__(self, x: jax.Array,
                 kv_mask: Optional[jax.Array] = None) -> jax.Array:
        """x: [B, N, C]; kv_mask: optional [B, N] bool (True = real token) —
        used when the token dim carries mesh-divisibility padding
        (parallel.token_pad_multiple)."""
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # each [B, N, C]

        if N == 1:
            # Single-token attention is the identity over v (attentions.py:65-66).
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(v)

        if self.qk_norm:
            q = RMSNorm(head_dim, num_heads=self.num_heads, name="q_norm")(q)
            k = RMSNorm(head_dim, num_heads=self.num_heads, name="k_norm")(k)
        if self.rope_channel is not None:
            cos, sin = self.rope_channel
            q = apply_rope_channel(q, cos, sin)
            k = apply_rope_channel(k, cos, sin)

        def heads(t):
            return jnp.swapaxes(t.reshape(B, N, self.num_heads, head_dim), 1, 2)

        q, k, v = heads(q), heads(k), heads(v)
        if self.rope_channel is None and self.rope is not None:
            q = self.rope(q)
            k = self.rope(k)
        x = scaled_dot_product_attention(q, k, v, scale=scale,
                                         kv_mask=kv_mask)
        x = jnp.swapaxes(x, 1, 2).reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(x)


class MultiHeadCrossAttention(nn.Module):
    """Cross attention from image tokens to (padded) text tokens
    (OpenSoraMultiHeadCrossAttention). x: [B*frames, S, C] (rows are
    batch-major, frame-minor); cond: [B, L, C]; kv_mask: [B, L] bool
    (True = real token), replacing the varlen-flash packing. The kv
    projection runs once per batch element; k/v are broadcast across frames
    (cross attention is token-local, so the per-frame layout keeps it fully
    local under DSP's spatial sharding)."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        cond: jax.Array,
        kv_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        Bf, N, C = x.shape
        Bc, L, _ = cond.shape
        frames = Bf // Bc
        head_dim = self.dim // self.num_heads

        q = nn.Dense(self.dim, dtype=self.dtype, name="q_linear")(x)
        kv = nn.Dense(self.dim * 2, dtype=self.dtype, name="kv_linear")(cond)
        k, v = jnp.split(kv, 2, axis=-1)

        q = jnp.swapaxes(q.reshape(Bf, N, self.num_heads, head_dim), 1, 2)
        k = jnp.swapaxes(k.reshape(Bc, L, self.num_heads, head_dim), 1, 2)
        v = jnp.swapaxes(v.reshape(Bc, L, self.num_heads, head_dim), 1, 2)
        if frames > 1:
            k = jnp.repeat(k, frames, axis=0)  # batch-major, frame-minor
            v = jnp.repeat(v, frames, axis=0)
            if kv_mask is not None:
                kv_mask = jnp.repeat(kv_mask, frames, axis=0)

        out = scaled_dot_product_attention(q, k, v, scale=head_dim**-0.5, kv_mask=kv_mask)
        out = jnp.swapaxes(out, 1, 2).reshape(Bf, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
