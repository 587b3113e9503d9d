"""Normalization layers (fp32-stable) and adaLN modulation.

Behavioral reference: `videosys/models/modules/normalization.py` (LlamaRMSNorm
:~20-40), `open_sora_transformer_3d.py:47` (t2i_modulate), and the affine-free
LayerNorm(eps=1e-6) used throughout the DiT blocks. All statistics are
computed in fp32 regardless of compute dtype (matches apex/Llama semantics);
XLA fuses the chains into neighboring ops, which on TPU replaces the
reference's apex FusedRMSNorm wheel.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class RMSNorm(nn.Module):
    """LlamaRMSNorm: x * rsqrt(mean(x^2) + eps) * weight, stats in fp32.
    With `num_heads` set, the input is channel-layout [B, N, C=H*dim] and the
    norm runs per head via rms_norm_heads (lane-friendly on TPU; numerically
    equal to normalizing after the head split)."""

    dim: int
    eps: float = 1e-6
    num_heads: int = 0  # 0 = plain last-dim norm

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        if self.num_heads:
            return rms_norm_heads(x, weight, self.num_heads, self.eps)
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * (var + self.eps) ** -0.5
        return (weight * xf.astype(dtype)).astype(dtype)


def layer_norm(x, eps: float = 1e-6):
    """Affine-free LayerNorm with fp32 statistics (nn.LayerNorm(eps=1e-6,
    elementwise_affine=False) in the reference blocks). (A dot-with-ones
    MXU formulation of the stats measured identical step time — XLA
    canonicalizes it back to the same reduce — so this stays simple.)"""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * (var + eps) ** -0.5).astype(dtype)


def t2i_modulate(x, shift, scale):
    """adaLN modulate: x * (1 + scale) + shift (open_sora_transformer_3d.py:47)."""
    return x * (1 + scale) + shift


def rms_norm_heads(x, weight, num_heads: int, eps: float = 1e-6):
    """Per-head RMSNorm computed in the channel layout [B, N, C=H*D].

    Numerically identical to reshaping into heads and normalizing over D,
    but the minor dim stays C (a multiple of 128 lanes) instead of the
    badly-tiled D=72 — measured ~3.5x faster on v5e at DiT shapes. `weight`
    is the per-head_dim scale shared across heads (LlamaRMSNorm)."""
    import jax

    B, N, C = x.shape
    D = C // num_heads
    # Per-head mean-square via the MXU instead of a cross-lane reduce over
    # the badly-tiled D=72 minor: (x^2) @ block-indicator [C, H] sums each
    # head's channels (fp32 accumulation); the inverse map [H, C] broadcasts
    # the rsqrt scale back to channel layout. Both matmuls are ~3.5 GFLOP at
    # DiT shapes — free next to the saved fp32 round-trips.
    blocks = jnp.equal(jnp.arange(C)[:, None] // D,
                       jnp.arange(num_heads)[None, :])
    xf = x.astype(jnp.float32)
    sq = jax.lax.dot_general(xf * xf, blocks.astype(jnp.float32),
                             (((2,), (0,)), ((), ())))  # [B, N, H]
    scale = jax.lax.rsqrt(sq / D + eps)
    scale_c = jax.lax.dot_general(scale, blocks.astype(jnp.float32).T,
                                  (((2,), (0,)), ((), ())))  # [B, N, C]
    w = jnp.tile(weight.astype(jnp.float32), num_heads)  # [C]
    return (xf * (scale_c * w)).astype(x.dtype)
