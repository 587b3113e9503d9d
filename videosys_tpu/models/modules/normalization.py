"""Normalization layers (fp32-stable) and adaLN modulation.

Behavioral reference: `videosys/models/modules/normalization.py` (LlamaRMSNorm
:~20-40), `open_sora_transformer_3d.py:47` (t2i_modulate), and the affine-free
LayerNorm(eps=1e-6) used throughout the DiT blocks. All statistics are
computed in fp32 regardless of compute dtype (matches apex/Llama semantics);
XLA fuses the chains into neighboring ops, which on TPU replaces the
reference's apex FusedRMSNorm wheel.
"""

from __future__ import annotations

from typing import Any

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


class GroupNormMXU(nn.Module):
    """Drop-in GroupNorm for channel-last tensors without the [.., G, C/G]
    group reshape.

    nn.GroupNorm splits channels into (groups, C/G) — a 16-wide minor dim at
    VAE widths, forcing sub-lane tilings and relayout copies (measured ~2 s
    of the 4.8 s Open-Sora 2s/480p VAE decode on v5e). Here the per-channel
    spatial sums stay lane-aligned on [.., C]; folding channels into groups
    and broadcasting the scale back both run on the MXU via a [C, G]
    indicator matrix. Fast-variance numerics and the {scale, bias} param
    pytree match nn.GroupNorm, so checkpoints are interchangeable. Two
    passes over x total (stats + fused affine); output follows x.dtype."""

    num_groups: int
    epsilon: float = 1e-6
    dtype: Any = jnp.float32  # output dtype (nn.GroupNorm contract)

    @nn.compact
    def __call__(self, x):
        import jax

        C = x.shape[-1]
        G = self.num_groups
        if C % G:
            raise ValueError(
                f"channels ({C}) must be divisible by num_groups ({G})")
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1))
        s1 = jnp.sum(xf, axis=axes)       # [B, C]
        s2 = jnp.sum(xf * xf, axis=axes)  # [B, C]
        ind = jnp.equal(jnp.arange(C)[:, None] // (C // G),
                        jnp.arange(G)[None, :]).astype(jnp.float32)
        n = (xf.size // xf.shape[0] // C) * (C // G)
        m = (s1 @ ind) / n                # [B, G]
        var = (s2 @ ind) / n - m * m
        rstd = jax.lax.rsqrt(var + self.epsilon)
        m_c = m @ ind.T                   # [B, C] broadcast back
        r_c = rstd @ ind.T
        bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (C,)
        w = (r_c * scale).reshape(bshape)
        b = (bias - m_c * r_c * scale).reshape(bshape)
        return (xf * w + b).astype(self.dtype)
