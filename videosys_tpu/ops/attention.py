"""Attention dispatch: Pallas flash kernel on TPU, jnp reference elsewhere.

Behavioral reference: `videosys/models/modules/attentions.py`
(OpenSoraAttention.forward :55-120, native_attention :111-120,
OpenSoraMultiHeadCrossAttention.torch_impl :259-270). The reference's
empirical `N >= 30 use flash` heuristic becomes `N >= FLASH_MIN_SEQ` here —
on TPU tiny sequences (temporal attention over ~30 frames) are faster as one
fused XLA matmul chain than as a grid-launched kernel.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from videosys_tpu.ops.flash_attention import flash_attention

# Below this q-sequence length the jnp path wins (kernel launch + padding
# overhead dominates); mirrors attentions.py:58.
FLASH_MIN_SEQ = 256


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def reference_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    kv_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain attention with fp32 softmax (attentions.py:111-120 casts the
    score matrix to fp32 before softmax). q,k,v: [B, H, N, D]."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k).astype(jnp.float32)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, -1e9)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def scaled_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    kv_mask: Optional[jax.Array] = None,
    force_flash: Optional[bool] = None,
) -> jax.Array:
    """Dispatching attention. q: [B, H, Nq, D]; k, v: [B, H, Nk, D];
    kv_mask: optional [B, Nk] bool (True = attend)."""
    use_flash = force_flash if force_flash is not None else (
        _on_tpu() and q.shape[2] >= FLASH_MIN_SEQ
    )
    if use_flash:
        return flash_attention(q, k, v, scale=scale, kv_mask=kv_mask)
    return reference_attention(q, k, v, scale=scale, kv_mask=kv_mask)
