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

# Measured on TPU v5e (spatial-attention shapes of Open-Sora 2s/480p,
# B=30 H=16 N=1590 D=72): XLA's fused attention reaches ~24 TF/s vs ~16 TF/s
# for the Pallas kernel — grid/padding overheads dominate until the
# materialized score matrix would pressure HBM. So the kernel engages on
# MEMORY, not a fixed N: when fp32 scores would exceed SCORES_BYTES_LIMIT or
# the kv length is long enough that XLA's one-shot materialization thrashes.
# (The reference's N>=30 flash heuristic, attentions.py:58, tuned for CUDA
# kernel-launch costs, does not transfer to XLA:TPU.)
# Measured (r2): forcing the kernel onto cross-attention shapes (Nk=300,
# scores 0.9 GB) is a LOSS — step 1.357 -> 1.440 s; the 384-lane-padded
# small-Nk programs don't amortize. Keep the 1 GiB threshold.
# Update after the single-pass kernel (flash_attention.py): at DiT spatial
# shapes both paths are exp-bound (~25 TF/s) — equal speed, but the kernel
# never materializes the fp32 score matrix (4.9 GiB at 2s/480p), so it wins
# on HBM headroom. Engage it whenever the scores would be big.
FLASH_MIN_SEQ = 256           # lower bound on q length
FLASH_MIN_KV = 1024           # engage flash at/above this kv length
SCORES_BYTES_LIMIT = 1 << 30  # or when fp32 scores exceed this


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
    if force_flash is None:
        # experiment override (read at trace time): lets full-model A/Bs
        # compare the Pallas path vs XLA reference attention without
        # threading a flag through every module (experiments/train_perf.py)
        import os

        env = os.environ.get("VIDEOSYS_FORCE_FLASH")
        if env is not None:
            force_flash = env not in ("0", "false", "")
    if force_flash is not None:
        use_flash = force_flash
    else:
        B, H, Nq, _ = q.shape
        Nk = k.shape[2]
        scores_bytes = 4 * B * H * Nq * Nk
        use_flash = _on_tpu() and Nq >= FLASH_MIN_SEQ and (
            Nk >= FLASH_MIN_KV or scores_bytes > SCORES_BYTES_LIMIT
        )
    if use_flash:
        return flash_attention(q, k, v, scale=scale, kv_mask=kv_mask)
    return reference_attention(q, k, v, scale=scale, kv_mask=kv_mask)
