"""Shared pipeline helpers.

`bucket_text_kv` is the jit-compatible counterpart of the reference's
text-token compression: the reference gathers only the real caption tokens
before cross-attention (`y_lens` select + concat,
open_sora_transformer_3d.py:622-633), so its cross-attention KV length is
the true prompt length, not `model_max_length`. Dynamic shapes are hostile
to XLA, so instead we round the longest real prompt in the batch up to a
bucket (64-token granularity) and statically slice.  Numerically this is
exact: tokens beyond the slice are fully masked, the softmax max is
attained on a real token, and their masked scores underflow to exactly 0.0
in the softmax numerator, so removing them changes nothing mathematically.
(XLA may still reassociate the shorter reductions differently, so isolated
±1-ulp rounding — at most a ±1 step after uint8 quantization — can occur;
the engine-level tests bound it.)  Each
distinct bucket compiles its own denoise program (compile-cached; at most
`ceil(model_max_length/64)` variants ever exist).

Measured (one v5e, Open-Sora 2s/480p, 30 steps): cross-attention KV
300 -> 64 for short prompts; see docs/performance.md.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np

_GRANULARITY = 64


def bucket_text_kv(y: jax.Array, kv_mask: jax.Array, max_length: int,
                   granularity: int = _GRANULARITY,
                   ) -> Tuple[jax.Array, jax.Array, int]:
    """Slice padded caption embeddings to the smallest length bucket that
    covers every real token in the batch.

    y: [B, L, C] padded embeddings; kv_mask: [B, L] bool (True = real).
    Returns (y[:, :Lb], kv_mask[:, :Lb], Lb) with Lb a multiple of
    `granularity`, capped at `max_length`. A no-op when the batch already
    needs the full length.
    """
    n_real = int(np.asarray(kv_mask).sum(axis=1).max())
    lb = -(-max(n_real, 1) // granularity) * granularity
    lb = min(int(max_length), lb)
    if lb >= y.shape[1]:
        return y, kv_mask, y.shape[1]
    return y[:, :lb], kv_mask[:, :lb], lb
