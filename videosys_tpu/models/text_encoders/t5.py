"""Text encoders: T5 (Flax) wrapper + an offline deterministic stub.

Behavioral reference: `videosys/pipelines/open_sora/pipeline_open_sora.py`
(get_text_embeddings :272-292 — T5 last_hidden_state + attention mask,
max_length=300 padding). The reference loads "DeepFloyd/t5-v1_1-xxl"
(4096-dim); in air-gapped environments `StubTextEncoder` provides a
deterministic, tokenizer-free embedding so pipelines/benchmarks run without
weights.
"""

from __future__ import annotations

import hashlib
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class T5TextEncoder:
    """HF Flax T5 encoder + tokenizer. Requires local weights."""

    def __init__(self, path: str, max_length: int = 300, dtype=jnp.float32,
                 offload: bool = False):
        import os

        from transformers import AutoTokenizer, FlaxT5EncoderModel

        # local-first: never spin on network retries (zero-egress images,
        # air-gapped pods); opt into downloads with VIDEOSYS_ALLOW_DOWNLOAD=1
        kwargs = {}
        if not os.environ.get("VIDEOSYS_ALLOW_DOWNLOAD"):
            kwargs["local_files_only"] = True
        self.tokenizer = AutoTokenizer.from_pretrained(path, **kwargs)
        self.model = FlaxT5EncoderModel.from_pretrained(path, dtype=dtype,
                                                        **kwargs)
        self.max_length = max_length
        self.output_dim = self.model.config.d_model
        # low-mem mode (reference cpu_offload, pipeline_open_sora.py:239-242):
        # a T5-XXL encoder is ~9 GiB bf16 — keep its params committed to host
        # memory and device_put them only for the encode call, freeing the
        # HBM for the transformer/VAE phases. Otherwise pin to the default
        # device ONCE so repeat encodes never re-transfer.
        self.offload = offload
        target = jax.devices("cpu")[0] if offload else jax.devices()[0]
        self._params = jax.device_put(self.model.params, target)
        module = self.model.module

        # traced encode: shapes are fixed (max_length padding), so this
        # compiles once and removes the per-generate eager dispatch; params
        # are an argument (not a captured constant) so offload can swap them
        @jax.jit
        def _encode(params, input_ids, attention_mask):
            return module.apply(
                {"params": params}, input_ids=input_ids,
                attention_mask=attention_mask).last_hidden_state

        self._encode = _encode

    def encode(self, texts: Sequence[str]) -> Tuple[jax.Array, jax.Array]:
        tok = self.tokenizer(
            list(texts),
            max_length=self.max_length,
            padding="max_length",
            truncation=True,
            return_attention_mask=True,
            add_special_tokens=True,
            return_tensors="np",
        )
        params = (jax.device_put(self._params, jax.devices()[0])
                  if self.offload else self._params)
        hidden = self._encode(params, jnp.asarray(tok["input_ids"]),
                              jnp.asarray(tok["attention_mask"]))
        if self.offload:
            # materialize before dropping the device params reference
            jax.block_until_ready(hidden)
        del params
        mask = jnp.asarray(tok["attention_mask"]).astype(bool)
        return hidden, mask


class StubTextEncoder:
    """Deterministic offline text embedding: words hash to fixed gaussian
    vectors. Preserves the (embs [B, L, D], mask [B, L]) contract so the whole
    pipeline runs end-to-end without downloaded weights."""

    def __init__(self, output_dim: int = 4096, max_length: int = 300):
        self.output_dim = output_dim
        self.max_length = max_length

    def _word_vec(self, word: str) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(word.encode()).digest()[:4], "little")
        return np.random.default_rng(seed).standard_normal(self.output_dim).astype(np.float32)

    def encode(self, texts: Sequence[str]) -> Tuple[jax.Array, jax.Array]:
        B, L = len(texts), self.max_length
        embs = np.zeros((B, L, self.output_dim), np.float32)
        mask = np.zeros((B, L), bool)
        for i, text in enumerate(texts):
            words = text.split()[: L - 1] if text else []
            for j, w in enumerate(words):
                embs[i, j] = self._word_vec(w)
            embs[i, len(words)] = self._word_vec("</s>")
            mask[i, : len(words) + 1] = True
        return jnp.asarray(embs), jnp.asarray(mask)
