"""CLIP-L + CLIP-G + T5 trio for Vchitect (SD3-style packing).

Behavioral reference: `videosys/pipelines/vchitect/pipeline_vchitect.py`
(_get_clip_prompt_embeds :322-399, _get_t5_prompt_embeds :287-321, packing in
encode_prompt :470-500):

* each CLIP contributes hidden_states[-2] (clip_skip None) and the PROJECTED
  pooled embedding;
* clip_embeds = concat(L, G) on channels, zero-padded to the T5 width;
* prompt_embeds = concat(clip_embeds, t5_embeds) on the sequence axis;
* pooled = concat(pooled_L, pooled_G).
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from videosys_tpu.models.text_encoders.t5 import T5TextEncoder


class ClipTextEncoder:
    """HF Flax CLIPTextModelWithProjection + tokenizer (one of the two CLIPs).
    Returns (hidden_states[-2] [B, 77, D], projected pooled [B, P])."""

    def __init__(self, path: str, subfolder_tok: str = "tokenizer",
                 subfolder_enc: str = "text_encoder",
                 max_length: int = 77, dtype=jnp.float32):
        from transformers import AutoTokenizer, FlaxCLIPTextModelWithProjection

        kwargs = {}
        if not os.environ.get("VIDEOSYS_ALLOW_DOWNLOAD"):
            kwargs["local_files_only"] = True
        self.tokenizer = AutoTokenizer.from_pretrained(
            path, subfolder=subfolder_tok, **kwargs)
        self.model = FlaxCLIPTextModelWithProjection.from_pretrained(
            path, subfolder=subfolder_enc, dtype=dtype, **kwargs)
        self.max_length = max_length
        self.hidden_dim = self.model.config.hidden_size
        self.pooled_dim = self.model.config.projection_dim

    def encode(self, texts: Sequence[str]) -> Tuple[jax.Array, jax.Array]:
        tok = self.tokenizer(list(texts), padding="max_length",
                             max_length=self.max_length, truncation=True,
                             return_tensors="np")
        out = self.model(input_ids=jnp.asarray(tok["input_ids"]),
                         output_hidden_states=True)
        # clip_skip=None -> penultimate hidden layer (:356-360)
        return out.hidden_states[-2], out.text_embeds


class VchitectTripleTextEncoder:
    """CLIP-L + CLIP-G + T5 with the SD3 packing the Vchitect transformer
    expects: `encode_dual(texts) -> (prompt_embeds [B, 77+L_t5, joint_dim],
    pooled [B, pooled_L + pooled_G])` — the same contract as the offline
    `DualStubTextEncoder`."""

    def __init__(self, model_path: str, t5_max_length: int = 256,
                 dtype=jnp.float32):
        self.clip_l = ClipTextEncoder(model_path, "tokenizer", "text_encoder",
                                      dtype=dtype)
        self.clip_g = ClipTextEncoder(model_path, "tokenizer_2",
                                      "text_encoder_2", dtype=dtype)
        self.t5 = T5TextEncoder(os.path.join(model_path, "text_encoder_3"),
                                max_length=t5_max_length, dtype=dtype)

    def encode_dual(self, texts: Sequence[str]) -> Tuple[jax.Array, jax.Array]:
        emb_l, pool_l = self.clip_l.encode(texts)
        emb_g, pool_g = self.clip_g.encode(texts)
        clip_embeds = jnp.concatenate([emb_l, emb_g], axis=-1)
        t5_embeds, _ = self.t5.encode(texts)
        pad = t5_embeds.shape[-1] - clip_embeds.shape[-1]
        clip_embeds = jnp.pad(clip_embeds, ((0, 0), (0, 0), (0, pad)))
        prompt_embeds = jnp.concatenate([clip_embeds, t5_embeds], axis=-2)
        pooled = jnp.concatenate([pool_l, pool_g], axis=-1)
        return prompt_embeds, pooled


def pack_sd3_embeds(emb_l, pool_l, emb_g, pool_g, t5_embeds):
    """Pure packing math (testable offline): SD3 concat/pad layout
    (pipeline_vchitect.py:486-498)."""
    clip_embeds = jnp.concatenate([emb_l, emb_g], axis=-1)
    pad = t5_embeds.shape[-1] - clip_embeds.shape[-1]
    clip_embeds = jnp.pad(clip_embeds, ((0, 0), (0, 0), (0, pad)))
    return (jnp.concatenate([clip_embeds, t5_embeds], axis=-2),
            jnp.concatenate([pool_l, pool_g], axis=-1))
