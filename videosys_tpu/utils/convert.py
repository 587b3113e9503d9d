"""Checkpoint conversion: reference torch state dicts -> Flax param pytrees.

The released checkpoints (hpcai-tech/OpenSora-STDiT-v3 etc.) are torch
`state_dict`s keyed by the reference's module attribute names
(`videosys/models/transformers/open_sora_transformer_3d.py:393-445`:
x_embedder/t_embedder/fps_embedder/t_block/y_embedder/spatial_blocks.N/
temporal_blocks.N/final_layer). This module maps them onto the TPU-native
module trees, handling:

* torch Linear [out, in] -> flax Dense kernel [in, out];
* torch ConvNd [O, I, *K] -> flax Conv kernel [*K, I, O];
* per-layer keys -> stacked leading-depth axes (the models scan blocks).

Inputs may be torch tensors or numpy arrays (anything `np.asarray` accepts
after an optional `.detach().cpu().numpy()`).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def linear(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.Linear -> {kernel, bias}."""
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def conv(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    """torch ConvNd [O, I, *K] -> flax [*K, I, O]."""
    w = _np(sd[prefix + ".weight"])
    nd = w.ndim
    perm = tuple(range(2, nd)) + (1, 0)
    out = {"kernel": w.transpose(perm)}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def rms_weight(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {"weight": _np(sd[prefix + ".weight"])}


def stack(trees):
    """Stack identical {name: array} trees along a new leading (depth) axis."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


def _mlp(sd, prefix):
    return {"fc1": linear(sd, prefix + ".fc1"), "fc2": linear(sd, prefix + ".fc2")}


def _sequential_mlp(sd, prefix):
    """TimestepEmbedder/SizeEmbedder: Sequential(Linear, SiLU, Linear) ->
    {mlp_0, mlp_2}."""
    return {"mlp_0": linear(sd, prefix + ".mlp.0"),
            "mlp_2": linear(sd, prefix + ".mlp.2")}


def _stdit3_block(sd, prefix):
    return {
        "scale_shift_table": _np(sd[prefix + ".scale_shift_table"]),
        "attn": {
            "qkv": linear(sd, prefix + ".attn.qkv"),
            "proj": linear(sd, prefix + ".attn.proj"),
            "q_norm": rms_weight(sd, prefix + ".attn.q_norm"),
            "k_norm": rms_weight(sd, prefix + ".attn.k_norm"),
        },
        "cross_attn": {
            "q_linear": linear(sd, prefix + ".cross_attn.q_linear"),
            "kv_linear": linear(sd, prefix + ".cross_attn.kv_linear"),
            "proj": linear(sd, prefix + ".cross_attn.proj"),
        },
        "mlp": _mlp(sd, prefix + ".mlp"),
    }


def convert_stdit3(sd: Mapping, depth: int = 28) -> dict:
    """Open-Sora v1.2 STDiT3 state dict -> {"params": ...} for
    `videosys_tpu.models.transformers.stdit3.STDiT3` (qkv row order q,k,v and
    kv row order k,v match between the frameworks, attentions.py:42-46,145)."""
    params = {
        "x_embedder": {"proj": conv(sd, "x_embedder.proj")},
        "t_embedder": _sequential_mlp(sd, "t_embedder"),
        "fps_embedder": _sequential_mlp(sd, "fps_embedder"),
        # t_block = Sequential(SiLU(), Linear) (:396-398)
        "t_block": linear(sd, "t_block.1"),
        "y_embedder": {
            "y_embedding": _np(sd["y_embedder.y_embedding"]),
            "y_proj": _mlp(sd, "y_embedder.y_proj"),
        },
        "final_linear": linear(sd, "final_layer.linear"),
        "final_scale_shift_table": _np(sd["final_layer.scale_shift_table"]),
        "blocks": {
            "spatial": stack([_stdit3_block(sd, f"spatial_blocks.{i}")
                              for i in range(depth)]),
            "temporal": stack([_stdit3_block(sd, f"temporal_blocks.{i}")
                               for i in range(depth)]),
        },
    }
    return {"params": params}


def convert_t5_shared_embedding(sd: Mapping) -> np.ndarray:
    """T5 token embedding (the only piece the text encoder wrapper needs when
    transformers loads flax weights natively)."""
    return _np(sd["shared.weight"])
