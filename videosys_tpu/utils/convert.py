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


def _ln(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    """torch affine LayerNorm -> flax {scale, bias}."""
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _concat_linears(sd: Mapping, prefixes) -> Dict[str, np.ndarray]:
    """Fuse separate torch Linears into one flax Dense (rows concatenated on
    the output dim — matches the reshape-split order in the TPU modules)."""
    ks = [_np(sd[p + ".weight"]).T for p in prefixes]
    out = {"kernel": np.concatenate(ks, axis=-1)}
    if prefixes[0] + ".bias" in sd:
        out["bias"] = np.concatenate([_np(sd[p + ".bias"]) for p in prefixes])
    return out


def _cog_block(sd, prefix):
    return {
        "norm1": {"linear": linear(sd, prefix + ".norm1.linear"),
                  "norm": _ln(sd, prefix + ".norm1.norm")},
        "norm2": {"linear": linear(sd, prefix + ".norm2.linear"),
                  "norm": _ln(sd, prefix + ".norm2.norm")},
        "attn1": {
            "to_q": linear(sd, prefix + ".attn1.to_q"),
            "to_k": linear(sd, prefix + ".attn1.to_k"),
            "to_v": linear(sd, prefix + ".attn1.to_v"),
            "to_out": linear(sd, prefix + ".attn1.to_out.0"),
            "norm_q": _ln(sd, prefix + ".attn1.norm_q"),
            "norm_k": _ln(sd, prefix + ".attn1.norm_k"),
        },
        "ff_in": linear(sd, prefix + ".ff.net.0.proj"),
        "ff_out": linear(sd, prefix + ".ff.net.2"),
    }


def convert_cogvideox(sd: Mapping, depth: int = 30) -> dict:
    """CogVideoX transformer state dict (THUDM/CogVideoX-2b/5b layout,
    `videosys/models/transformers/cogvideox_transformer_3d.py:404-455`) ->
    Flax params for CogVideoXTransformer3D."""
    params = {
        "patch_proj": conv(sd, "patch_embed.proj"),
        "text_proj": linear(sd, "patch_embed.text_proj"),
        "time_embedding": {
            "mlp_0": linear(sd, "time_embedding.linear_1"),
            "mlp_2": linear(sd, "time_embedding.linear_2"),
        },
        "norm_final": _ln(sd, "norm_final"),
        "norm_out_linear": linear(sd, "norm_out.linear"),
        "norm_out_norm": _ln(sd, "norm_out.norm"),
        "proj_out": linear(sd, "proj_out"),
        "blocks": {"block": stack([
            _cog_block(sd, f"transformer_blocks.{i}") for i in range(depth)])},
    }
    return {"params": params}


def _latte_spatial_block(sd, prefix):
    return {
        "scale_shift_table": _np(sd[prefix + ".scale_shift_table"]),
        "attn1": {
            "qkv": _concat_linears(sd, [prefix + ".attn1.to_q",
                                        prefix + ".attn1.to_k",
                                        prefix + ".attn1.to_v"]),
            "proj": linear(sd, prefix + ".attn1.to_out.0"),
        },
        "attn2": {
            "q_linear": linear(sd, prefix + ".attn2.to_q"),
            "kv_linear": _concat_linears(sd, [prefix + ".attn2.to_k",
                                              prefix + ".attn2.to_v"]),
            "proj": linear(sd, prefix + ".attn2.to_out.0"),
        },
        "ff": {"proj_in": linear(sd, prefix + ".ff.net.0.proj"),
               "proj_out": linear(sd, prefix + ".ff.net.2")},
    }


def _latte_temporal_block(sd, prefix):
    return {
        "scale_shift_table": _np(sd[prefix + ".scale_shift_table"]),
        "attn1": {
            "qkv": _concat_linears(sd, [prefix + ".attn1.to_q",
                                        prefix + ".attn1.to_k",
                                        prefix + ".attn1.to_v"]),
            "proj": linear(sd, prefix + ".attn1.to_out.0"),
        },
        "ff": {"proj_in": linear(sd, prefix + ".ff.net.0.proj"),
               "proj_out": linear(sd, prefix + ".ff.net.2")},
    }


def convert_latte(sd: Mapping, depth: int = 28) -> dict:
    """LatteT2V state dict (maxin-cn/Latte-1 layout,
    `videosys/models/transformers/latte_transformer_3d.py:895-1058`; also the
    Open-Sora-Plan v1.1 LatteT2V variant) -> Flax params for
    videosys_tpu LatteT2V. Separate to_q/k/v fuse into the qkv kernel;
    to_k/to_v fuse into kv_linear (split order matches blocks.py)."""
    params = {
        "pos_embed_proj": conv(sd, "pos_embed.proj"),
        "adaln_single_emb": {
            "mlp_0": linear(sd, "adaln_single.emb.timestep_embedder.linear_1"),
            "mlp_2": linear(sd, "adaln_single.emb.timestep_embedder.linear_2"),
        },
        "adaln_single_linear": linear(sd, "adaln_single.linear"),
        "caption_projection": {
            "fc1": linear(sd, "caption_projection.linear_1"),
            "fc2": linear(sd, "caption_projection.linear_2"),
        },
        "final_scale_shift_table": _np(sd["scale_shift_table"]),
        "proj_out": linear(sd, "proj_out"),
        "blocks": {
            "spatial": stack([_latte_spatial_block(
                sd, f"transformer_blocks.{i}") for i in range(depth)]),
            "temporal": stack([_latte_temporal_block(
                sd, f"temporal_transformer_blocks.{i}") for i in range(depth)]),
        },
    }
    return {"params": params}


def _osp_v120_block(sd, prefix):
    block = {
        "scale_shift_table": _np(sd[prefix + ".scale_shift_table"]),
        "ff_in": linear(sd, prefix + ".ff.net.0.proj"),
        "ff_out": linear(sd, prefix + ".ff.net.2"),
    }
    for attn in ("attn1", "attn2"):
        block[attn] = {
            "to_q": linear(sd, f"{prefix}.{attn}.to_q"),
            "to_k": linear(sd, f"{prefix}.{attn}.to_k"),
            "to_v": linear(sd, f"{prefix}.{attn}.to_v"),
            "to_out": linear(sd, f"{prefix}.{attn}.to_out.0"),
        }
    return block


def convert_osp_v120(sd: Mapping, depth: int = 32) -> dict:
    """Open-Sora-Plan v1.2 OpenSoraT2V state dict
    (LanguageBind/Open-Sora-Plan-v1.2.0 subfolders,
    `videosys/models/transformers/open_sora_plan_v120_transformer_3d.py:
    1464-1714`) -> Flax params for OpenSoraPlanV120Transformer.
    v1.1 checkpoints use the LatteT2V layout — use `convert_latte`."""
    params = {
        "patch_proj": conv(sd, "pos_embed.proj"),
        "adaln_single": {
            "emb": {
                "mlp_0": linear(sd, "adaln_single.emb.timestep_embedder.linear_1"),
                "mlp_2": linear(sd, "adaln_single.emb.timestep_embedder.linear_2"),
            },
            "linear": linear(sd, "adaln_single.linear"),
        },
        "caption_in": linear(sd, "caption_projection.linear_1"),
        "caption_out": linear(sd, "caption_projection.linear_2"),
        "scale_shift_table": _np(sd["scale_shift_table"]),
        "proj_out": linear(sd, "proj_out"),
        "blocks": {"block": stack([
            _osp_v120_block(sd, f"transformer_blocks.{i}")
            for i in range(depth)])},
    }
    return {"params": params}


def _vchitect_attn(sd, prefix, context_pre_only: bool):
    names = ["to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj",
             "to_q_temp", "to_k_temp", "to_v_temp", "to_q_cross",
             "to_out_temporal", "to_out_context", "to_add_out_temporal"]
    out = {n: linear(sd, f"{prefix}.{n}") for n in names}
    out["to_out"] = linear(sd, prefix + ".to_out.0")  # ModuleList [Linear, Dropout]
    if not context_pre_only:
        out["to_add_out"] = linear(sd, prefix + ".to_add_out")
    return out


def _vchitect_block(sd, prefix, context_pre_only: bool):
    block = {
        "norm1": {"linear": linear(sd, prefix + ".norm1.linear")},
        "attn": _vchitect_attn(sd, prefix + ".attn", context_pre_only),
        "ff_in": linear(sd, prefix + ".ff.net.0.proj"),
        "ff_out": linear(sd, prefix + ".ff.net.2"),
    }
    if context_pre_only:
        block["norm1_context_linear"] = linear(sd, prefix + ".norm1_context.linear")
    else:
        block["norm1_context"] = {
            "linear": linear(sd, prefix + ".norm1_context.linear")}
        block["ff_context_in"] = linear(sd, prefix + ".ff_context.net.0.proj")
        block["ff_context_out"] = linear(sd, prefix + ".ff_context.net.2")
    return block


def convert_vchitect(sd: Mapping, depth: int = 18) -> dict:
    """Vchitect-XL state dict (Vchitect/Vchitect-2.0-2B layout,
    `videosys/models/transformers/vchitect_transformer_3d.py:261-324` +
    `videosys/models/modules/attentions.py:423-638`) -> Flax params for
    VchitectXLTransformer. The last layer is context_pre_only (:302) and maps
    to the dedicated final_block."""
    params = {
        "patch_proj": conv(sd, "pos_embed.proj"),
        "time_embed": {
            "mlp_0": linear(sd, "time_text_embed.timestep_embedder.linear_1"),
            "mlp_2": linear(sd, "time_text_embed.timestep_embedder.linear_2"),
        },
        "pooled_in": linear(sd, "time_text_embed.text_embedder.linear_1"),
        "pooled_out": linear(sd, "time_text_embed.text_embedder.linear_2"),
        "context_embedder": linear(sd, "context_embedder"),
        "norm_out_linear": linear(sd, "norm_out.linear"),
        "proj_out": linear(sd, "proj_out"),
        "blocks": {"block": stack([
            _vchitect_block(sd, f"transformer_blocks.{i}", False)
            for i in range(depth - 1)])},
        "final_block": _vchitect_block(
            sd, f"transformer_blocks.{depth - 1}", True),
    }
    return {"params": params}
