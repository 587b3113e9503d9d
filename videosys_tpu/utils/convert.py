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


# --------------------------------------------------------------------------
# VAE converters (VERDICT r2 Next #4): reference torch VAE state dicts ->
# the TPU-native Flax pytrees. References:
# * Open-Sora: autoencoder_kl_open_sora.py:621-761 (VideoAutoencoderPipeline
#   = diffusers AutoencoderKL spatial + VAE_Temporal_SD)
# --------------------------------------------------------------------------

def groupnorm(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    """torch nn.GroupNorm -> GroupNormMXU {scale, bias}."""
    return {"scale": _np(sd[prefix + ".weight"]),
            "bias": _np(sd[prefix + ".bias"])}


def _cconv(sd: Mapping, prefix: str) -> Dict[str, dict]:
    """reference CausalConv3d (wraps .conv) -> flax CausalConv3d {conv}."""
    return {"conv": conv(sd, prefix + ".conv")}


def _res2d(sd: Mapping, prefix: str) -> dict:
    out = {"norm1": groupnorm(sd, prefix + ".norm1"),
           "conv1": conv(sd, prefix + ".conv1"),
           "norm2": groupnorm(sd, prefix + ".norm2"),
           "conv2": conv(sd, prefix + ".conv2")}
    if prefix + ".conv_shortcut.weight" in sd:
        out["conv_shortcut"] = conv(sd, prefix + ".conv_shortcut")
    return out


def _attn2d(sd: Mapping, prefix: str) -> dict:
    return {"group_norm": groupnorm(sd, prefix + ".group_norm"),
            "to_q": linear(sd, prefix + ".to_q"),
            "to_k": linear(sd, prefix + ".to_k"),
            "to_v": linear(sd, prefix + ".to_v"),
            "to_out": linear(sd, prefix + ".to_out.0")}


def _vae2d_coder(sd: Mapping, pre: str, n_blocks: int, decoder: bool) -> dict:
    """diffusers Encoder/Decoder -> vae2d.Encoder2D/Decoder2D params.
    Key layout: diffusers autoencoder_kl.py (down_blocks.{i}.resnets.{j},
    up_blocks.{i}.resnets.{j}, mid_block.{resnets,attentions})."""
    out = {"conv_in": conv(sd, pre + ".conv_in"),
           "conv_norm_out": groupnorm(sd, pre + ".conv_norm_out"),
           "conv_out": conv(sd, pre + ".conv_out"),
           "mid_res_0": _res2d(sd, pre + ".mid_block.resnets.0"),
           "mid_res_1": _res2d(sd, pre + ".mid_block.resnets.1")}
    if pre + ".mid_block.attentions.0.to_q.weight" in sd:
        out["mid_attn"] = _attn2d(sd, pre + ".mid_block.attentions.0")
    kind = "up" if decoder else "down"
    for i in range(n_blocks):
        j = 0
        while f"{pre}.{kind}_blocks.{i}.resnets.{j}.conv1.weight" in sd:
            out[f"{kind}_{i}_res_{j}"] = _res2d(
                sd, f"{pre}.{kind}_blocks.{i}.resnets.{j}")
            j += 1
        if f"{pre}.{kind}_blocks.{i}.downsamplers.0.conv.weight" in sd:
            out[f"down_{i}_downsample"] = conv(
                sd, f"{pre}.{kind}_blocks.{i}.downsamplers.0.conv")
        if f"{pre}.{kind}_blocks.{i}.upsamplers.0.conv.weight" in sd:
            out[f"up_{i}_upsample"] = conv(
                sd, f"{pre}.{kind}_blocks.{i}.upsamplers.0.conv")
    return out


def convert_vae2d(sd: Mapping, n_blocks: int = 4) -> dict:
    """diffusers AutoencoderKL state dict -> AutoencoderKL2D params."""
    return {"params": {
        "encoder": _vae2d_coder(sd, "encoder", n_blocks, decoder=False),
        "decoder": _vae2d_coder(sd, "decoder", n_blocks, decoder=True),
        "quant_conv": conv(sd, "quant_conv"),
        "post_quant_conv": conv(sd, "post_quant_conv"),
    }}


def _res3d(sd: Mapping, prefix: str) -> dict:
    out = {"norm1": groupnorm(sd, prefix + ".norm1"),
           "conv1": _cconv(sd, prefix + ".conv1"),
           "norm2": groupnorm(sd, prefix + ".norm2"),
           "conv2": _cconv(sd, prefix + ".conv2")}
    if prefix + ".conv3.conv.weight" in sd:
        out["conv3"] = _cconv(sd, prefix + ".conv3")
    return out


def convert_vae_temporal(sd: Mapping, n_blocks: int = 4,
                         num_res_blocks: int = 4) -> dict:
    """reference VAE_Temporal (autoencoder_kl_open_sora.py:379-485) state
    dict -> vae_temporal.VAETemporal params (MAGVIT encoder/decoder with
    causal convs; conv_blocks hold Identity for non-downsampling stages so
    only the strided entries carry keys)."""
    enc = {"conv_in": _cconv(sd, "encoder.conv_in"),
           "norm1": groupnorm(sd, "encoder.norm1"),
           "conv2": _cconv(sd, "encoder.conv2")}
    for i in range(n_blocks):
        for j in range(num_res_blocks):
            enc[f"block_{i}_res_{j}"] = _res3d(
                sd, f"encoder.block_res_blocks.{i}.{j}")
        if f"encoder.conv_blocks.{i}.conv.weight" in sd:
            enc[f"conv_down_{i}"] = _cconv(sd, f"encoder.conv_blocks.{i}")
    for j in range(num_res_blocks):
        enc[f"final_res_{j}"] = _res3d(sd, f"encoder.res_blocks.{j}")

    dec = {"conv1": _cconv(sd, "decoder.conv1"),
           "norm1": groupnorm(sd, "decoder.norm1"),
           "conv_out": _cconv(sd, "decoder.conv_out")}
    for j in range(num_res_blocks):
        dec[f"first_res_{j}"] = _res3d(sd, f"decoder.res_blocks.{j}")
    for i in range(n_blocks):
        for j in range(num_res_blocks):
            dec[f"block_{i}_res_{j}"] = _res3d(
                sd, f"decoder.block_res_blocks.{i}.{j}")
        if f"decoder.conv_blocks.{i}.conv.weight" in sd:
            dec[f"conv_up_{i}"] = _cconv(sd, f"decoder.conv_blocks.{i}")

    return {"params": {
        "encoder": enc, "decoder": dec,
        "quant_conv": _cconv(sd, "quant_conv"),
        "post_quant_conv": _cconv(sd, "post_quant_conv"),
    }}


def convert_open_sora_vae(sd: Mapping, n_spatial_blocks: int = 4) -> dict:
    """VideoAutoencoderPipeline state dict (spatial_vae.module.* +
    temporal_vae.*) -> OpenSoraVAE params {"spatial", "temporal"}."""
    spatial_sd = {k[len("spatial_vae.module."):]: v for k, v in sd.items()
                  if k.startswith("spatial_vae.module.")}
    temporal_sd = {k[len("temporal_vae."):]: v for k, v in sd.items()
                   if k.startswith("temporal_vae.")}
    return {"spatial": convert_vae2d(spatial_sd, n_spatial_blocks),
            "temporal": convert_vae_temporal(temporal_sd)}


def _cog_norm(sd: Mapping, prefix: str, spatial: bool) -> dict:
    if not spatial:
        return groupnorm(sd, prefix)
    return {"norm_layer": groupnorm(sd, prefix + ".norm_layer"),
            "conv_y": _cconv(sd, prefix + ".conv_y"),
            "conv_b": _cconv(sd, prefix + ".conv_b")}


def _cog_res(sd: Mapping, prefix: str, spatial: bool) -> dict:
    out = {"norm1": _cog_norm(sd, prefix + ".norm1", spatial),
           "conv1": _cconv(sd, prefix + ".conv1"),
           "norm2": _cog_norm(sd, prefix + ".norm2", spatial),
           "conv2": _cconv(sd, prefix + ".conv2")}
    if prefix + ".conv_shortcut.weight" in sd:  # SafeConv3d: plain Conv3d
        out["conv_shortcut"] = conv(sd, prefix + ".conv_shortcut")
    return out


def convert_cogvideox_vae(sd: Mapping, n_blocks: int = 4,
                          layers_per_block: int = 3) -> dict:
    """AutoencoderKLCogVideoX state dict (autoencoder_kl_cogvideox.py
    :872-1257) -> {"encoder", "decoder"} Flax params for
    autoencoder_cogvideox (encoder GroupNorms; decoder latent-conditioned
    SpatialNorm3D throughout; 2D convs in the up/down samplers)."""
    enc = {"conv_in": _cconv(sd, "encoder.conv_in"),
           "norm_out": groupnorm(sd, "encoder.norm_out"),
           "conv_out": _cconv(sd, "encoder.conv_out")}
    for i in range(n_blocks):
        for j in range(layers_per_block):
            enc[f"down_{i}_res_{j}"] = _cog_res(
                sd, f"encoder.down_blocks.{i}.resnets.{j}", False)
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            enc[f"down_{i}_downsample"] = {
                "conv": conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")}
    for j in range(2):
        enc[f"mid_res_{j}"] = _cog_res(
            sd, f"encoder.mid_block.resnets.{j}", False)

    dec = {"conv_in": _cconv(sd, "decoder.conv_in"),
           "norm_out": _cog_norm(sd, "decoder.norm_out", True),
           "conv_out": _cconv(sd, "decoder.conv_out")}
    for j in range(2):
        dec[f"mid_res_{j}"] = _cog_res(
            sd, f"decoder.mid_block.resnets.{j}", True)
    for i in range(n_blocks):
        for j in range(layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _cog_res(
                sd, f"decoder.up_blocks.{i}.resnets.{j}", True)
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            dec[f"up_{i}_upsample"] = {
                "conv": conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")}
    return {"encoder": {"params": enc}, "decoder": {"params": dec}}


def _causal_vae_op(sd: Mapping, prefix: str, op: str) -> dict:
    """One registry op (autoencoder_causal_vae.VAE_OPS) from its reference
    torch keys (v110 op classes :868-1600 / v120 :35-470)."""
    if op == "CausalConv3d":
        return {"conv": conv(sd, prefix + ".conv")}
    if op in ("SpatialDownsample2x", "SpatialUpsample2x",
              "Spatial2xTime2x3DDownsample", "Spatial2xTime2x3DUpsample"):
        # reference wraps a CausalConv3d in `.conv`; the flax op holds a
        # plain/causal conv submodule also named `conv`
        inner = {"conv": conv(sd, prefix + ".conv.conv")}
        if op in ("Spatial2xTime2x3DDownsample", "Spatial2xTime2x3DUpsample"):
            return {"conv": inner}
        return inner
    if op in ("Conv2d",):
        return {"conv": conv(sd, prefix)}
    if op == "Downsample":
        return {"conv": conv(sd, prefix + ".conv")}
    if op in ("ResnetBlock3D", "ResnetBlock2D"):
        causal = op == "ResnetBlock3D"

        def c(name):
            return ({"conv": conv(sd, f"{prefix}.{name}.conv")} if causal
                    else {"conv": conv(sd, f"{prefix}.{name}")})

        out = {"norm1": groupnorm(sd, prefix + ".norm1"), "conv1": c("conv1"),
               "norm2": groupnorm(sd, prefix + ".norm2"), "conv2": c("conv2")}
        if (f"{prefix}.nin_shortcut.conv.weight" in sd
                or f"{prefix}.nin_shortcut.weight" in sd):
            out["nin_shortcut"] = c("nin_shortcut")
        return out
    if op in ("AttnBlock", "AttnBlock3D", "AttnBlock3DFix"):
        return {"norm": groupnorm(sd, prefix + ".norm"),
                **{k: {"conv": conv(sd, f"{prefix}.{k}.conv")}
                   for k in ("q", "k", "v", "proj_out")}}
    if op == "TimeDownsampleRes2x":
        return {"mix_factor": _np(sd[prefix + ".mix_factor"]),
                "conv": conv(sd, prefix + ".conv")}
    if op == "TimeUpsampleRes2x":
        return {"mix_factor": _np(sd[prefix + ".mix_factor"]),
                "conv": {"conv": conv(sd, prefix + ".conv.conv")}}
    if op in ("TimeDownsample2x", "TimeUpsample2x"):
        return {}  # parameter-free (avg-pool / interpolation)
    raise KeyError(f"no conversion rule for op {op!r}")


def convert_causal_vae(sd: Mapping, config) -> dict:
    """OSP CausalVAEModel state dict (v110 :357-798 / v120 :741-1110) ->
    autoencoder_causal_vae.CausalVAEModule params, driven by the same
    registry config the flax model was built from."""
    cfg = config
    n = len(cfg.hidden_size_mult)

    enc = {"conv_in": _causal_vae_op(sd, "encoder.conv_in", cfg.encoder_conv_in),
           "conv_out": _causal_vae_op(sd, "encoder.conv_out", cfg.encoder_conv_out),
           "norm_out": groupnorm(sd, "encoder.norm_out"),
           "mid_block1": _causal_vae_op(sd, "encoder.mid.block_1", cfg.encoder_mid_resnet),
           "mid_block2": _causal_vae_op(sd, "encoder.mid.block_2", cfg.encoder_mid_resnet),
           "mid_attn": _causal_vae_op(sd, "encoder.mid.attn_1", cfg.encoder_attention)}
    for i in range(n):
        for j in range(cfg.num_res_blocks):
            enc[f"down{i}_block{j}"] = _causal_vae_op(
                sd, f"encoder.down.{i}.block.{j}", cfg.encoder_resnet_blocks[i])
        if cfg.encoder_spatial_downsample[i]:
            enc[f"down{i}_downsample"] = _causal_vae_op(
                sd, f"encoder.down.{i}.downsample", cfg.encoder_spatial_downsample[i])
        if cfg.encoder_temporal_downsample[i]:
            t = _causal_vae_op(sd, f"encoder.down.{i}.time_downsample",
                               cfg.encoder_temporal_downsample[i])
            if t:
                enc[f"down{i}_time_downsample"] = t

    dec = {"conv_in": _causal_vae_op(sd, "decoder.conv_in", cfg.decoder_conv_in),
           "conv_out": _causal_vae_op(sd, "decoder.conv_out", cfg.decoder_conv_out),
           "norm_out": groupnorm(sd, "decoder.norm_out"),
           "mid_block1": _causal_vae_op(sd, "decoder.mid.block_1", cfg.decoder_mid_resnet),
           "mid_block2": _causal_vae_op(sd, "decoder.mid.block_2", cfg.decoder_mid_resnet),
           "mid_attn": _causal_vae_op(sd, "decoder.mid.attn_1", cfg.decoder_attention)}
    for i in range(n):
        for j in range(cfg.num_res_blocks + 1):
            dec[f"up{i}_block{j}"] = _causal_vae_op(
                sd, f"decoder.up.{i}.block.{j}", cfg.decoder_resnet_blocks[i])
        if cfg.decoder_spatial_upsample[i]:
            dec[f"up{i}_upsample"] = _causal_vae_op(
                sd, f"decoder.up.{i}.upsample", cfg.decoder_spatial_upsample[i])
        if cfg.decoder_temporal_upsample[i]:
            t = _causal_vae_op(sd, f"decoder.up.{i}.time_upsample",
                               cfg.decoder_temporal_upsample[i])
            if t:
                dec[f"up{i}_time_upsample"] = t

    params = {"encoder": enc, "decoder": dec}
    if cfg.use_quant_layer:
        params["quant_conv"] = _causal_vae_op(sd, "quant_conv", "CausalConv3d")
        params["post_quant_conv"] = _causal_vae_op(sd, "post_quant_conv",
                                                   "CausalConv3d")
    return {"params": params}
