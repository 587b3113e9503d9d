"""Faithful mini-stub of the diffusers==0.30.0 pieces the reference models
import (the image has no diffusers wheel). Only the code paths the
reference's released configs exercise are implemented — with the exact
numerics of the pinned version — so converted-weights parity tests compare
against true reference behavior.

Registered into sys.modules by tests/ref_torch.install_stubs().
"""

from __future__ import annotations

import math
import types

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


# --------------------------------------------------------------------------- #
# configuration_utils / modeling_utils
# --------------------------------------------------------------------------- #
class _FrozenConfig(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def register_to_config(init):
    import functools
    import inspect

    @functools.wraps(init)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items()
               if k not in ("self",) and not k.startswith("_")}
        self._internal_dict = _FrozenConfig(cfg)
        init(self, *args, **kwargs)

    return wrapper


class ConfigMixin:
    @property
    def config(self):
        return self._internal_dict


class ModelMixin(nn.Module):
    def __init__(self):
        super().__init__()
        self.gradient_checkpointing = False

    @property
    def dtype(self):
        return next(self.parameters()).dtype

    @property
    def device(self):
        return next(self.parameters()).device


# --------------------------------------------------------------------------- #
# utils
# --------------------------------------------------------------------------- #
USE_PEFT_BACKEND = False


def deprecate(*args, **kwargs):
    return None


def is_torch_version(op, version):
    return True  # torch here is newer than any pinned floor the refs check


def maybe_allow_in_graph(cls):
    return cls


class BaseOutput(dict):
    """Minimal diffusers BaseOutput: attribute + index access."""

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)

    def __init__(self, *args, **kwargs):
        import dataclasses

        if dataclasses.is_dataclass(self):
            return  # dataclass __init__ handles fields
        super().__init__(*args, **kwargs)

    def __post_init__(self):
        import dataclasses

        for f in dataclasses.fields(self):
            self[f.name] = getattr(self, f.name)

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __getitem__(self, k):
        if isinstance(k, int):
            return list(self.values())[k]
        return super().__getitem__(k)


# --------------------------------------------------------------------------- #
# activations (models/activations.py @0.30.0)
# --------------------------------------------------------------------------- #
class GELU(nn.Module):
    def __init__(self, dim_in, dim_out, approximate="none", bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)
        self.approximate = approximate

    def forward(self, hidden_states, *a):
        return F.gelu(self.proj(hidden_states), approximate=self.approximate)


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out, bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2, bias=bias)

    def forward(self, hidden_states, *a):
        hidden_states, gate = self.proj(hidden_states).chunk(2, dim=-1)
        return hidden_states * F.gelu(gate)


class ApproximateGELU(nn.Module):
    def __init__(self, dim_in, dim_out, bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)

    def forward(self, x):
        x = self.proj(x)
        return x * torch.sigmoid(1.702 * x)


# --------------------------------------------------------------------------- #
# attention_processor.Attention (@0.30.0, AttnProcessor2_0 path)
# --------------------------------------------------------------------------- #
class Attention(nn.Module):
    def __init__(
        self,
        query_dim,
        cross_attention_dim=None,
        heads=8,
        kv_heads=None,
        dim_head=64,
        dropout=0.0,
        bias=False,
        upcast_attention=False,
        upcast_softmax=False,
        cross_attention_norm=None,
        cross_attention_norm_num_groups=32,
        qk_norm=None,
        added_kv_proj_dim=None,
        added_proj_bias=True,
        norm_num_groups=None,
        spatial_norm_dim=None,
        out_bias=True,
        scale_qk=True,
        only_cross_attention=False,
        eps=1e-5,
        rescale_output_factor=1.0,
        residual_connection=False,
        _from_deprecated_attn_block=False,
        processor=None,
        out_dim=None,
        context_pre_only=None,
        pre_only=False,
    ):
        super().__init__()
        self.inner_dim = out_dim if out_dim is not None else dim_head * heads
        self.query_dim = query_dim
        self.use_bias = bias
        self.cross_attention_dim = (cross_attention_dim
                                    if cross_attention_dim is not None
                                    else query_dim)
        self.upcast_attention = upcast_attention
        self.upcast_softmax = upcast_softmax
        self.rescale_output_factor = rescale_output_factor
        self.residual_connection = residual_connection
        self.dropout = dropout
        self.out_dim = out_dim if out_dim is not None else query_dim
        self.scale_qk = scale_qk
        self.scale = dim_head**-0.5 if scale_qk else 1.0
        self.heads = out_dim // dim_head if out_dim is not None else heads
        self.added_kv_proj_dim = added_kv_proj_dim
        self.only_cross_attention = only_cross_attention
        self.group_norm = None
        self.spatial_norm = None
        self.norm_cross = None

        if qk_norm is None:
            self.norm_q = None
            self.norm_k = None
        elif qk_norm == "layer_norm":
            self.norm_q = nn.LayerNorm(dim_head, eps=eps)
            self.norm_k = nn.LayerNorm(dim_head, eps=eps)
        else:
            raise NotImplementedError(qk_norm)

        self.to_q = nn.Linear(query_dim, self.inner_dim, bias=bias)
        if not only_cross_attention:
            self.to_k = nn.Linear(self.cross_attention_dim, self.inner_dim, bias=bias)
            self.to_v = nn.Linear(self.cross_attention_dim, self.inner_dim, bias=bias)
        if added_kv_proj_dim is not None:
            self.add_k_proj = nn.Linear(added_kv_proj_dim, self.inner_dim,
                                        bias=added_proj_bias)
            self.add_v_proj = nn.Linear(added_kv_proj_dim, self.inner_dim,
                                        bias=added_proj_bias)
        self.to_out = nn.ModuleList(
            [nn.Linear(self.inner_dim, self.out_dim, bias=out_bias),
             nn.Dropout(dropout)])
        self.processor = processor if processor is not None else AttnProcessor2_0()

    def set_processor(self, processor):
        self.processor = processor

    @property
    def is_cross_attention(self):
        return self.cross_attention_dim != self.query_dim

    def prepare_attention_mask(self, attention_mask, target_length,
                               batch_size, out_dim=3):
        head_size = self.heads
        if attention_mask is None:
            return attention_mask
        current_length = attention_mask.shape[-1]
        if current_length != target_length:
            attention_mask = F.pad(attention_mask, (0, target_length - current_length),
                                   value=0.0)
        if out_dim == 3:
            if attention_mask.shape[0] < batch_size * head_size:
                attention_mask = attention_mask.repeat_interleave(head_size, dim=0)
        elif out_dim == 4:
            attention_mask = attention_mask.unsqueeze(1)
            attention_mask = attention_mask.repeat_interleave(head_size, dim=1)
        return attention_mask

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **cross_attention_kwargs):
        return self.processor(self, hidden_states,
                              encoder_hidden_states=encoder_hidden_states,
                              attention_mask=attention_mask,
                              **cross_attention_kwargs)


class AttnProcessor2_0:
    def __call__(self, attn: Attention, hidden_states,
                 encoder_hidden_states=None, attention_mask=None,
                 temb=None, *args, **kwargs):
        residual = hidden_states
        input_ndim = hidden_states.ndim
        if input_ndim == 4:
            batch_size, channel, height, width = hidden_states.shape
            hidden_states = hidden_states.view(
                batch_size, channel, height * width).transpose(1, 2)

        batch_size, sequence_length, _ = (
            hidden_states.shape if encoder_hidden_states is None
            else encoder_hidden_states.shape)
        if attention_mask is not None:
            attention_mask = attn.prepare_attention_mask(
                attention_mask, sequence_length, batch_size)
            attention_mask = attention_mask.view(
                batch_size, attn.heads, -1, attention_mask.shape[-1])

        query = attn.to_q(hidden_states)
        if encoder_hidden_states is None:
            encoder_hidden_states = hidden_states
        key = attn.to_k(encoder_hidden_states)
        value = attn.to_v(encoder_hidden_states)

        inner_dim = key.shape[-1]
        head_dim = inner_dim // attn.heads
        query = query.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        key = key.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        value = value.view(batch_size, -1, attn.heads, head_dim).transpose(1, 2)
        if attn.norm_q is not None:
            query = attn.norm_q(query)
        if attn.norm_k is not None:
            key = attn.norm_k(key)

        hidden_states = F.scaled_dot_product_attention(
            query, key, value, attn_mask=attention_mask,
            dropout_p=0.0, is_causal=False)
        hidden_states = hidden_states.transpose(1, 2).reshape(
            batch_size, -1, attn.heads * head_dim).to(query.dtype)
        hidden_states = attn.to_out[0](hidden_states)
        hidden_states = attn.to_out[1](hidden_states)

        if input_ndim == 4:
            hidden_states = hidden_states.transpose(-1, -2).reshape(
                batch_size, channel, height, width)
        if attn.residual_connection:
            hidden_states = hidden_states + residual
        return hidden_states / attn.rescale_output_factor


AttnProcessor = AttnProcessor2_0


# --------------------------------------------------------------------------- #
# models/attention.py FeedForward (@0.30.0)
# --------------------------------------------------------------------------- #
class FeedForward(nn.Module):
    def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                 activation_fn="geglu", final_dropout=False, inner_dim=None,
                 bias=True):
        super().__init__()
        if inner_dim is None:
            inner_dim = int(dim * mult)
        dim_out = dim_out if dim_out is not None else dim
        if activation_fn == "gelu":
            act_fn = GELU(dim, inner_dim, bias=bias)
        elif activation_fn == "gelu-approximate":
            act_fn = GELU(dim, inner_dim, approximate="tanh", bias=bias)
        elif activation_fn == "geglu":
            act_fn = GEGLU(dim, inner_dim, bias=bias)
        elif activation_fn == "geglu-approximate":
            act_fn = ApproximateGELU(dim, inner_dim, bias=bias)
        else:
            raise NotImplementedError(activation_fn)
        self.net = nn.ModuleList([act_fn, nn.Dropout(dropout),
                                  nn.Linear(inner_dim, dim_out, bias=bias)])
        if final_dropout:
            self.net.append(nn.Dropout(dropout))

    def forward(self, hidden_states, *args, **kwargs):
        for module in self.net:
            hidden_states = module(hidden_states)
        return hidden_states


# --------------------------------------------------------------------------- #
# embeddings (@0.30.0)
# --------------------------------------------------------------------------- #
def get_timestep_embedding(timesteps, embedding_dim, flip_sin_to_cos=False,
                           downscale_freq_shift=1, scale=1, max_period=10000):
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(
        0, half_dim, dtype=torch.float32, device=timesteps.device)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = scale * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    if embedding_dim % 2 == 1:
        emb = F.pad(emb, (0, 1, 0, 0))
    return emb


class Timesteps(nn.Module):
    def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift,
                 scale=1):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift
        self.scale = scale

    def forward(self, timesteps):
        return get_timestep_embedding(
            timesteps, self.num_channels,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift, scale=self.scale)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels, time_embed_dim, act_fn="silu",
                 out_dim=None, post_act_fn=None, cond_proj_dim=None,
                 sample_proj_bias=True):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim, sample_proj_bias)
        self.act = nn.SiLU()
        self.linear_2 = nn.Linear(time_embed_dim,
                                  out_dim or time_embed_dim, sample_proj_bias)

    def forward(self, sample, condition=None):
        return self.linear_2(self.act(self.linear_1(sample)))


def get_1d_sincos_pos_embed_from_grid(embed_dim, pos):
    if embed_dim % 2 != 0:
        raise ValueError("embed_dim must be divisible by 2")
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    pos = pos.reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed_from_grid(embed_dim, grid):
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def get_2d_sincos_pos_embed(embed_dim, grid_size, cls_token=False,
                            extra_tokens=0, interpolation_scale=1.0,
                            base_size=16):
    if isinstance(grid_size, int):
        grid_size = (grid_size, grid_size)
    grid_h = (np.arange(grid_size[0], dtype=np.float32)
              / (grid_size[0] / base_size) / interpolation_scale)
    grid_w = (np.arange(grid_size[1], dtype=np.float32)
              / (grid_size[1] / base_size) / interpolation_scale)
    grid = np.meshgrid(grid_w, grid_h)
    grid = np.stack(grid, axis=0)
    grid = grid.reshape([2, 1, grid_size[1], grid_size[0]])
    pos_embed = get_2d_sincos_pos_embed_from_grid(embed_dim, grid)
    if cls_token and extra_tokens > 0:
        pos_embed = np.concatenate(
            [np.zeros([extra_tokens, embed_dim]), pos_embed], axis=0)
    return pos_embed


def get_3d_sincos_pos_embed(embed_dim, spatial_size, temporal_size,
                            spatial_interpolation_scale=1.0,
                            temporal_interpolation_scale=1.0):
    if embed_dim % 4 != 0:
        raise ValueError("embed_dim must be divisible by 4")
    if isinstance(spatial_size, int):
        spatial_size = (spatial_size, spatial_size)
    embed_dim_spatial = 3 * embed_dim // 4
    embed_dim_temporal = embed_dim // 4
    grid_h = np.arange(spatial_size[1], dtype=np.float32) / spatial_interpolation_scale
    grid_w = np.arange(spatial_size[0], dtype=np.float32) / spatial_interpolation_scale
    grid = np.meshgrid(grid_w, grid_h)
    grid = np.stack(grid, axis=0)
    grid = grid.reshape([2, 1, spatial_size[1], spatial_size[0]])
    pos_embed_spatial = get_2d_sincos_pos_embed_from_grid(embed_dim_spatial, grid)
    grid_t = np.arange(temporal_size, dtype=np.float32) / temporal_interpolation_scale
    pos_embed_temporal = get_1d_sincos_pos_embed_from_grid(embed_dim_temporal, grid_t)
    pos_embed_spatial = pos_embed_spatial[np.newaxis, :, :]
    pos_embed_spatial = np.repeat(pos_embed_spatial, temporal_size, axis=0)
    pos_embed_temporal = pos_embed_temporal[:, np.newaxis, :]
    pos_embed_temporal = np.repeat(
        pos_embed_temporal, spatial_size[0] * spatial_size[1], axis=1)
    return np.concatenate([pos_embed_temporal, pos_embed_spatial], axis=-1)


class PatchEmbed(nn.Module):
    def __init__(self, height=224, width=224, patch_size=16, in_channels=3,
                 embed_dim=768, layer_norm=False, flatten=True, bias=True,
                 interpolation_scale=1, pos_embed_type="sincos",
                 pos_embed_max_size=None):
        super().__init__()
        num_patches = (height // patch_size) * (width // patch_size)
        self.flatten = flatten
        self.layer_norm = layer_norm
        self.pos_embed_max_size = pos_embed_max_size
        self.proj = nn.Conv2d(in_channels, embed_dim, kernel_size=(patch_size, patch_size),
                              stride=patch_size, bias=bias)
        if layer_norm:
            self.norm = nn.LayerNorm(embed_dim, elementwise_affine=False, eps=1e-6)
        else:
            self.norm = None
        self.patch_size = patch_size
        self.height, self.width = height // patch_size, width // patch_size
        self.base_size = height // patch_size
        self.interpolation_scale = interpolation_scale
        if pos_embed_max_size:
            grid_size = pos_embed_max_size
        else:
            grid_size = int(num_patches**0.5)
        if pos_embed_type is None:
            self.pos_embed = None
        elif pos_embed_type == "sincos":
            pos_embed = get_2d_sincos_pos_embed(
                embed_dim, grid_size, base_size=self.base_size,
                interpolation_scale=self.interpolation_scale)
            self.register_buffer("pos_embed",
                                 torch.from_numpy(pos_embed).float().unsqueeze(0),
                                 persistent=True)
        else:
            raise NotImplementedError(pos_embed_type)

    def cropped_pos_embed(self, height, width):
        height = height // self.patch_size
        width = width // self.patch_size
        top = (self.pos_embed_max_size - height) // 2
        left = (self.pos_embed_max_size - width) // 2
        spatial_pos_embed = self.pos_embed.reshape(
            1, self.pos_embed_max_size, self.pos_embed_max_size, -1)
        spatial_pos_embed = spatial_pos_embed[:, top:top + height,
                                              left:left + width, :]
        return spatial_pos_embed.reshape(1, -1, spatial_pos_embed.shape[-1])

    def forward(self, latent):
        if self.pos_embed_max_size is not None:
            height, width = latent.shape[-2:]
        else:
            height = latent.shape[-2] // self.patch_size
            width = latent.shape[-1] // self.patch_size
        latent = self.proj(latent)
        if self.flatten:
            latent = latent.flatten(2).transpose(1, 2)
        if self.layer_norm:
            latent = self.norm(latent)
        if self.pos_embed is None:
            return latent.to(latent.dtype)
        if self.pos_embed_max_size:
            pos_embed = self.cropped_pos_embed(height, width)
            return (latent + pos_embed.to(latent.device)).to(latent.dtype)
        if self.height != height or self.width != width:
            pos_embed = get_2d_sincos_pos_embed(
                embed_dim=self.pos_embed.shape[-1], grid_size=(height, width),
                base_size=self.base_size,
                interpolation_scale=self.interpolation_scale)
            pos_embed = torch.from_numpy(pos_embed).float().unsqueeze(0)
        else:
            pos_embed = self.pos_embed
        return (latent + pos_embed.to(latent.device)).to(latent.dtype)


class PixArtAlphaTextProjection(nn.Module):
    def __init__(self, in_features, hidden_size, out_features=None,
                 act_fn="gelu_tanh"):
        super().__init__()
        if out_features is None:
            out_features = hidden_size
        self.linear_1 = nn.Linear(in_features, hidden_size, bias=True)
        if act_fn == "gelu_tanh":
            self.act_1 = nn.GELU(approximate="tanh")
        elif act_fn == "silu":
            self.act_1 = nn.SiLU()
        else:
            raise NotImplementedError(act_fn)
        self.linear_2 = nn.Linear(hidden_size, out_features, bias=True)

    def forward(self, caption):
        return self.linear_2(self.act_1(self.linear_1(caption)))


class PixArtAlphaCombinedTimestepSizeEmbeddings(nn.Module):
    def __init__(self, embedding_dim, size_emb_dim,
                 use_additional_conditions=False):
        super().__init__()
        self.outdim = size_emb_dim
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True,
                                   downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256,
                                                   time_embed_dim=embedding_dim)
        self.use_additional_conditions = use_additional_conditions
        if use_additional_conditions:
            self.additional_condition_proj = Timesteps(
                num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=0)
            self.resolution_embedder = TimestepEmbedding(
                in_channels=256, time_embed_dim=size_emb_dim)
            self.aspect_ratio_embedder = TimestepEmbedding(
                in_channels=256, time_embed_dim=size_emb_dim)

    def forward(self, timestep, resolution, aspect_ratio, batch_size,
                hidden_dtype):
        timesteps_proj = self.time_proj(timestep)
        timesteps_emb = self.timestep_embedder(timesteps_proj.to(dtype=hidden_dtype))
        if self.use_additional_conditions:
            resolution_emb = self.additional_condition_proj(
                resolution.flatten()).to(hidden_dtype)
            resolution_emb = self.resolution_embedder(resolution_emb).reshape(
                batch_size, -1)
            aspect_ratio_emb = self.additional_condition_proj(
                aspect_ratio.flatten()).to(hidden_dtype)
            aspect_ratio_emb = self.aspect_ratio_embedder(aspect_ratio_emb).reshape(
                batch_size, -1)
            conditioning = timesteps_emb + torch.cat(
                [resolution_emb, aspect_ratio_emb], dim=1)
        else:
            conditioning = timesteps_emb
        return conditioning


class SinusoidalPositionalEmbedding(nn.Module):
    def __init__(self, embed_dim, max_seq_length=32):
        super().__init__()
        position = torch.arange(max_seq_length).unsqueeze(1)
        div_term = torch.exp(torch.arange(0, embed_dim, 2)
                             * (-math.log(10000.0) / embed_dim))
        pe = torch.zeros(1, max_seq_length, embed_dim)
        pe[0, :, 0::2] = torch.sin(position * div_term)
        pe[0, :, 1::2] = torch.cos(position * div_term)
        self.register_buffer("pe", pe)

    def forward(self, x):
        _, seq_length, _ = x.shape
        return x + self.pe[:, :seq_length]


class ImagePositionalEmbeddings(nn.Module):  # vectorized path: unused
    def __init__(self, *a, **k):
        super().__init__()


# --------------------------------------------------------------------------- #
# normalization (only non-ada_norm_single paths instantiate these)
# --------------------------------------------------------------------------- #
class AdaLayerNorm(nn.Module):
    def __init__(self, embedding_dim, num_embeddings=None):
        super().__init__()
        self.emb = nn.Embedding(num_embeddings, embedding_dim)
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, embedding_dim * 2)
        self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False)

    def forward(self, x, timestep):
        emb = self.linear(self.silu(self.emb(timestep)))
        scale, shift = torch.chunk(emb, 2)
        return self.norm(x) * (1 + scale) + shift


class AdaLayerNormZero(nn.Module):
    def __init__(self, embedding_dim, num_embeddings=None, norm_type="layer_norm",
                 bias=True):
        super().__init__()
        self.emb = None
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, 6 * embedding_dim, bias=bias)
        self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, timestep=None, class_labels=None, hidden_dtype=None,
                emb=None):
        emb = self.linear(self.silu(emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            emb.chunk(6, dim=1)
        x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormContinuous(nn.Module):
    def __init__(self, embedding_dim, conditioning_embedding_dim,
                 elementwise_affine=True, eps=1e-5, bias=True,
                 norm_type="layer_norm"):
        super().__init__()
        self.silu = nn.SiLU()
        self.linear = nn.Linear(conditioning_embedding_dim, embedding_dim * 2,
                                bias=bias)
        self.norm = nn.LayerNorm(embedding_dim, eps, elementwise_affine, bias)

    def forward(self, x, conditioning_embedding):
        emb = self.linear(self.silu(conditioning_embedding).to(x.dtype))
        scale, shift = torch.chunk(emb, 2, dim=1)
        return self.norm(x) * (1 + scale)[:, None, :] + shift[:, None, :]


# --------------------------------------------------------------------------- #
# lora / modeling_outputs
# --------------------------------------------------------------------------- #
class LoRACompatibleConv(nn.Conv2d):
    def forward(self, hidden_states, scale=1.0):
        return super().forward(hidden_states)


class LoRACompatibleLinear(nn.Linear):
    def forward(self, hidden_states, scale=1.0):
        return super().forward(hidden_states)


import dataclasses


@dataclasses.dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: torch.Tensor = None


# --------------------------------------------------------------------------- #
# extras for OSP v1.2 / Vchitect
# --------------------------------------------------------------------------- #
class AdaLayerNormSingle(nn.Module):
    """diffusers 0.30.0 AdaLayerNormSingle (PixArt-style)."""

    def __init__(self, embedding_dim, use_additional_conditions=False):
        super().__init__()
        self.emb = PixArtAlphaCombinedTimestepSizeEmbeddings(
            embedding_dim, size_emb_dim=embedding_dim // 3,
            use_additional_conditions=use_additional_conditions)
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, 6 * embedding_dim, bias=True)

    def forward(self, timestep, added_cond_kwargs=None, batch_size=None,
                hidden_dtype=None):
        added_cond_kwargs = added_cond_kwargs or {"resolution": None,
                                                  "aspect_ratio": None}
        embedded_timestep = self.emb(timestep, **added_cond_kwargs,
                                     batch_size=batch_size,
                                     hidden_dtype=hidden_dtype)
        return self.linear(self.silu(embedded_timestep)), embedded_timestep


class GatedSelfAttentionDense(nn.Module):  # gligen-only: unused at runtime
    def __init__(self, *a, **k):
        super().__init__()


class CombinedTimestepTextProjEmbeddings(nn.Module):
    """diffusers 0.30.0 (SD3/Vchitect): timestep + pooled-text projection."""

    def __init__(self, embedding_dim, pooled_projection_dim):
        super().__init__()
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True,
                                   downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256,
                                                   time_embed_dim=embedding_dim)
        self.text_embedder = PixArtAlphaTextProjection(
            pooled_projection_dim, embedding_dim, act_fn="silu")

    def forward(self, timestep, pooled_projection):
        timesteps_proj = self.time_proj(timestep)
        timesteps_emb = self.timestep_embedder(
            timesteps_proj.to(dtype=pooled_projection.dtype))
        pooled_projections = self.text_embedder(pooled_projection)
        return timesteps_emb + pooled_projections


class FromOriginalModelMixin:
    pass


class PeftAdapterMixin:
    pass


def unscale_lora_layers(*a, **k):
    return None


def scale_lora_layers(*a, **k):
    return None


class DiffusionPipeline:
    """Base-class stand-in for videosys.core.pipeline (config plumbing only)."""

    config_name = "model_index.json"

    def register_modules(self, **kwargs):
        for name, module in kwargs.items():
            setattr(self, name, module)

    def register_to_config(self, **kwargs):
        pass


# --------------------------------------------------------------------------
# AutoencoderKL — faithful mini of diffusers 0.30.0 (models/autoencoders/
# autoencoder_kl.py + vae.py + unet_2d_blocks.py pieces it uses). Only the
# eval-time forward math is reproduced; key names match the released
# checkpoints exactly so state_dicts round-trip.
# --------------------------------------------------------------------------

def get_activation(name):
    return {"silu": nn.SiLU(), "swish": nn.SiLU(), "relu": nn.ReLU(),
            "gelu": nn.GELU(), "mish": nn.Mish()}[name]


class DiagonalGaussianDistribution:
    def __init__(self, parameters, deterministic=False):
        self.parameters = parameters
        self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)
        self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = torch.exp(0.5 * self.logvar)
        self.var = torch.exp(self.logvar)
        if deterministic:
            self.std = self.var = torch.zeros_like(self.mean)

    def sample(self, generator=None):
        noise = torch.randn(self.mean.shape, generator=generator,
                            dtype=self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self):
        return self.mean


class DecoderOutput(BaseOutput):
    def __init__(self, sample):
        super().__init__(sample=sample)


class AutoencoderKLOutput(BaseOutput):
    def __init__(self, latent_dist):
        super().__init__(latent_dist=latent_dist)


def apply_forward_hook(fn):
    return fn


class VAEResnetBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, groups=32, eps=1e-6):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, out_channels, eps=eps)
        self.dropout = nn.Dropout(0.0)
        self.conv2 = nn.Conv2d(out_channels, out_channels, 3, padding=1)
        self.nonlinearity = nn.SiLU()
        self.conv_shortcut = (nn.Conv2d(in_channels, out_channels, 1)
                              if in_channels != out_channels else None)

    def forward(self, x):
        h = self.conv1(self.nonlinearity(self.norm1(x)))
        h = self.conv2(self.dropout(self.nonlinearity(self.norm2(h))))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class VAEMidAttention(nn.Module):
    """diffusers Attention as configured by UNetMidBlock2D: single head
    (head_dim == channels), group-norm, residual connection, spatial input."""

    def __init__(self, channels, groups=32, eps=1e-6):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, channels, eps=eps)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels),
                                     nn.Dropout(0.0)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        o = F.scaled_dot_product_attention(q.unsqueeze(1), k.unsqueeze(1),
                                           v.unsqueeze(1)).squeeze(1)
        o = self.to_out[1](self.to_out[0](o))
        return x + o.transpose(1, 2).reshape(B, C, H, W)


class VAEDownsample2D(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class VAEUpsample2D(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class DownEncoderBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, num_layers, groups,
                 add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [VAEResnetBlock2D(in_channels if j == 0 else out_channels,
                              out_channels, groups) for j in range(num_layers)])
        self.downsamplers = (nn.ModuleList([VAEDownsample2D(out_channels)])
                             if add_downsample else None)

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class UpDecoderBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, num_layers, groups,
                 add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [VAEResnetBlock2D(in_channels if j == 0 else out_channels,
                              out_channels, groups) for j in range(num_layers)])
        self.upsamplers = (nn.ModuleList([VAEUpsample2D(out_channels)])
                           if add_upsample else None)

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class UNetMidBlock2D(nn.Module):
    def __init__(self, channels, groups=32, add_attention=True):
        super().__init__()
        self.resnets = nn.ModuleList([VAEResnetBlock2D(channels, channels, groups),
                                      VAEResnetBlock2D(channels, channels, groups)])
        self.attentions = nn.ModuleList(
            [VAEMidAttention(channels, groups)] if add_attention else [None])

    def forward(self, x):
        x = self.resnets[0](x)
        if self.attentions[0] is not None:
            x = self.attentions[0](x)
        return self.resnets[1](x)


class VAEEncoder(nn.Module):
    def __init__(self, in_channels, latent_channels, block_out_channels,
                 layers_per_block, groups, mid_block_add_attention=True):
        super().__init__()
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], 3, padding=1)
        blocks = []
        ch_in = block_out_channels[0]
        for i, ch in enumerate(block_out_channels):
            blocks.append(DownEncoderBlock2D(
                ch_in, ch, layers_per_block, groups,
                add_downsample=i < len(block_out_channels) - 1))
            ch_in = ch
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = UNetMidBlock2D(block_out_channels[-1], groups,
                                        mid_block_add_attention)
        self.conv_norm_out = nn.GroupNorm(groups, block_out_channels[-1], eps=1e-6)
        self.conv_act = nn.SiLU()
        self.conv_out = nn.Conv2d(block_out_channels[-1], 2 * latent_channels,
                                  3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for b in self.down_blocks:
            h = b(h)
        h = self.mid_block(h)
        return self.conv_out(self.conv_act(self.conv_norm_out(h)))


class VAEDecoder(nn.Module):
    def __init__(self, out_channels, latent_channels, block_out_channels,
                 layers_per_block, groups, mid_block_add_attention=True):
        super().__init__()
        self.conv_in = nn.Conv2d(latent_channels, block_out_channels[-1], 3,
                                 padding=1)
        self.mid_block = UNetMidBlock2D(block_out_channels[-1], groups,
                                        mid_block_add_attention)
        rev = list(reversed(block_out_channels))
        blocks = []
        ch_in = rev[0]
        for i, ch in enumerate(rev):
            blocks.append(UpDecoderBlock2D(
                ch_in, ch, layers_per_block + 1, groups,
                add_upsample=i < len(rev) - 1))
            ch_in = ch
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(groups, rev[-1], eps=1e-6)
        self.conv_act = nn.SiLU()
        self.conv_out = nn.Conv2d(rev[-1], out_channels, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block(h)
        for b in self.up_blocks:
            h = b(h)
        return self.conv_out(self.conv_act(self.conv_norm_out(h)))


class AutoencoderKL(ModelMixin, ConfigMixin):
    """Key-compatible eval-time AutoencoderKL. `from_pretrained` does NOT
    download: it constructs from `AutoencoderKL.test_config` (set by tests)
    or the SD-VAE default architecture, random-init — converted-weights
    parity tests only need architecture + key fidelity."""

    test_config = None

    def __init__(self, in_channels=3, out_channels=3,
                 block_out_channels=(128, 256, 512, 512), layers_per_block=2,
                 latent_channels=4, norm_num_groups=32,
                 mid_block_add_attention=True, scaling_factor=0.18215):
        super().__init__()
        self.encoder = VAEEncoder(in_channels, latent_channels,
                                  block_out_channels, layers_per_block,
                                  norm_num_groups, mid_block_add_attention)
        self.decoder = VAEDecoder(out_channels, latent_channels,
                                  block_out_channels, layers_per_block,
                                  norm_num_groups, mid_block_add_attention)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)
        self._internal_dict = _FrozenConfig(
            in_channels=in_channels, out_channels=out_channels,
            block_out_channels=tuple(block_out_channels),
            layers_per_block=layers_per_block,
            latent_channels=latent_channels,
            norm_num_groups=norm_num_groups,
            scaling_factor=scaling_factor)

    @classmethod
    def from_pretrained(cls, *a, **k):
        return cls(**(cls.test_config or {}))

    def encode(self, x):
        return AutoencoderKLOutput(
            DiagonalGaussianDistribution(self.quant_conv(self.encoder(x))))

    def decode(self, z):
        return DecoderOutput(self.decoder(self.post_quant_conv(z)))


class AutoencoderKLTemporalDecoder:
    @classmethod
    def from_pretrained(cls, *a, **k):
        raise NotImplementedError(
            "VideoAutoencoderKLTemporalDecoder (Open-Sora v1.1 pixel VAE) is "
            "not exercised by the parity tests")
