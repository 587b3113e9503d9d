"""Import the reference (PyTorch) videosys model files with stubbed heavy
dependencies, for converted-weights parity tests.

The reference package at /root/reference imports timm / diffusers /
colossalai / omegaconf, none of which are in this image. All its
`__init__.py` files are empty, so we can register a fake top-level
``videosys`` package whose __path__ points at the reference tree, stub the
missing third-party modules in sys.modules, and import individual model
files unchanged. DropPath is identity at eval; timm's Mlp is re-declared
faithfully (fc1 -> act -> drop -> fc2 -> drop, the layout the checkpoints
use); flash-attn stays unused (enable_flash_attn=False -> eager math).
"""

from __future__ import annotations

import importlib
import sys
import types

REF_ROOT = "/root/reference"


def _module(name, **attrs):
    m = types.ModuleType(name)
    # transformers probes availability via importlib.util.find_spec, which
    # raises on a None __spec__ — give the stub a real-looking spec
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_stubs():
    if "videosys" in sys.modules:
        return
    import torch
    import torch.nn as nn

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-time: identity (timm semantics)
            return x

    class Mlp(nn.Module):
        # timm.models.vision_transformer.Mlp layout (fc1/act/drop/fc2/drop)
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, norm_layer=None,
                     bias=True, drop=0.0, use_conv=False):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.norm = norm_layer(hidden_features) if norm_layer else nn.Identity()
            self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.norm(self.drop1(self.act(self.fc1(x))))))

    timm = _module("timm")
    timm_models = _module("timm.models")
    _module("timm.models.layers", DropPath=DropPath)
    _module("timm.models.vision_transformer", Mlp=Mlp)
    timm.models = timm_models

    # faithful mini-diffusers (0.30.0 semantics) — see diffusers_stub.py
    import diffusers_stub as D

    diffusers = _module("diffusers")
    dmodels = _module("diffusers.models")
    _module("diffusers.configuration_utils", ConfigMixin=D.ConfigMixin,
            register_to_config=D.register_to_config)
    _module("diffusers.models.activations", GEGLU=D.GEGLU, GELU=D.GELU,
            ApproximateGELU=D.ApproximateGELU)
    _module("diffusers.models.attention", Attention=D.Attention,
            FeedForward=D.FeedForward,
            GatedSelfAttentionDense=D.GatedSelfAttentionDense)
    _module("diffusers.models.activations", GEGLU=D.GEGLU, GELU=D.GELU,
            ApproximateGELU=D.ApproximateGELU,
            get_activation=D.get_activation)
    _module("diffusers.models.autoencoders")
    _module("diffusers.models.autoencoders.vae", DecoderOutput=D.DecoderOutput,
            DiagonalGaussianDistribution=D.DiagonalGaussianDistribution)
    _module("diffusers.loaders.single_file_model",
            FromOriginalModelMixin=D.FromOriginalModelMixin)
    _module("diffusers.utils.accelerate_utils",
            apply_forward_hook=D.apply_forward_hook)
    _module("diffusers.loaders", FromOriginalModelMixin=D.FromOriginalModelMixin,
            PeftAdapterMixin=D.PeftAdapterMixin)
    _module("diffusers.models.transformers")
    _module("diffusers.models.transformers.transformer_2d",
            Transformer2DModelOutput=D.Transformer2DModelOutput)
    _module("diffusers.pipelines")
    _module("diffusers.pipelines.pipeline_utils",
            DiffusionPipeline=D.DiffusionPipeline)
    class _UnusedProcessor:  # imported by v110, never instantiated at eval
        def __init__(self, *a, **k):
            pass

    class _SpatialNorm(nn.Module):
        def __init__(self, f_channels, zq_channels):
            super().__init__()
            self.norm_layer = nn.GroupNorm(32, f_channels, eps=1e-6)
            self.conv_y = nn.Conv2d(zq_channels, f_channels, 1)
            self.conv_b = nn.Conv2d(zq_channels, f_channels, 1)

        def forward(self, f, zq):
            zq = nn.functional.interpolate(zq, size=f.shape[-2:], mode="nearest")
            return self.norm_layer(f) * self.conv_y(zq) + self.conv_b(zq)

    _module("diffusers.models.attention_processor", Attention=D.Attention,
            AttnProcessor=D.AttnProcessor, AttnProcessor2_0=D.AttnProcessor2_0,
            SpatialNorm=_SpatialNorm,
            **{name: _UnusedProcessor for name in (
                "AttnAddedKVProcessor", "AttnAddedKVProcessor2_0",
                "CustomDiffusionAttnProcessor",
                "CustomDiffusionAttnProcessor2_0",
                "CustomDiffusionXFormersAttnProcessor",
                "LoRAAttnAddedKVProcessor", "LoRAAttnProcessor",
                "LoRAAttnProcessor2_0", "LoRAXFormersAttnProcessor",
                "SlicedAttnAddedKVProcessor", "SlicedAttnProcessor",
                "XFormersAttnAddedKVProcessor", "XFormersAttnProcessor")})
    _module("diffusers.models.embeddings",
            ImagePositionalEmbeddings=D.ImagePositionalEmbeddings,
            CombinedTimestepTextProjEmbeddings=D.CombinedTimestepTextProjEmbeddings,
            PatchEmbed=D.PatchEmbed,
            PixArtAlphaCombinedTimestepSizeEmbeddings=D.PixArtAlphaCombinedTimestepSizeEmbeddings,
            PixArtAlphaTextProjection=D.PixArtAlphaTextProjection,
            SinusoidalPositionalEmbedding=D.SinusoidalPositionalEmbedding,
            get_1d_sincos_pos_embed_from_grid=D.get_1d_sincos_pos_embed_from_grid,
            get_2d_sincos_pos_embed=D.get_2d_sincos_pos_embed,
            get_3d_sincos_pos_embed=D.get_3d_sincos_pos_embed,
            TimestepEmbedding=D.TimestepEmbedding, Timesteps=D.Timesteps)
    _module("diffusers.models.lora", LoRACompatibleConv=D.LoRACompatibleConv,
            LoRACompatibleLinear=D.LoRACompatibleLinear)
    _module("diffusers.models.modeling_utils", ModelMixin=D.ModelMixin)
    _module("diffusers.models.modeling_outputs",
            Transformer2DModelOutput=D.Transformer2DModelOutput,
            AutoencoderKLOutput=D.AutoencoderKLOutput)
    _module("diffusers.models.normalization", AdaLayerNorm=D.AdaLayerNorm,
            AdaLayerNormZero=D.AdaLayerNormZero,
            AdaLayerNormSingle=D.AdaLayerNormSingle,
            AdaLayerNormContinuous=D.AdaLayerNormContinuous)
    _module("diffusers.utils", USE_PEFT_BACKEND=D.USE_PEFT_BACKEND,
            BaseOutput=D.BaseOutput, deprecate=D.deprecate,
            is_torch_version=D.is_torch_version,
            is_xformers_available=lambda: False,
            unscale_lora_layers=D.unscale_lora_layers,
            scale_lora_layers=D.scale_lora_layers)
    _module("diffusers.utils.torch_utils",
            maybe_allow_in_graph=D.maybe_allow_in_graph)
    dmodels.AutoencoderKL = D.AutoencoderKL
    dmodels.AutoencoderKLTemporalDecoder = D.AutoencoderKLTemporalDecoder
    diffusers.ConfigMixin = D.ConfigMixin
    diffusers.ModelMixin = D.ModelMixin
    diffusers.models = dmodels

    class _DiffLogging:
        @staticmethod
        def get_logger(name=None):
            import logging
            return logging.getLogger(name or "diffusers")

        @staticmethod
        def set_verbosity_error():
            pass

    sys.modules["diffusers.utils"].logging = _DiffLogging()

    import torch as _torch  # torchvision is absent from the image
    tv = _module("torchvision")
    tv_t = _module("torchvision.transforms", Lambda=lambda f: f)
    tv.transforms = tv_t

    class _ProcessGroupMesh:
        def __init__(self, *a, **k):
            pass

    colossalai = _module("colossalai")
    ccluster = _module("colossalai.cluster")
    _module("colossalai.cluster.process_group_mesh",
            ProcessGroupMesh=_ProcessGroupMesh)
    colossalai.cluster = ccluster

    class _OmegaConf:
        @staticmethod
        def load(path):
            raise NotImplementedError

    _module("omegaconf", DictConfig=dict, ListConfig=list, OmegaConf=_OmegaConf)

    class RotaryEmbedding(nn.Module):
        """Faithful mini rotary_embedding_torch.RotaryEmbedding for the
        default ('lang') config the reference uses: interleaved-pair
        rotation, freqs 1/theta^(2i/dim), positions along dim -2."""

        def __init__(self, dim, theta=10000):
            super().__init__()
            freqs = 1.0 / (theta ** (torch.arange(0, dim, 2)[: dim // 2]
                                     .float() / dim))
            self.register_buffer("freqs", freqs)

        def rotate_queries_or_keys(self, t, seq_dim=-2):
            n = t.shape[seq_dim]
            pos = torch.arange(n, dtype=self.freqs.dtype,
                               device=self.freqs.device)
            f = torch.einsum("n,f->nf", pos, self.freqs)
            f = f.repeat_interleave(2, dim=-1)              # (f0,f0,f1,f1,…)
            x = t.reshape(*t.shape[:-1], -1, 2)
            x1, x2 = x.unbind(-1)
            rot = torch.stack((-x2, x1), dim=-1).reshape(t.shape)
            return t * f.cos() + rot * f.sin()

    _module("rotary_embedding_torch", RotaryEmbedding=RotaryEmbedding)

    # fake top-level package: submodule imports resolve against the reference
    # tree (every reference __init__.py is empty, verified)
    pkg = types.ModuleType("videosys")
    pkg.__path__ = [f"{REF_ROOT}/videosys"]
    sys.modules["videosys"] = pkg


def load(modname: str):
    """e.g. load("videosys.models.transformers.open_sora_transformer_3d")."""
    install_stubs()
    return importlib.import_module(modname)
