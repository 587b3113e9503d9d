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

    class _Attention(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    class _AttnProcessor:
        pass

    diffusers = _module("diffusers")
    dmodels = _module("diffusers.models")
    _module("diffusers.models.attention", Attention=_Attention)
    _module("diffusers.models.attention_processor", AttnProcessor=_AttnProcessor,
            Attention=_Attention)
    diffusers.models = dmodels

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

    # fake top-level package: submodule imports resolve against the reference
    # tree (every reference __init__.py is empty, verified)
    pkg = types.ModuleType("videosys")
    pkg.__path__ = [f"{REF_ROOT}/videosys"]
    sys.modules["videosys"] = pkg


def load(modname: str):
    """e.g. load("videosys.models.transformers.open_sora_transformer_3d")."""
    install_stubs()
    return importlib.import_module(modname)
