"""Open-Sora-Plan v1.1 transformer — the reference's `LatteT2V` variant.

Behavioral reference:
`videosys/models/transformers/open_sora_plan_v110_transformer_3d.py`
(RoPE2D :136-186, RoPE1D :199-243, BasicTransformerBlock :1734-2120 spatial,
BasicTransformerBlock_ :1370-1731 temporal with DSP dynamic_switch
:1592-1605, LatteT2V :2123-2826). The architecture is Latte with optional
RoPE2D on spatial attention / RoPE1D on temporal attention and 65/221-frame
checkpoints (latent video_length 17/56 after the 4x-temporal CausalVAE).

Implementation: the TPU-native Latte (latte.py) already carries the whole
block structure (adaLN-single, GEGLU FF, PAB spatial/temporal/cross/MLP
hooks, DSP frame-resident sharding with the temporal-attention flip); this
module specializes its config — `use_rope` threads RoPE tables into both
attention paths. PAB defaults live in the Open-Sora-Plan pipeline
(pipeline_open_sora_plan.py:41-102).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from videosys_tpu.models.transformers.latte import LatteConfig, LatteT2V

OpenSoraPlanV110Transformer = LatteT2V


def OpenSoraPlanV110Config(
    transformer_type: str = "65x512x512",
    use_rope: bool = False,
    dtype=jnp.float32,
    **overrides,
) -> LatteConfig:
    """Config for the released v1.1.0 checkpoints
    (LanguageBind/Open-Sora-Plan-v1.1.0 subfolders 65x512x512 / 221x512x512):
    28 layers, 16 heads x 72 (inner 1152), patch 2, T5-XXL captions,
    learned sigma (out = 2 x 4 latent channels), sample_size 64 (=512/8);
    latent video_length = (frames - 1) // 4 + 1 with the 4x8x8 CausalVAE."""
    frames = int(transformer_type.split("x")[0])
    video_length = (frames - 1) // 4 + 1
    defaults = dict(
        num_layers=28,
        num_heads=16,
        head_dim=72,
        in_channels=4,
        patch_size=2,
        caption_channels=4096,
        video_length=video_length,
        sample_size=64,
        learned_sigma=True,
        use_rope=use_rope,
        dtype=dtype,
    )
    defaults.update(overrides)
    return LatteConfig(**defaults)
