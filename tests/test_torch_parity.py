"""Converted-weights parity vs the ACTUAL reference PyTorch models.

BASELINE.md promises identical outputs vs the PyTorch reference; round-1 only
proved this at op level. Here we load the reference model files themselves
(tests/ref_torch.py stub-imports them around the missing GPU deps), convert
random-init torch weights with utils/convert.py, and assert fp32 forward
parity of the FULL model / blocks. Latte parity doubles as the OSP-v1.1
evidence (the reference v1.1 transformer is a Latte variant,
open_sora_plan_v110_transformer_3d.py:2123).
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import ref_torch
from videosys_tpu.utils import convert as C


def _sd(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


def _stub_pm(net):
    pm = types.SimpleNamespace(cp_size=1, sp_size=1)
    net.parallel_manager = pm
    for mod in net.modules():
        if hasattr(mod, "parallel_manager"):
            mod.parallel_manager = pm
    return net


# --------------------------------------------------------------------------- #
def test_stdit3_full_model_parity():
    m = ref_torch.load("videosys.models.transformers.open_sora_transformer_3d")
    torch.manual_seed(0)
    depth, hidden, heads, cap = 2, 32, 2, 16
    ref = _stub_pm(m.STDiT3(m.STDiT3Config(
        depth=depth, hidden_size=hidden, num_heads=heads,
        caption_channels=cap, model_max_length=8,
        enable_flash_attn=False)).eval())

    B, T, H, W, L = 2, 3, 8, 8, 8
    x = torch.randn(B, 4, T, H, W)
    t = torch.full((B,), 500.0)
    y = torch.randn(B, 1, L, cap)
    fps = torch.full((B,), 24.0)
    hw = dict(height=torch.tensor([256.0] * B), width=torch.tensor([256.0] * B))
    # all-ones mask: reference compacts tokens by mask (masked_select,
    # :526-537) which changes the padded length; full mask keeps L tokens
    mask = torch.ones(B, L, dtype=torch.long)
    with torch.no_grad():
        want = ref(x, t, y, mask=mask, fps=fps, **hw).numpy()

    from videosys_tpu.models.transformers.stdit3 import STDiT3, STDiT3Config

    params = C.convert_stdit3(_sd(ref), depth=depth)
    model = STDiT3(STDiT3Config(depth=depth, hidden_size=hidden,
                                num_heads=heads, caption_channels=cap,
                                model_max_length=8))
    got = np.asarray(model.apply(
        params, jnp.asarray(x.numpy()), jnp.asarray(t.numpy()),
        jnp.asarray(y.numpy()[:, 0]), kv_mask=jnp.ones((B, L), bool),
        fps=jnp.asarray(fps.numpy()), height=256.0, width=256.0))

    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_stdit3_parity_with_x_mask():
    m = ref_torch.load("videosys.models.transformers.open_sora_transformer_3d")
    torch.manual_seed(1)
    depth, hidden, heads, cap = 1, 32, 2, 16
    ref = _stub_pm(m.STDiT3(m.STDiT3Config(
        depth=depth, hidden_size=hidden, num_heads=heads,
        caption_channels=cap, model_max_length=8,
        enable_flash_attn=False)).eval())

    B, T, L = 2, 3, 8
    x = torch.randn(B, 4, T, 8, 8)
    t = torch.full((B,), 300.0)
    y = torch.randn(B, 1, L, cap)
    fps = torch.full((B,), 24.0)
    x_mask = torch.tensor([[True, True, False], [True, False, False]])
    with torch.no_grad():
        want = ref(x, t, y, mask=torch.ones(B, L, dtype=torch.long), fps=fps,
                   x_mask=x_mask,
                   height=torch.tensor([256.0] * B),
                   width=torch.tensor([256.0] * B)).numpy()

    from videosys_tpu.models.transformers.stdit3 import STDiT3, STDiT3Config

    params = C.convert_stdit3(_sd(ref), depth=depth)
    model = STDiT3(STDiT3Config(depth=depth, hidden_size=hidden,
                                num_heads=heads, caption_channels=cap,
                                model_max_length=8))
    got = np.asarray(model.apply(
        params, jnp.asarray(x.numpy()), jnp.asarray(t.numpy()),
        jnp.asarray(y.numpy()[:, 0]), kv_mask=jnp.ones((B, L), bool),
        x_mask=jnp.asarray(x_mask.numpy()),
        fps=jnp.asarray(fps.numpy()), height=256.0, width=256.0))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


# --------------------------------------------------------------------------- #
def test_latte_full_model_parity():
    """Latte parity also certifies OSP v1.1 (a LatteT2V variant)."""
    m = ref_torch.load("videosys.models.transformers.latte_transformer_3d")
    torch.manual_seed(2)
    depth, heads, hd, cap = 2, 2, 16, 16
    B, T, H, W, L = 2, 3, 16, 16, 6
    ref = _stub_pm(m.LatteT2V(
        num_attention_heads=heads, attention_head_dim=hd, in_channels=4,
        out_channels=8, num_layers=depth, cross_attention_dim=heads * hd,
        sample_size=H // 2, patch_size=2, activation_fn="gelu-approximate",
        num_embeds_ada_norm=1000, norm_type="ada_norm_single",
        attention_bias=True,  # maxin-cn/Latte-1 config value
        caption_channels=cap, video_length=T).eval())

    x = torch.randn(B, 4, T, H, W)
    t = torch.full((B,), 500, dtype=torch.long)
    y = torch.randn(B, L, cap)
    with torch.no_grad():
        want = ref(x, t, encoder_hidden_states=y,
                   enable_temporal_attentions=True, return_dict=False)[0].numpy()

    from videosys_tpu.models.transformers.latte import LatteConfig, LatteT2V

    params = C.convert_latte(_sd(ref), depth=depth)
    model = LatteT2V(LatteConfig(
        num_layers=depth, num_heads=heads, head_dim=hd, in_channels=4,
        patch_size=2, caption_channels=cap, video_length=T,
        sample_size=H // 2))
    got = np.asarray(model.apply(
        params, jnp.asarray(x.numpy()),
        jnp.asarray(t.numpy().astype(np.float32)), jnp.asarray(y.numpy())))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


# --------------------------------------------------------------------------- #
def test_cogvideox_full_model_parity():
    m = ref_torch.load("videosys.models.transformers.cogvideox_transformer_3d")
    torch.manual_seed(3)
    heads, hd, depth, tdim, ted = 2, 16, 2, 64, 24
    B, F_, H, W, L = 2, 3, 8, 8, 6
    ref = _stub_pm(m.CogVideoXTransformer3DModel(
        num_attention_heads=heads, attention_head_dim=hd, in_channels=4,
        out_channels=4, time_embed_dim=tdim, text_embed_dim=ted,
        num_layers=depth, sample_width=W, sample_height=H,
        sample_frames=(F_ - 1) * 4 + 1, patch_size=2,
        max_text_seq_length=L,
        use_rotary_positional_embeddings=False).eval())

    x = torch.randn(B, F_, 4, H, W)
    enc = torch.randn(B, L, ted)
    t = torch.full((B,), 500, dtype=torch.long)
    with torch.no_grad():
        want = ref(x, enc, t, return_dict=False)[0].numpy()

    from videosys_tpu.models.transformers.cogvideox import (
        CogVideoXConfig,
        CogVideoXTransformer3D,
    )

    params = C.convert_cogvideox(_sd(ref), depth=depth)
    model = CogVideoXTransformer3D(CogVideoXConfig(
        num_layers=depth, num_heads=heads, head_dim=hd, in_channels=4,
        out_channels=4, time_embed_dim=tdim, text_embed_dim=ted,
        patch_size=2, max_text_seq_length=L, sample_width=W,
        sample_height=H, sample_frames=(F_ - 1) * 4 + 1,
        use_rotary_positional_embeddings=False))
    got = np.asarray(model.apply(
        params, jnp.asarray(x.numpy()), jnp.asarray(enc.numpy()),
        jnp.asarray(t.numpy().astype(np.float32))))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


# --------------------------------------------------------------------------- #
def test_osp_v120_full_model_parity():
    """Tiny OpenSoraT2V_ROPE-style variant (the released v1.2 architecture)."""
    m = ref_torch.load(
        "videosys.models.transformers.open_sora_plan_v120_transformer_3d")
    torch.manual_seed(4)
    # head_dim must be divisible by 3 (RoPE3D thirds) — real ckpt uses 96
    heads, hd, depth, cap = 2, 12, 2, 16
    B, T, H, W, L = 2, 3, 8, 8, 6
    ref = _stub_pm(m.OpenSoraT2V(
        num_layers=depth, attention_head_dim=hd, num_attention_heads=heads,
        patch_size_t=1, patch_size=2, norm_type="ada_norm_single",
        caption_channels=cap, cross_attention_dim=heads * hd,
        in_channels=4, out_channels=4, sample_size=(H // 2, W // 2),
        sample_size_t=T, use_rope=True, attention_mode="math",
        attention_bias=True, activation_fn="gelu-approximate",
        interpolation_scale_h=1.0, interpolation_scale_w=1.0,
        interpolation_scale_t=1.0).eval())

    x = torch.randn(B, 4, T, H, W)
    t = torch.full((B,), 500, dtype=torch.long)
    y = torch.randn(B, 1, L, cap)
    with torch.no_grad():
        want = ref(x, t, encoder_hidden_states=y,
                   attention_mask=torch.ones(B, T, H, W),
                   encoder_attention_mask=torch.ones(B, 1, L),
                   return_dict=False)[0].numpy()

    from videosys_tpu.models.transformers.open_sora_plan_v120 import (
        OpenSoraPlanV120Config,
        OpenSoraPlanV120Transformer,
    )

    params = C.convert_osp_v120(_sd(ref), depth=depth)
    model = OpenSoraPlanV120Transformer(OpenSoraPlanV120Config(
        num_layers=depth, num_heads=heads, head_dim=hd, in_channels=4,
        out_channels=4, caption_channels=cap, patch_size=2, patch_size_t=1,
        sample_size=(H // 2, W // 2), sample_size_t=T, use_rope=True,
        interpolation_scale_h=1.0, interpolation_scale_w=1.0,
        interpolation_scale_t=1.0))
    got = np.asarray(model.apply(
        params, jnp.asarray(x.numpy()), jnp.asarray(y.numpy()[:, 0]),
        jnp.asarray(t.numpy().astype(np.float32))))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


# --------------------------------------------------------------------------- #
def test_vchitect_full_model_parity():
    m = ref_torch.load("videosys.models.transformers.vchitect_transformer_3d")
    torch.manual_seed(5)
    heads, hd, depth = 2, 16, 2
    B, F_, H, W, L = 1, 3, 8, 8, 6
    jdim, pdim = 24, 20
    ref = _stub_pm(m.VchitectXLTransformerModel(
        sample_size=H // 2, patch_size=2, in_channels=4, out_channels=4,
        num_layers=depth, attention_head_dim=hd, num_attention_heads=heads,
        joint_attention_dim=jdim, caption_projection_dim=heads * hd,
        pooled_projection_dim=pdim, pos_embed_max_size=8).eval())

    x = torch.randn(B, F_, 4, H, W)
    y = torch.randn(B, L, jdim)
    pooled = torch.randn(B, pdim)
    t = torch.full((B,), 500, dtype=torch.long)
    with torch.no_grad():
        want = ref(x, encoder_hidden_states=y, pooled_projections=pooled,
                   timestep=t, return_dict=False)[0].numpy()
    want = want.reshape(B, F_, 4, H, W)  # reference folds frames into batch

    from videosys_tpu.models.transformers.vchitect import (
        VchitectModelConfig,
        VchitectXLTransformer,
    )

    params = C.convert_vchitect(_sd(ref), depth=depth)
    model = VchitectXLTransformer(VchitectModelConfig(
        sample_size=H // 2, patch_size=2, in_channels=4, out_channels=4,
        num_layers=depth, num_heads=heads, head_dim=hd,
        joint_attention_dim=jdim, pooled_projection_dim=pdim,
        pos_embed_max_size=8))
    got = np.asarray(model.apply(
        params, jnp.asarray(x.numpy()), jnp.asarray(y.numpy()),
        jnp.asarray(pooled.numpy()),
        jnp.asarray(t.numpy().astype(np.float32))))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)
