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


# --------------------------------------------------------------------------- #
# VAE parity (VERDICT r2 Next #4): the pixel path against the actual
# reference VAE files.
# --------------------------------------------------------------------------- #

def test_open_sora_vae_pipeline_parity():
    """VideoAutoencoderPipeline (autoencoder_kl_open_sora.py:621-761) vs
    OpenSoraVAE: spatial + temporal encoder MOMENTS and the full
    deterministic decode (17-frame chunk math + channel shift/scale +
    micro-batched spatial decode) on converted weights."""
    import diffusers_stub as D

    from videosys_tpu.models.autoencoders.autoencoder_open_sora import (
        SCALE, SHIFT, OpenSoraVAE, OpenSoraVAEConfig)
    from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D
    from videosys_tpu.models.autoencoders.vae_temporal import VAETemporal

    m = ref_torch.load("videosys.models.autoencoders.autoencoder_kl_open_sora")
    torch.manual_seed(0)
    # small spatial VAE via the stub's from_pretrained override; temporal VAE
    # is the real VAE_Temporal_SD architecture at full width (tiny inputs)
    D.AutoencoderKL.test_config = dict(
        block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
        latent_channels=4)
    try:
        cfg = m.VideoAutoencoderPipelineConfig(
            micro_frame_size=17, shift=list(SHIFT), scale=list(SCALE))
        ref = m.VideoAutoencoderPipeline(cfg).eval()
    finally:
        D.AutoencoderKL.test_config = None

    vae = OpenSoraVAE(
        OpenSoraVAEConfig(micro_frame_size=17, micro_batch_size=4),
        spatial=AutoencoderKL2D(block_out_channels=(8, 16),
                                layers_per_block=1, num_groups=4),
        temporal=VAETemporal(),
    )
    params = C.convert_open_sora_vae(_sd(ref), n_spatial_blocks=2)

    # --- spatial encoder moments ------------------------------------------ #
    x_img = torch.randn(3, 3, 12, 12)
    with torch.no_grad():
        want = ref.spatial_vae.module.encode(x_img).latent_dist.parameters.numpy()
    got = vae.spatial.apply(params["spatial"],
                            jnp.asarray(x_img.numpy().transpose(0, 2, 3, 1)),
                            method="encode")
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=2e-5, rtol=2e-5)

    # --- temporal encoder moments ----------------------------------------- #
    x_z = torch.randn(1, 4, 17, 4, 4)
    with torch.no_grad():
        post = ref.temporal_vae.encode(x_z)
    mean, logvar = vae.temporal.apply(
        params["temporal"], jnp.asarray(x_z.numpy().transpose(0, 2, 3, 4, 1)),
        method="encode_moments")
    np.testing.assert_allclose(np.asarray(mean).transpose(0, 4, 1, 2, 3),
                               post.mean.numpy(), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(logvar).transpose(0, 4, 1, 2, 3),
                               post.logvar.numpy(), atol=2e-5, rtol=2e-5)

    # --- full pipeline decode (deterministic end-to-end) ------------------- #
    num_frames = 34  # two 17-frame chunks -> exercises the chunk seams
    t_lat = ref.micro_z_frame_size * 2
    z = torch.randn(1, 4, t_lat, 4, 4)
    with torch.no_grad():
        want_dec = ref.decode(z, num_frames=num_frames).numpy()
    got_dec = np.asarray(vae.decode(params, jnp.asarray(z.numpy()),
                                    num_frames=num_frames))
    assert got_dec.shape == want_dec.shape
    np.testing.assert_allclose(got_dec, want_dec, atol=5e-5, rtol=5e-5)


def test_cogvideox_vae_parity():
    """AutoencoderKLCogVideoX (autoencoder_kl_cogvideox.py:872-1257) vs the
    TPU rebuild: encode moments + decode pixels on converted weights (causal
    replicate-pad convs, SpatialNorm3D decoder, temporal 4x compression)."""
    from videosys_tpu.models.autoencoders.autoencoder_cogvideox import (
        AutoencoderKLCogVideoX, CogVideoXVAEConfig)

    m = ref_torch.load("videosys.models.autoencoders.autoencoder_kl_cogvideox")
    torch.manual_seed(0)
    kw = dict(in_channels=3, out_channels=3,
              block_out_channels=(8, 16, 16, 16), latent_channels=4,
              layers_per_block=1, norm_num_groups=4,
              temporal_compression_ratio=4)
    ref = m.AutoencoderKLCogVideoX(**kw).eval()

    vae = AutoencoderKLCogVideoX(CogVideoXVAEConfig(
        latent_channels=4, block_out_channels=(8, 16, 16, 16),
        layers_per_block=1, norm_num_groups=4, temporal_compression_ratio=4))
    params = C.convert_cogvideox_vae(_sd(ref), n_blocks=4,
                                                   layers_per_block=1)

    # encode moments (deterministic part of encode)
    x = torch.randn(1, 3, 5, 32, 32)
    with torch.no_grad():
        want_m = ref.encode(x).latent_dist.parameters.numpy()
    xl = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    got_m = vae.encoder.apply(params["encoder"], xl)
    np.testing.assert_allclose(np.asarray(got_m).transpose(0, 4, 1, 2, 3),
                               want_m, atol=3e-5, rtol=3e-5)

    # decode — T=5 latent frames: the reference chunks [0:3] + [3:5] through
    # its per-conv caches (default framewise decode, :1095-1113); the
    # streaming path must reproduce the conv-cache threading exactly
    z = torch.randn(1, 4, 5, 4, 4)
    with torch.no_grad():
        want_d = ref.decode(z).sample.numpy()
    got_d = np.asarray(vae.decode(params, jnp.asarray(z.numpy())))
    assert got_d.shape == want_d.shape
    np.testing.assert_allclose(got_d, want_d, atol=1e-4, rtol=1e-4)
    # whole-axis (streaming=False) differs from the chunked reference only
    # through the per-chunk norm statistics — sanity-check it still runs
    whole = np.asarray(vae.decode(params, jnp.asarray(z.numpy()),
                                  streaming=False))
    assert whole.shape == want_d.shape


def test_osp_causal_vae_v110_parity():
    """OSP v1.1 CausalVAEModel (autoencoder_kl_open_sora_plan_v110.py
    :357-798) vs the registry-built CausalVAEModule: encode moments +
    decode on converted weights (CausalConv3d stack, AttnBlock3D mid,
    TimeDownsample2x avg-pool / TimeUpsample2x interpolation)."""
    from videosys_tpu.models.autoencoders.autoencoder_causal_vae import (
        CausalVAEConfig, CausalVAEModule)

    m = ref_torch.load(
        "videosys.models.autoencoders.autoencoder_kl_open_sora_plan_v110")
    torch.manual_seed(0)
    kw = dict(hidden_size=32, z_channels=4, embed_dim=4,
              hidden_size_mult=(1, 2), num_res_blocks=1, resolution=32,
              encoder_resnet_blocks=("ResnetBlock3D",) * 2,
              # downsamples live on NON-terminal levels only: the reference
              # encoder forward feeds `h` (last res block) into the mid
              # block, silently discarding a last-level downsample
              # (v110 :227-243) — released configs never have one there
              encoder_spatial_downsample=("SpatialDownsample2x", ""),
              encoder_temporal_downsample=("TimeDownsample2x", ""),
              decoder_resnet_blocks=("ResnetBlock3D",) * 2,
              decoder_spatial_upsample=("", "SpatialUpsample2x"),
              decoder_temporal_upsample=("", "TimeUpsample2x"))
    ref = m.CausalVAEModel(**kw).eval()

    cfg = CausalVAEConfig(
        hidden_size=32, z_channels=4, embed_dim=4, hidden_size_mult=(1, 2),
        num_res_blocks=1, resolution=32,
        encoder_resnet_blocks=("ResnetBlock3D",) * 2,
        encoder_spatial_downsample=("SpatialDownsample2x", ""),
        encoder_temporal_downsample=("TimeDownsample2x", ""),
        decoder_resnet_blocks=("ResnetBlock3D",) * 2,
        decoder_spatial_upsample=("", "SpatialUpsample2x"),
        decoder_temporal_upsample=("", "TimeUpsample2x"))
    module = CausalVAEModule(cfg)
    params = C.convert_causal_vae(_sd(ref), cfg)

    x = torch.randn(1, 3, 5, 16, 16)
    with torch.no_grad():
        want_m = ref.encode(x).parameters.numpy()
    got_m = module.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)),
                         method="encode_moments")
    np.testing.assert_allclose(np.asarray(got_m).transpose(0, 4, 1, 2, 3),
                               want_m, atol=3e-5, rtol=3e-5)

    z = torch.randn(1, 4, 2, 8, 8)
    with torch.no_grad():
        want_d = ref.decode(z).numpy()
    got_d = module.apply(params, jnp.asarray(z.numpy().transpose(0, 2, 3, 4, 1)),
                         method="decode")
    np.testing.assert_allclose(np.asarray(got_d).transpose(0, 4, 1, 2, 3),
                               want_d, atol=1e-4, rtol=1e-4)


def test_osp_causal_vae_v120_parity():
    """OSP v1.2 CausalVAEModel (autoencoder_kl_open_sora_plan_v120.py
    :741-1110): AttnBlock3DFix, Downsample (2D), Spatial2xTime2x3D
    down/upsample, SpatialUpsample2x."""
    from videosys_tpu.models.autoencoders.autoencoder_causal_vae import (
        CausalVAEConfig, CausalVAEModule)

    m = ref_torch.load(
        "videosys.models.autoencoders.autoencoder_kl_open_sora_plan_v120")
    torch.manual_seed(0)
    kw = dict(hidden_size=32, z_channels=4, embed_dim=4,
              hidden_size_mult=(1, 1, 2), num_res_blocks=1, resolution=32,
              encoder_attention="AttnBlock3DFix",
              decoder_attention="AttnBlock3DFix",
              encoder_resnet_blocks=("ResnetBlock3D",) * 3,
              encoder_spatial_downsample=(
                  "Downsample", "Spatial2xTime2x3DDownsample", ""),
              encoder_temporal_downsample=("", "", ""),
              decoder_resnet_blocks=("ResnetBlock3D",) * 3,
              decoder_spatial_upsample=(
                  "", "Spatial2xTime2x3DUpsample", "SpatialUpsample2x"),
              decoder_temporal_upsample=("", "", ""))
    ref = m.CausalVAEModel(**kw).eval()

    cfg = CausalVAEConfig.v120(
        hidden_size=32, z_channels=4, embed_dim=4, hidden_size_mult=(1, 1, 2),
        num_res_blocks=1, resolution=32,
        encoder_resnet_blocks=("ResnetBlock3D",) * 3,
        encoder_spatial_downsample=(
            "Downsample", "Spatial2xTime2x3DDownsample", ""),
        decoder_resnet_blocks=("ResnetBlock3D",) * 3,
        decoder_spatial_upsample=(
            "", "Spatial2xTime2x3DUpsample", "SpatialUpsample2x"))
    module = CausalVAEModule(cfg)
    params = C.convert_causal_vae(_sd(ref), cfg)

    x = torch.randn(1, 3, 5, 16, 16)
    with torch.no_grad():
        want_m = ref.encode(x).parameters.numpy()
    got_m = module.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)),
                         method="encode_moments")
    np.testing.assert_allclose(np.asarray(got_m).transpose(0, 4, 1, 2, 3),
                               want_m, atol=3e-5, rtol=3e-5)

    z = torch.randn(1, 4, 2, 4, 4)
    with torch.no_grad():
        want_d = ref.decode(z).numpy()
    got_d = module.apply(params, jnp.asarray(z.numpy().transpose(0, 2, 3, 4, 1)),
                         method="decode")
    np.testing.assert_allclose(np.asarray(got_d).transpose(0, 4, 1, 2, 3),
                               want_d, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("use_rope", [False, True])
def test_osp_v110_transformer_parity(use_rope):
    """VERDICT r2 Next #5: the 57-LoC OSP v1.1 alias must be backed by
    parity against the ACTUAL open_sora_plan_v110_transformer_3d.py (its own
    RoPE2D/1D :136-283, LatteT2V :2123) — not just the Latte proxy. Covers
    both the plain and the use_rope checkpoint variants."""
    m = ref_torch.load(
        "videosys.models.transformers.open_sora_plan_v110_transformer_3d")
    torch.manual_seed(4)
    heads, hd, depth, cap = 2, 16, 2, 16
    B, T, H, W, L = 2, 3, 16, 16, 6
    ref = _stub_pm(m.LatteT2V(
        num_attention_heads=heads, attention_head_dim=hd, in_channels=4,
        out_channels=8, num_layers=depth, cross_attention_dim=heads * hd,
        sample_size=(H // 2, W // 2), patch_size=2,
        activation_fn="gelu-approximate", num_embeds_ada_norm=1000,
        norm_type="ada_norm_single", attention_bias=True,
        caption_channels=cap, video_length=T, attention_mode="math",
        use_rope=use_rope, model_max_length=8).eval())

    x = torch.randn(B, 4, T, H, W)
    t = torch.full((B,), 500, dtype=torch.long)
    y = torch.randn(B, L, cap)
    with torch.no_grad():
        # v110 carries the image-joint-training axis: y is [B, 1, L, D]
        want = ref(x, t, encoder_hidden_states=y.unsqueeze(1),
                   enable_temporal_attentions=True, return_dict=False)[0].numpy()

    from videosys_tpu.models.transformers.open_sora_plan_v110 import (
        OpenSoraPlanV110Config, OpenSoraPlanV110Transformer)

    cfg = OpenSoraPlanV110Config(
        use_rope=use_rope, num_layers=depth, num_heads=heads, head_dim=hd,
        caption_channels=cap, video_length=T, sample_size=H // 2,
        learned_sigma=True)
    params = C.convert_latte(_sd(ref), depth=depth)
    model = OpenSoraPlanV110Transformer(cfg)
    got = np.asarray(model.apply(
        params, jnp.asarray(x.numpy()),
        jnp.asarray(t.numpy().astype(np.float32)), jnp.asarray(y.numpy())))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
