"""Open-Sora-Plan family tests: schedulers (PNDM, Euler-Ancestral),
v1.1/v1.2 transformers, CausalVAE (incl. causality + tiling), pipelines.

Mirrors the reference smoke coverage
(tests/pipelines/open_sora_plan/test_open_sora_plan.py) plus functional
scheduler-convergence and VAE-causality tests the reference lacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosys_tpu import OpenSoraPlanConfig, VideoSysEngine
from videosys_tpu.core.pab import PABConfig, PABStepPlan
from videosys_tpu.models.autoencoders.autoencoder_causal_vae import (
    CausalVAE,
    CausalVAEConfig,
)
from videosys_tpu.models.transformers.open_sora_plan_v110 import (
    OpenSoraPlanV110Config,
    OpenSoraPlanV110Transformer,
)
from videosys_tpu.models.transformers.open_sora_plan_v120 import (
    OpenSoraPlanV120Config,
    OpenSoraPlanV120Transformer,
)
from videosys_tpu.schedulers.euler_ancestral import EulerAncestralScheduler
from videosys_tpu.schedulers.pndm import PNDMScheduler


# --------------------------------------------------------------------------- #
# Schedulers
# --------------------------------------------------------------------------- #
def _eps_model(scheduler, x0):
    """Oracle epsilon model: returns the true noise for a given sample under
    q(x_t | x_0), so any correct epsilon-integrator must walk back to x0."""

    def model(sample, t):
        a = float(scheduler.alphas_cumprod[int(t)])
        return (sample - a**0.5 * x0) / (1 - a) ** 0.5

    return model


def test_pndm_timestep_layout():
    s = PNDMScheduler()
    ts = s.set_timesteps(10)
    # PRK warmup: (order*2 entries -> repeat -> trim) = 12; PLMS: N-3 = 7
    assert len(s.prk_timesteps) == 12
    assert len(s.plms_timesteps) == 7
    assert len(ts) == 19
    assert (ts >= 0).all() and (ts < 1000).all()


def test_pndm_converges_to_x0():
    s = PNDMScheduler()
    ts = s.set_timesteps(50)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3)), jnp.float32)
    model = _eps_model(s, x0)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3)), jnp.float32)
    for t in ts:
        x = s.step(model(x, t), int(t), x)
    # terminal state is x_{-dt} = sqrt(acp[0]) x0 + sqrt(1-acp[0]) e: PNDM's
    # set_alpha_to_one=False keeps sqrt(1e-4) = 1% residual noise by design
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=4e-2)


def test_pndm_skip_prk_layout():
    from videosys_tpu.schedulers.pndm import PNDMConfig

    s = PNDMScheduler(PNDMConfig(skip_prk_steps=True))
    ts = s.set_timesteps(10)
    assert len(s.prk_timesteps) == 0
    assert len(ts) == 11  # first plms step repeated


def test_euler_ancestral_converges_to_x0():
    s = EulerAncestralScheduler()
    ts = s.set_timesteps(30)
    assert s.init_noise_sigma == pytest.approx(float(s.sigmas.max()))
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3)), jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3)), jnp.float32)
    x = x * s.init_noise_sigma
    key = jax.random.key(0)
    for i, t in enumerate(ts):
        xs = s.scale_model_input(x, i)
        a = float(s.alphas_cumprod[int(t)])
        eps = (xs - a**0.5 * x0) / (1 - a) ** 0.5
        key, sub = jax.random.split(key)
        x = s.step(eps, i, x, key=sub)
    # ancestral noise keeps it stochastic; loose tolerance
    assert float(jnp.abs(x - x0).max()) < 0.35


def test_euler_ancestral_scale_model_input():
    s = EulerAncestralScheduler()
    s.set_timesteps(10)
    x = jnp.ones((2, 2))
    sig = float(s.sigmas[0])
    np.testing.assert_allclose(
        np.asarray(s.scale_model_input(x, 0)),
        np.asarray(x) / (sig**2 + 1) ** 0.5, rtol=1e-6)


# --------------------------------------------------------------------------- #
# Transformers
# --------------------------------------------------------------------------- #
def tiny_v120(**kw):
    return OpenSoraPlanV120Config(
        num_layers=2, num_heads=2, head_dim=24, caption_channels=32,
        sample_size=(8, 8), sample_size_t=3, **kw)


def test_v120_transformer_shapes_and_rope():
    x = jnp.ones((2, 4, 3, 16, 16))
    enc = jnp.ones((2, 8, 32))
    t = jnp.array([500.0, 500.0])
    for use_rope in (True, False):
        cfg = tiny_v120(use_rope=use_rope)
        m = OpenSoraPlanV120Transformer(cfg)
        p = m.init(jax.random.key(0), x, enc, t)
        out = m.apply(p, x, enc, t)
        assert out.shape == (2, 4, 3, 16, 16)
        assert np.isfinite(np.asarray(out)).all()


def test_v120_pab_cache_equivalence():
    """Broadcast step with a fresh cache saved at the previous step must
    reproduce the previous step's attention contribution exactly."""
    cfg = tiny_v120()
    pab = PABConfig(spatial_broadcast=True, spatial_threshold=(100, 850),
                    spatial_range=2, cross_broadcast=True,
                    cross_threshold=(100, 850), cross_range=6)
    x = jax.random.normal(jax.random.key(1), (1, 4, 3, 16, 16))
    enc = jax.random.normal(jax.random.key(2), (1, 8, 32))
    t = jnp.array([500.0])

    m_save = OpenSoraPlanV120Transformer(cfg, pab_config=pab)
    cache = m_save.init_cache(1, 3 * 8 * 8)
    p = m_save.init(jax.random.key(0), x, enc, t, pab_cache=cache)
    out_dense, cache = m_save.apply(p, x, enc, t, pab_cache=cache)

    # same timestep, broadcast plan -> must equal the dense output
    m_bcast = OpenSoraPlanV120Transformer(
        cfg, pab_config=pab, plan=PABStepPlan(spatial=True, cross=True))
    out_bcast, _ = m_bcast.apply(p, x, enc, t, pab_cache=cache)
    np.testing.assert_allclose(np.asarray(out_bcast), np.asarray(out_dense),
                               atol=1e-5)


def test_v120_pab_fp8_cache_close_to_dense():
    """fp8 PAB cache (family_bench's benched config) must store float8 slots
    and keep the broadcast output within quantization error of dense."""
    cfg = tiny_v120()
    pab = PABConfig(spatial_broadcast=True, spatial_threshold=(100, 850),
                    spatial_range=2, cross_broadcast=True,
                    cross_threshold=(100, 850), cross_range=6,
                    cache_dtype="float8_e4m3fn")
    x = jax.random.normal(jax.random.key(1), (1, 4, 3, 16, 16))
    enc = jax.random.normal(jax.random.key(2), (1, 8, 32))
    t = jnp.array([500.0])

    m_save = OpenSoraPlanV120Transformer(cfg, pab_config=pab)
    cache = m_save.init_cache(1, 3 * 8 * 8)
    assert {str(a.dtype) for a in jax.tree.leaves(cache)} == {"float8_e4m3fn"}
    p = m_save.init(jax.random.key(0), x, enc, t, pab_cache=cache)
    out_dense, cache = m_save.apply(p, x, enc, t, pab_cache=cache)
    assert {str(a.dtype) for a in jax.tree.leaves(cache)} == {"float8_e4m3fn"}

    m_bcast = OpenSoraPlanV120Transformer(
        cfg, pab_config=pab, plan=PABStepPlan(spatial=True, cross=True))
    out_bcast, _ = m_bcast.apply(p, x, enc, t, pab_cache=cache)
    assert float(np.abs(np.asarray(out_bcast - out_dense)).max()) < 0.2


def test_v110_transformer_shapes():
    cfg = OpenSoraPlanV110Config(num_layers=2, num_heads=2, head_dim=24,
                                 caption_channels=32, sample_size=16,
                                 video_length=3, use_rope=True)
    m = OpenSoraPlanV110Transformer(cfg)
    x = jnp.ones((2, 4, 3, 16, 16))
    p = m.init(jax.random.key(0), x, jnp.zeros((2,)), jnp.ones((2, 8, 32)))
    out = m.apply(p, x, jnp.zeros((2,)), jnp.ones((2, 8, 32)))
    assert out.shape == (2, 8, 3, 16, 16)  # learned sigma


# --------------------------------------------------------------------------- #
# CausalVAE
# --------------------------------------------------------------------------- #
def tiny_vae_cfg(**kw):
    return CausalVAEConfig(
        hidden_size=8, hidden_size_mult=(1, 2), num_res_blocks=1,
        encoder_resnet_blocks=("ResnetBlock3D",) * 2,
        encoder_spatial_downsample=("SpatialDownsample2x", ""),
        encoder_temporal_downsample=("TimeDownsample2x", ""),
        decoder_resnet_blocks=("ResnetBlock3D",) * 2,
        decoder_spatial_upsample=("", "SpatialUpsample2x"),
        decoder_temporal_upsample=("", "TimeUpsample2x"), **kw)


def test_causal_vae_roundtrip_shapes():
    vae = CausalVAE(tiny_vae_cfg(), version="v110")
    params = vae.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 3, 5, 16, 16)) * 0.2
    z = vae.encode(params, x, sample=False)
    assert z.shape == (1, 4, 3, 8, 8)  # (5-1)/2+1 temporal, /2 spatial
    out = vae.decode(params, z)
    assert out.shape == (1, 3, 5, 16, 16)


def test_causal_conv3d_is_causal():
    """Output frame t must not depend on input frames > t (first-frame
    replicate padding + VALID time conv). Note the full encoder is NOT
    strictly frame-causal — GroupNorm statistics span the time axis, exactly
    as torch GroupNorm does in the reference — so causality is an op-level
    property here, matching reference semantics."""
    from videosys_tpu.models.autoencoders.autoencoder_causal_vae import (
        CausalConv3d,
    )

    conv = CausalConv3d(6)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 5, 8, 8, 3)), jnp.float32)
    p = conv.init(jax.random.key(0), x)
    x2 = x.at[:, 3:].set(-x[:, 3:])  # perturb tail frames only
    y1 = conv.apply(p, x)
    y2 = conv.apply(p, x2)
    np.testing.assert_allclose(np.asarray(y1[:, :3]), np.asarray(y2[:, :3]),
                               atol=1e-6)
    assert np.abs(np.asarray(y1[:, 3:] - y2[:, 3:])).max() > 1e-3
    # time-downsample keeps frame 0 a function of frame 0 only
    from videosys_tpu.models.autoencoders.autoencoder_causal_vae import (
        TimeDownsample2x,
    )

    td = TimeDownsample2x()
    pd = td.init(jax.random.key(0), x)
    d1 = td.apply(pd, x)
    d2 = td.apply(pd, x2)
    np.testing.assert_allclose(np.asarray(d1[:, 0]), np.asarray(d2[:, 0]),
                               atol=1e-6)


def test_causal_vae_v120_ops():
    cfg = CausalVAEConfig(
        hidden_size=8, hidden_size_mult=(1, 2), num_res_blocks=1,
        encoder_attention="AttnBlock3DFix", decoder_attention="AttnBlock3DFix",
        encoder_resnet_blocks=("ResnetBlock3D",) * 2,
        encoder_spatial_downsample=("Downsample", "Spatial2xTime2x3DDownsample"),
        encoder_temporal_downsample=("", ""),
        decoder_resnet_blocks=("ResnetBlock3D",) * 2,
        decoder_spatial_upsample=("Spatial2xTime2x3DUpsample", "SpatialUpsample2x"),
        decoder_temporal_upsample=("", ""))
    vae = CausalVAE(cfg, version="v120")
    params = vae.init(jax.random.key(0))
    x = jnp.ones((1, 3, 5, 16, 16)) * 0.3
    z = vae.encode(params, x, sample=False)
    assert z.shape == (1, 4, 3, 4, 4)
    out = vae.decode(params, z)
    assert out.shape == (1, 3, 5, 16, 16)


def test_causal_vae_tiled_decode_matches_shape():
    vae = CausalVAE(tiny_vae_cfg(), version="v110")
    params = vae.init(jax.random.key(0))
    # force tiling with tiny tile sizes
    vae.use_tiling = True
    vae.tile_latent_min_size = 4
    vae.tile_sample_min_size = 8
    vae.tile_latent_min_size_t = 3
    z = jax.random.normal(jax.random.key(2), (1, 4, 5, 8, 8)) * 0.2
    out = vae.decode(params, z)
    assert out.shape == (1, 3, 9, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


# --------------------------------------------------------------------------- #
# Pipeline
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("version,ttype", [("v110", "65x512x512"),
                                           ("v120", "29x480p")])
def test_pipeline_generate(version, ttype, tmp_path):
    if version == "v110":
        tcfg = OpenSoraPlanV110Config(num_layers=2, num_heads=2, head_dim=24,
                                      caption_channels=32, sample_size=16,
                                      video_length=3)
    else:
        tcfg = tiny_v120()
    cfg = OpenSoraPlanConfig(
        version=version, transformer_type=ttype, dtype="fp32",
        enable_tiling=False, transformer_config=tcfg,
        vae=CausalVAE(tiny_vae_cfg(), version=version),
    )
    engine = VideoSysEngine(cfg)
    out = engine.generate("sunset over the sea", num_inference_steps=4, seed=0)
    v = out.video
    assert v.dtype == np.uint8 and v.ndim == 5
    assert v.shape[0] == 1 and v.shape[4] == 3
    p = engine.save_video(v[0], str(tmp_path / "osp"))
    assert p


def test_pipeline_generate_pab():
    tcfg = tiny_v120()
    cfg = OpenSoraPlanConfig(
        version="v120", transformer_type="29x480p", dtype="fp32",
        enable_tiling=False, enable_pab=True, transformer_config=tcfg,
        vae=CausalVAE(tiny_vae_cfg(), version="v120"),
    )
    engine = VideoSysEngine(cfg)
    out = engine.generate("waves", num_inference_steps=6, seed=0)
    assert out.video.dtype == np.uint8


def test_v120_sp_equivalence():
    """Ulysses SP on the fake 8-device mesh must not change the math."""
    from videosys_tpu.core.parallel import ParallelConfig, build_mesh, use_mesh
    from videosys_tpu.models.transformers.open_sora_plan_v120 import (
        OpenSoraPlanV120Transformer,
    )

    x = jnp.ones((1, 4, 3, 16, 16)) * 0.1
    enc = jnp.ones((1, 8, 32))
    t = jnp.array([500.0])
    m = OpenSoraPlanV120Transformer(tiny_v120())
    p = m.init(jax.random.key(0), x, enc, t)
    fn = jax.jit(lambda p, x, e, t: m.apply(p, x, e, t))
    ref = fn(p, x, enc, t)
    mesh = build_mesh(ParallelConfig(dp_size=1, cp_size=1, sp_size=8))
    with use_mesh(mesh):
        out = fn(p, x, enc, t)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-5, rtol=1e-5)


def test_osp_text_kv_bucket_is_exact():
    """Static text-KV bucketing must be exact for OSP v1.2's masked
    cross-attention (pipelines/common.py). ±1 uint8 wobble allowed — XLA
    may reassociate the shorter reductions differently."""
    tcfg = tiny_v120()
    cfg = OpenSoraPlanConfig(
        version="v120", transformer_type="29x480p", dtype="fp32",
        enable_tiling=False, transformer_config=tcfg,
        vae=CausalVAE(tiny_vae_cfg(), version="v120"),
    )
    engine = VideoSysEngine(cfg)
    pipe = engine.driver_worker
    a = engine.generate("sunset over the sea", num_inference_steps=2,
                        seed=0).video
    assert pipe.last_text_kv_len == 64  # 512-token stub -> the 64 bucket
    pipe._config.text_kv_bucket = False
    b = engine.generate("sunset over the sea", num_inference_steps=2,
                        seed=0).video
    assert pipe.last_text_kv_len == 512
    diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
    assert diff.max() <= 1 and (diff != 0).mean() < 1e-3, (
        diff.max(), (diff != 0).mean())
