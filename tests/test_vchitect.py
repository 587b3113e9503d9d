"""Vchitect family tests: flow-match scheduler, MMDiT transformer (incl PAB
equivalence + single-frame temporal zeroing), pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosys_tpu import VchitectConfig, VideoSysEngine
from videosys_tpu.core.pab import PABConfig, PABStepPlan
from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D
from videosys_tpu.models.transformers.vchitect import (
    VchitectModelConfig,
    VchitectXLTransformer,
)
from videosys_tpu.schedulers.flow_match_euler import (
    FlowMatchEulerConfig,
    FlowMatchEulerScheduler,
)


# --------------------------------------------------------------------------- #
def test_flow_match_sigma_ladder():
    s = FlowMatchEulerScheduler()
    ts = s.set_timesteps(10)
    assert len(ts) == 10 and len(s.sigmas) == 11
    assert s.sigmas[0] == pytest.approx(1.0)
    assert s.sigmas[-1] == 0.0
    assert (np.diff(s.sigmas) < 0).all()
    # shifted variant stretches toward high noise
    s3 = FlowMatchEulerScheduler(FlowMatchEulerConfig(shift=3.0))
    s3.set_timesteps(10)
    assert s3.sigmas[5] > s.sigmas[5]


def test_flow_match_recovers_x0_with_oracle_velocity():
    """x_sigma = (1-sigma) x0 + sigma e; the true velocity dx/dsigma = e - x0
    must integrate exactly to x0 (the update is linear in sigma)."""
    s = FlowMatchEulerScheduler()
    s.set_timesteps(25)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3)), jnp.float32)
    e = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3)), jnp.float32)
    x = e  # sigma_max = 1 -> pure noise
    for i in range(25):
        x = s.step(e - x0, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-5)


def test_flow_match_scale_noise():
    s = FlowMatchEulerScheduler()
    s.set_timesteps(4)
    x0 = jnp.ones((2, 2))
    e = jnp.zeros((2, 2))
    sig = float(s.sigmas[1])
    np.testing.assert_allclose(np.asarray(s.scale_noise(x0, e, 1)),
                               (1 - sig) * np.ones((2, 2)), rtol=1e-6)


# --------------------------------------------------------------------------- #
def tiny_cfg(**kw):
    return VchitectModelConfig(
        num_layers=3, num_heads=2, head_dim=16, joint_attention_dim=32,
        pooled_projection_dim=24, sample_size=8, pos_embed_max_size=12, **kw)


def _inputs(F=4):
    return (jnp.ones((1, F, 16, 16, 16)) * 0.1, jnp.ones((1, 6, 32)),
            jnp.ones((1, 24)), jnp.array([500.0]))


def test_vchitect_transformer_shapes():
    m = VchitectXLTransformer(tiny_cfg())
    x, enc, pooled, t = _inputs()
    p = m.init(jax.random.key(0), x, enc, pooled, t)
    out = m.apply(p, x, enc, pooled, t)
    assert out.shape == (1, 4, 16, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_vchitect_single_frame_zeroes_temporal():
    """cur_frame == 1 zeroes the temporal contribution (:924-936): the output
    must be identical whichever temporal projection weights are used."""
    cfg = tiny_cfg()
    m = VchitectXLTransformer(cfg)
    x, enc, pooled, t = _inputs(F=1)
    p = m.init(jax.random.key(0), x, enc, pooled, t)
    out1 = m.apply(p, x, enc, pooled, t)
    # zero all temporal projections; single-frame output must not change
    p2 = jax.tree_util.tree_map_with_path(
        lambda path, v: (jnp.zeros_like(v)
                         if any("temp" in str(k) for k in path) else v), p)
    out2 = m.apply(p2, x, enc, pooled, t)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_vchitect_pab_cache_equivalence():
    cfg = tiny_cfg()
    pab = PABConfig(
        spatial_broadcast=True, spatial_threshold=(100, 800), spatial_range=2,
        temporal_broadcast=True, temporal_threshold=(100, 800), temporal_range=4,
        cross_broadcast=True, cross_threshold=(100, 800), cross_range=6)
    x, enc, pooled, t = _inputs()
    m = VchitectXLTransformer(cfg, pab_config=pab)
    cache = m.init_cache(1, 4, 64, 6)
    p = m.init(jax.random.key(0), x, enc, pooled, t, pab_cache=cache)
    out_dense, cache = m.apply(p, x, enc, pooled, t, pab_cache=cache)
    m_b = VchitectXLTransformer(cfg, pab_config=pab, plan=PABStepPlan(
        spatial=True, temporal=True, cross=True))
    out_bcast, _ = m_b.apply(p, x, enc, pooled, t, pab_cache=cache)
    np.testing.assert_allclose(np.asarray(out_bcast), np.asarray(out_dense),
                               atol=1e-5)


def test_vchitect_pab_fp8_cache_close_to_dense():
    """fp8 PAB cache (family_bench's benched config) must store float8 slots
    and keep the broadcast output within quantization error of dense."""
    cfg = tiny_cfg()
    pab = PABConfig(
        spatial_broadcast=True, spatial_threshold=(100, 800), spatial_range=2,
        temporal_broadcast=True, temporal_threshold=(100, 800),
        temporal_range=4, cross_broadcast=True, cross_threshold=(100, 800),
        cross_range=6, cache_dtype="float8_e4m3fn")
    x, enc, pooled, t = _inputs()
    m = VchitectXLTransformer(cfg, pab_config=pab)
    cache = m.init_cache(1, 4, 64, 6)
    assert {str(a.dtype) for a in jax.tree.leaves(cache)} == {"float8_e4m3fn"}
    p = m.init(jax.random.key(0), x, enc, pooled, t, pab_cache=cache)
    out_dense, cache = m.apply(p, x, enc, pooled, t, pab_cache=cache)
    assert {str(a.dtype) for a in jax.tree.leaves(cache)} == {"float8_e4m3fn"}
    m_b = VchitectXLTransformer(cfg, pab_config=pab, plan=PABStepPlan(
        spatial=True, temporal=True, cross=True))
    out_bcast, _ = m_b.apply(p, x, enc, pooled, t, pab_cache=cache)
    assert float(np.abs(np.asarray(out_bcast - out_dense)).max()) < 0.2


# --------------------------------------------------------------------------- #
def _tiny_pipeline_cfg(**kw):
    return VchitectConfig(
        dtype="fp32",
        transformer_config=tiny_cfg(),
        vae=AutoencoderKL2D(mid_block_add_attention=False,
                        latent_channels=16, block_out_channels=(8, 16),
                            layers_per_block=1, num_groups=4), **kw)


def test_vchitect_pipeline_generate(tmp_path):
    engine = VideoSysEngine(_tiny_pipeline_cfg())
    out = engine.generate("a ship sailing at dawn", num_inference_steps=4,
                          width=32, height=32, frames=4, seed=0)
    v = out.video
    assert v.shape == (1, 4, 32, 32, 3) and v.dtype == np.uint8
    assert engine.save_video(v[0], str(tmp_path / "vchitect"))


def test_vchitect_pipeline_pab():
    engine = VideoSysEngine(_tiny_pipeline_cfg(enable_pab=True))
    out = engine.generate("waves", num_inference_steps=6,
                          width=32, height=32, frames=4, seed=0)
    assert out.video.dtype == np.uint8


def test_sd3_packing_shapes():
    """pack_sd3_embeds mirrors the reference packing (pipeline_vchitect.py
    :486-498): CLIP concat -> pad to T5 width -> seq concat; pooled concat."""
    import jax.numpy as jnp

    from videosys_tpu.models.text_encoders.clip import pack_sd3_embeds

    B = 2
    emb_l = jnp.ones((B, 77, 768))
    emb_g = jnp.full((B, 77, 1280), 2.0)
    t5 = jnp.full((B, 256, 4096), 3.0)
    pool_l = jnp.ones((B, 768))
    pool_g = jnp.ones((B, 1280))
    embeds, pooled = pack_sd3_embeds(emb_l, pool_l, emb_g, pool_g, t5)
    assert embeds.shape == (B, 77 + 256, 4096)
    assert pooled.shape == (B, 2048)
    # clip rows: [L | G | zero pad]
    assert float(embeds[0, 0, 0]) == 1.0
    assert float(embeds[0, 0, 768]) == 2.0
    assert float(embeds[0, 0, 2048]) == 0.0
    assert float(embeds[0, 77, 0]) == 3.0  # t5 rows


def test_clip_wrapper_gated_offline():
    """Without local weights the wrapper must raise cleanly (not hang on
    network)."""
    import pytest as _pytest

    from videosys_tpu.models.text_encoders.clip import ClipTextEncoder

    with _pytest.raises(Exception):
        ClipTextEncoder("/nonexistent/Vchitect-2.0-2B")


def test_vchitect_sp_equivalence():
    """DSP sharding on the fake 8-device mesh must not change the math
    (the shard_* constraint flips are pure reshardings)."""
    from videosys_tpu.core.parallel import ParallelConfig, build_mesh, use_mesh

    m = VchitectXLTransformer(tiny_cfg())
    x, enc, pooled, t = _inputs(F=8)
    p = m.init(jax.random.key(0), x, enc, pooled, t)
    fn = jax.jit(lambda p, x, e, pl, t: m.apply(p, x, e, pl, t))
    ref = fn(p, x, enc, pooled, t)
    mesh = build_mesh(ParallelConfig(dp_size=1, cp_size=1, sp_size=8))
    with use_mesh(mesh):
        out = fn(p, x, enc, pooled, t)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-5, rtol=1e-5)
