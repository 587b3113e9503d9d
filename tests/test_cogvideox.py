"""CogVideoX transformer tests (tiny configs, both 2B and 5B variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosys_tpu.core.parallel import ParallelConfig, build_mesh, use_mesh
from videosys_tpu.models.transformers.cogvideox import (
    CogVideoXConfig,
    CogVideoXTransformer3D,
    pos_embed_3d,
    rope_3d,
)

TINY_2B = CogVideoXConfig(num_layers=2, num_heads=4, head_dim=16,
                          in_channels=4, out_channels=4, time_embed_dim=32,
                          text_embed_dim=16, max_text_seq_length=8,
                          use_rotary_positional_embeddings=False)
TINY_5B = CogVideoXConfig(num_layers=2, num_heads=4, head_dim=16,
                          in_channels=4, out_channels=4, time_embed_dim=32,
                          text_embed_dim=16, max_text_seq_length=8,
                          use_rotary_positional_embeddings=True)


def _inputs(B=2, F=2, H=8, W=8, L=8):
    ks = jax.random.split(jax.random.key(0), 2)
    x = jax.random.normal(ks[0], (B, F, 4, H, W))
    enc = jax.random.normal(ks[1], (B, L, 16))
    t = jnp.array([500.0] * B)
    return x, enc, t


@pytest.mark.parametrize("cfg", [TINY_2B, TINY_5B], ids=["2b", "5b"])
def test_forward_shape(cfg):
    model = CogVideoXTransformer3D(cfg)
    x, enc, t = _inputs()
    params = model.init(jax.random.key(0), x, enc, t)
    out = model.apply(params, x, enc, t)
    assert out.shape == (2, 2, 4, 8, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pab_cache_roundtrip():
    from videosys_tpu.core.pab import PABConfig, PABStepPlan

    pab = PABConfig(spatial_broadcast=True, spatial_threshold=(100, 900),
                    spatial_range=2)
    x, enc, t = _inputs()
    m_compute = CogVideoXTransformer3D(TINY_2B, plan=PABStepPlan(),
                                       pab_config=pab)
    params = m_compute.init(jax.random.key(0), x, enc, t)
    cache = m_compute.init_cache(B=2, N_video=2 * 16, L=8)
    out1, cache1 = m_compute.apply(params, x, enc, t, pab_cache=cache)
    m_bcast = CogVideoXTransformer3D(TINY_2B, plan=PABStepPlan(spatial=True),
                                     pab_config=pab)
    out2, _ = m_bcast.apply(params, x, enc, t, pab_cache=cache1)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_pab_fp8_cache_roundtrip():
    """fp8 PAB cache (the configuration family_bench benches) must store
    float8 slots and keep the broadcast output within quantization error of
    the dense pass (advisor r4: the benched config was untested here)."""
    from videosys_tpu.core.pab import PABConfig, PABStepPlan

    pab = PABConfig(spatial_broadcast=True, spatial_threshold=(100, 900),
                    spatial_range=2, cache_dtype="float8_e4m3fn")
    x, enc, t = _inputs()
    m_compute = CogVideoXTransformer3D(TINY_2B, plan=PABStepPlan(),
                                       pab_config=pab)
    params = m_compute.init(jax.random.key(0), x, enc, t)
    cache = m_compute.init_cache(B=2, N_video=2 * 16, L=8)
    assert {str(a.dtype) for a in jax.tree.leaves(cache)} == {"float8_e4m3fn"}
    out1, cache1 = m_compute.apply(params, x, enc, t, pab_cache=cache)
    assert {str(a.dtype) for a in jax.tree.leaves(cache1)} == {"float8_e4m3fn"}
    m_bcast = CogVideoXTransformer3D(TINY_2B, plan=PABStepPlan(spatial=True),
                                     pab_config=pab)
    out2, _ = m_bcast.apply(params, x, enc, t, pab_cache=cache1)
    assert float(np.abs(np.asarray(out2 - out1)).max()) < 0.2


def test_ulysses_sp_equivalence():
    model = CogVideoXTransformer3D(TINY_5B)
    x, enc, t = _inputs(F=4, H=8, W=8)
    params = model.init(jax.random.key(0), x, enc, t)
    fn = jax.jit(lambda p, x, e, t: model.apply(p, x, e, t))
    ref = fn(params, x, enc, t)
    mesh = build_mesh(ParallelConfig(dp_size=1, cp_size=1, sp_size=8))
    with use_mesh(mesh):
        out = fn(params, x, enc, t)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-5, rtol=1e-5)


def test_rope_3d_shapes():
    cos, sin = rope_3d(64, 3, 4, 5)
    assert cos.shape == (60, 64) and sin.shape == (60, 64)
    # interleaved pairs: adjacent channels share the same frequency angle
    np.testing.assert_allclose(cos[:, 0], cos[:, 1])


def test_pos_embed_3d_shape():
    pos = pos_embed_3d(64, 3, 4, 5, 1.875, 1.0)
    assert pos.shape == (60, 64)
    # first quarter is temporal: constant across spatial positions at fixed t
    np.testing.assert_allclose(pos[0, :16], pos[19, :16], atol=1e-6)
