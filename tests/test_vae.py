"""Open-Sora VAE tests (tiny configs): shapes, causality, chunking math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosys_tpu.models.autoencoders.autoencoder_open_sora import (
    OpenSoraVAE,
    OpenSoraVAEConfig,
)
from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D
from videosys_tpu.models.autoencoders.vae_temporal import VAETemporal

TINY_2D = AutoencoderKL2D(block_out_channels=(8, 16), layers_per_block=1, num_groups=4)
TINY_T = VAETemporal(filters=8, num_res_blocks=1, channel_multipliers=(1, 2, 2, 4),
                     num_groups=4)


def _tiny_temporal(**kw):
    return VAETemporal(filters=8, num_res_blocks=1,
                       channel_multipliers=(1, 2, 2, 4), num_groups=4, **kw)


def test_vae2d_roundtrip_shapes():
    # 2-block tiny VAE: downsample 2x once -> latent H/2
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    params = TINY_2D.init(jax.random.key(1), x, jax.random.key(2))
    moments = TINY_2D.apply(params, x, method="encode")
    assert moments.shape == (2, 8, 8, 8)  # 2 blocks -> /2, 2*latent=8
    z = moments[..., :4]
    y = TINY_2D.apply(params, z, method="decode")
    assert y.shape == (2, 16, 16, 3)


def test_vae_temporal_shapes():
    model = _tiny_temporal()
    x = jnp.zeros((1, 17, 8, 8, 4))
    params = model.init(jax.random.key(0), x, jax.random.key(1))
    mean, logvar = model.apply(params, x, method="encode_moments")
    # 17 frames pad to 20, /4 -> 5 latent frames; spatial unchanged
    assert mean.shape == (1, 5, 8, 8, 4)
    y = model.apply(params, mean, 17, method="decode")
    assert y.shape == (1, 17, 8, 8, 4)


def test_causal_conv_is_causal():
    """CausalConv3d: output at frame t must not depend on frames > t.
    (Note: the full VAE is only conv-causal — GroupNorm statistics span all
    frames, in the reference too, autoencoder_kl_open_sora.py:144.)"""
    from videosys_tpu.models.autoencoders.vae_temporal import CausalConv3d

    conv = CausalConv3d(4, (3, 3, 3))
    x = jax.random.normal(jax.random.key(0), (1, 8, 4, 4, 4))
    params = conv.init(jax.random.key(1), x)
    y1 = conv.apply(params, x)
    x2 = x.at[:, -1].add(10.0)
    y2 = conv.apply(params, x2)
    np.testing.assert_allclose(np.asarray(y1[:, :-1]), np.asarray(y2[:, :-1]),
                               atol=1e-6)
    # stride-2 causal conv halves time and stays causal
    conv_s2 = CausalConv3d(4, (3, 3, 3), time_stride=2)
    params2 = conv_s2.init(jax.random.key(1), x)
    z1 = conv_s2.apply(params2, x)
    z2 = conv_s2.apply(params2, x2)
    assert z1.shape[1] == 4
    np.testing.assert_allclose(np.asarray(z1[:, :3]), np.asarray(z2[:, :3]),
                               atol=1e-6)


def test_full_vae_pipeline_roundtrip():
    cfg = OpenSoraVAEConfig(micro_frame_size=17, micro_batch_size=4)
    vae = OpenSoraVAE(cfg, spatial=TINY_2D, temporal=_tiny_temporal())
    params = vae.init(jax.random.key(0))

    B, T, H, W = 1, 34, 16, 16
    x = jax.random.normal(jax.random.key(1), (B, 3, T, H, W))
    z = vae.encode(params, x, jax.random.key(2))
    # tiny 2D VAE: H/2 spatial; temporal 34 = 2*17 -> 10 latent frames
    assert z.shape == (B, 4, 10, H // 2, W // 2)
    y = vae.decode(params, z, num_frames=T)
    assert y.shape == (B, 3, T, H, W)
    assert np.all(np.isfinite(np.asarray(y)))


def test_get_latent_size():
    vae = OpenSoraVAE(OpenSoraVAEConfig(micro_frame_size=17),
                      spatial=TINY_2D, temporal=_tiny_temporal())
    # tiny 2D VAE has 2 blocks -> spatial factor 2 (full model: 4 blocks -> 8)
    assert vae.get_latent_size((34, 64, 64)) == [10, 32, 32]
    assert vae.get_latent_size((51, 64, 64)) == [15, 32, 32]
    assert vae.get_latent_size((1, 64, 64)) == [1, 32, 32]
    # 20 = 17 + 3 -> 5 + ceil(3/4)=1 -> 6
    assert vae.get_latent_size((20, 64, 64)) == [6, 32, 32]
    # full-size composition reproduces the reference /8 spatial factor
    full = OpenSoraVAE(OpenSoraVAEConfig(micro_frame_size=17))
    assert full.get_latent_size((51, 480, 854)) == [15, 60, 106]


def test_streaming_u8_decode_matches_whole_decode():
    """decode_chunks_u8 (streaming, per-chunk uint8) must reproduce
    decode() + the pipeline's uint8 postprocess math exactly."""
    import jax
    import jax.numpy as jnp

    from videosys_tpu.models.autoencoders.autoencoder_open_sora import (
        OpenSoraVAE, OpenSoraVAEConfig)
    from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D
    from videosys_tpu.models.autoencoders.vae_temporal import VAETemporal

    vae = OpenSoraVAE(
        OpenSoraVAEConfig(micro_frame_size=17, micro_batch_size=4),
        spatial=AutoencoderKL2D(mid_block_add_attention=False,
                                block_out_channels=(8, 16),
                                layers_per_block=1, num_groups=4),
        temporal=VAETemporal(filters=8, num_res_blocks=1, num_groups=4),
    )
    params = vae.init(jax.random.key(0))
    num_frames = 34  # two 17-frame chunks
    t_lat, h, w = vae.get_latent_size((num_frames, 32, 32))
    z = jax.random.normal(jax.random.key(1),
                          (1, vae.out_channels, t_lat, h, w), jnp.float32)

    whole = vae.decode(params, z, num_frames=num_frames)
    u8_ref = jnp.clip((jnp.clip(whole, -1, 1) + 1) / 2 * 255 + 0.5, 0, 255)
    u8_ref = np.asarray(jnp.transpose(u8_ref, (0, 2, 3, 4, 1)).astype(jnp.uint8))

    chunks = vae.decode_chunks_u8(params, z, num_frames)
    assert len(chunks) == 2
    got = np.concatenate([np.asarray(c) for c in chunks], axis=1)
    assert got.shape == u8_ref.shape and got.dtype == np.uint8
    np.testing.assert_array_equal(got, u8_ref)


@pytest.mark.parametrize("cp,sp", [(1, 8), (2, 4)])
def test_vae_decode_sharded_over_mesh_matches_single_device(cp, sp, capfd):
    """Multi-chip VAE (round 4): decode under a mesh — spatial stage
    frame-sharded (par.shard_frames), temporal stage row-sharded
    (par.shard_vae_rows) — must (a) bit-match the no-mesh decode and
    (b) compile without GSPMD's involuntary-replication fallback. The
    cp2xsp4 case regression-gates the rows-over-(cp,sp) layout: cp on the
    post-CFG size-1 batch dim made propagation move cp onto T and
    reintroduced the fallback (see par.shard_vae_rows). The reference runs
    its VAE replicated on every rank; sharding it is the next e2e lever
    the 8-chip stack estimate exposes (docs/pab.md)."""
    from videosys_tpu.core import parallel as par
    from videosys_tpu.core.parallel import ParallelConfig, build_mesh

    vae = OpenSoraVAE(
        OpenSoraVAEConfig(micro_frame_size=17, micro_batch_size=4),
        spatial=AutoencoderKL2D(mid_block_add_attention=False,
                                block_out_channels=(8, 16),
                                layers_per_block=1, num_groups=4),
        temporal=_tiny_temporal(),
    )
    params = vae.init(jax.random.key(0))
    num_frames = 34  # two 17-frame chunks; 34 pixel frames -> 10 latent
    t_lat, h, w = vae.get_latent_size((num_frames, 32, 32))
    z = jax.random.normal(jax.random.key(1),
                          (1, vae.out_channels, t_lat, h, w), jnp.float32)

    ref = np.asarray(vae.decode(params, z, num_frames=num_frames))

    mesh = build_mesh(ParallelConfig(dp_size=1, cp_size=cp, sp_size=sp))
    capfd.readouterr()
    with par.use_mesh(mesh):
        got = np.asarray(vae.decode(params, z, num_frames=num_frames))
    err = capfd.readouterr().err
    assert "full rematerialization" not in err, err[-2000:]
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)
