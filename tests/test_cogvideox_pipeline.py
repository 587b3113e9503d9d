"""CogVideoX VAE + pipeline tests (tiny offline configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videosys_tpu.models.autoencoders.autoencoder_cogvideox import (
    AutoencoderKLCogVideoX,
    CogVideoXVAEConfig,
)

TINY_VAE = CogVideoXVAEConfig(
    latent_channels=4, block_out_channels=(8, 8, 16, 16), layers_per_block=1,
    norm_num_groups=4, tile_latent_min_height=4, tile_latent_min_width=4,
)


def test_vae_encode_decode_shapes():
    vae = AutoencoderKLCogVideoX(TINY_VAE)
    params = vae.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 3, 9, 32, 32))
    z = vae.encode(params, x, jax.random.key(2))
    # temporal: 9 frames -> 1 + 8/4 = 3 latent; spatial /8
    assert z.shape == (1, 4, 3, 4, 4)
    y = vae.decode(params, z)
    assert y.shape == (1, 3, 9, 32, 32)
    assert np.all(np.isfinite(np.asarray(y)))


def test_vae_tiled_decode_close_to_full():
    # tile=6, overlap 1/6 -> latent step 5, pixel blend 8: H=16 tiles as
    # 6,6,6,1 contributing 40+40+40+8 = 128 px (reference tiling arithmetic)
    import dataclasses as dc

    vae = AutoencoderKLCogVideoX(dc.replace(TINY_VAE, tile_latent_min_height=6,
                                            tile_latent_min_width=6,
                                            tile_overlap_factor_width=1 / 6))
    params = vae.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (1, 4, 2, 16, 16))
    full = vae.decode(params, z)
    vae.enable_tiling()
    tiled = vae.decode(params, z)
    assert tiled.shape == full.shape
    # interior must match exactly; seams blend so allow small deviation
    diff = np.abs(np.asarray(full) - np.asarray(tiled))
    assert np.median(diff) < 0.15


def test_temporal_downsample_first_frame_special():
    """Odd frame counts keep the first frame un-pooled: 9 -> 1 + 4 = 5."""
    from videosys_tpu.models.autoencoders.autoencoder_cogvideox import Downsample3DCog

    m = Downsample3DCog(4, compress_time=True)
    x = jnp.ones((1, 9, 8, 8, 4))
    p = m.init(jax.random.key(0), x)
    y = m.apply(p, x)
    assert y.shape[1] == 5


def test_pipeline_generate():
    from videosys_tpu.models.transformers.cogvideox import CogVideoXConfig as MC
    from videosys_tpu.pipelines.cogvideox.pipeline_cogvideox import (
        CogVideoXConfig,
        CogVideoXPipeline,
    )

    mc = MC(num_layers=2, num_heads=2, head_dim=16, in_channels=4,
            out_channels=4, time_embed_dim=16, text_embed_dim=16,
            max_text_seq_length=8, use_rotary_positional_embeddings=False)
    cfg = CogVideoXConfig(model_path=None, dtype="fp32", transformer_config=mc,
                          vae_config=TINY_VAE, vae_tiling=False)
    pipe = CogVideoXPipeline(cfg)
    # num_frames must satisfy (nf-1)%4==0 (odd latent count) like the real
    # model's 49 — even latent counts decode to 4n frames in the reference too
    out = pipe.generate("a dog", num_inference_steps=2, num_frames=9,
                        height=32, width=32, seed=0)
    assert out.video.shape == (1, 9, 32, 32, 3)
    assert out.video.dtype == np.uint8


def test_pipeline_dpm_generate():
    from videosys_tpu.models.transformers.cogvideox import CogVideoXConfig as MC
    from videosys_tpu.pipelines.cogvideox.pipeline_cogvideox import (
        CogVideoXConfig,
        CogVideoXPipeline,
    )

    mc = MC(num_layers=2, num_heads=2, head_dim=16, in_channels=4,
            out_channels=4, time_embed_dim=16, text_embed_dim=16,
            max_text_seq_length=8, use_rotary_positional_embeddings=True)
    cfg = CogVideoXConfig(model_path=None, dtype="fp32", transformer_config=mc,
                          vae_config=TINY_VAE, vae_tiling=False,
                          scheduler="dpm")
    pipe = CogVideoXPipeline(cfg)
    out = pipe.generate("a dog", num_inference_steps=3, num_frames=9,
                        height=32, width=32, seed=0, use_dynamic_cfg=True)
    assert out.video.shape == (1, 9, 32, 32, 3)
