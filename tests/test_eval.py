"""Eval harness tests: PSNR/SSIM math, pairwise protocol, PAB eval plumbing."""

import numpy as np
import pytest

from videosys_tpu.eval.metrics import (
    calculate_psnr,
    calculate_ssim,
    evaluate_pair,
    frame_ssim,
    img_psnr,
)
from videosys_tpu.eval.pab_eval import PABEvalResult, eval_pab, summarize


def test_psnr_known_values():
    a = np.full((8, 8, 3), 0.5, np.float32)
    assert img_psnr(a, a) == 100.0
    b = a + 0.1
    # uniform diff d: psnr = -20 log10(d)
    assert img_psnr(a, b) == pytest.approx(20.0, abs=1e-4)
    # uint8 input normalized to [0, 1]
    u = (a * 255).astype(np.uint8)
    assert img_psnr(u, u) == 100.0


def test_ssim_identity_and_degradation():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3)).astype(np.float32)
    assert frame_ssim(img, img) == pytest.approx(1.0, abs=1e-9)
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    s = frame_ssim(img, noisy)
    assert 0.0 < s < 0.9
    # more noise -> lower ssim
    noisier = np.clip(img + rng.normal(0, 0.5, img.shape), 0, 1)
    assert frame_ssim(img, noisier) < s


def test_batch_metrics_shapes():
    rng = np.random.default_rng(1)
    v1 = rng.random((2, 3, 16, 16, 3)).astype(np.float32)
    v2 = np.clip(v1 + 0.05, 0, 1)
    p = calculate_psnr(v1, v2)
    s = calculate_ssim(v1, v2)
    assert len(p["per_frame_mean"]) == 3
    assert p["value"] > 20 and 0 < s["value"] <= 1
    both = evaluate_pair(v1, v2)
    assert set(both) >= {"psnr", "ssim"}  # lpips only when the wheel exists


def test_eval_pab_shares_weights_high_psnr():
    """With shared params and a PAB config whose thresholds never fire,
    the accelerated output is bit-identical -> PSNR 100."""
    import jax.numpy as jnp

    from videosys_tpu import OpenSoraConfig, OpenSoraPABConfig, VideoSysEngine
    from videosys_tpu.models.autoencoders.autoencoder_open_sora import (
        OpenSoraVAE,
        OpenSoraVAEConfig,
    )
    from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D
    from videosys_tpu.models.autoencoders.vae_temporal import VAETemporal
    from videosys_tpu.models.transformers.stdit3 import STDiT3Config

    def vae():
        return OpenSoraVAE(
            OpenSoraVAEConfig(micro_frame_size=17, micro_batch_size=4),
            spatial=AutoencoderKL2D(mid_block_add_attention=False,
                        block_out_channels=(8, 16),
                                    layers_per_block=1, num_groups=4),
            temporal=VAETemporal(filters=8, num_res_blocks=1, num_groups=4))

    shared = {}

    def make_engine(enable_pab):
        cfg = OpenSoraConfig(
            transformer=None, vae=None, text_encoder=None,
            num_sampling_steps=4, dtype="fp32",
            enable_pab=enable_pab,
            pab_config=OpenSoraPABConfig(
                spatial_threshold=(0, 0), temporal_threshold=(0, 0),
                cross_threshold=(0, 0), mlp_broadcast=False),
            transformer_config=STDiT3Config(
                depth=2, hidden_size=32, num_heads=2, caption_channels=16,
                model_max_length=8, patch_size=(1, 2, 2)))
        eng = VideoSysEngine(cfg, vae=vae(),
                             params=shared.get("params"))
        shared.setdefault("params", eng.driver_worker.params)
        return eng

    results = eval_pab(
        make_engine, ["a red square"],
        generate_kwargs=dict(resolution="144p", aspect_ratio="1:1",
                             num_frames=1))
    agg = summarize(results)
    assert agg["n"] == 1
    assert agg["psnr"] == pytest.approx(100.0)
    assert agg["ssim"] == pytest.approx(1.0)
