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


class _StubEngine:
    """Engine double for plumbing tests: returns a fixed video per call."""

    def __init__(self, video):
        self._video = video
        self.calls = []

    def generate(self, prompt, seed=0, **kwargs):
        self.calls.append((prompt, seed))
        import types
        return types.SimpleNamespace(video=self._video)


def test_components_ablation_leave_one_out():
    """Leave-one-out plumbing (components_ablation.py wo_*): each component
    is disabled exactly once; metrics come back per wo_* key."""
    from videosys_tpu.eval.pab_eval import components_ablation

    rng = np.random.default_rng(0)
    ref = (rng.random((1, 2, 16, 16, 3)) * 255).astype(np.uint8)
    overrides_seen = []

    def make_engine(overrides):
        overrides_seen.append(overrides)
        return _StubEngine(np.clip(ref.astype(np.int32) + 3, 0, 255).astype(np.uint8))

    out = components_ablation(make_engine, _StubEngine(ref), ["p"])
    assert set(out) == {"wo_spatial", "wo_temporal", "wo_cross", "wo_mlp"}
    assert overrides_seen == [
        {"spatial_broadcast": False}, {"temporal_broadcast": False},
        {"cross_broadcast": False}, {"mlp_broadcast": False}]
    for v in out.values():
        assert 30 < v["psnr"] < 100 and 0 < v["ssim"] <= 1


def test_generate_batch_and_eval_dirs(tmp_path):
    """Disk protocol end to end: webvid-style {id: prompt} generation to
    files, then directory-pair eval with filename pairing and gt
    crop-to-generated geometry (eval.py:55-88)."""
    from videosys_tpu.eval.batch_eval import eval_dirs, load_video, preprocess_gt_video
    from videosys_tpu.eval.pab_eval import generate_batch, load_eval_prompts

    csv_path = tmp_path / "prompts.csv"
    csv_path.write_text("id,text\n0001,a cat\n0002,a dog\n")
    prompts = load_eval_prompts(str(csv_path))
    assert prompts == {"0001": "a cat", "0002": "a dog"}

    rng = np.random.default_rng(1)
    base = (rng.random((3, 24, 24, 3)) * 255).astype(np.uint8)
    gen_dir, gt_dir = tmp_path / "gen", tmp_path / "gt"
    written = generate_batch(_StubEngine(base), prompts, str(gen_dir))
    assert len(written) == 2 and all(w.endswith(".gif") for w in written)
    # skip_existing: a second run writes nothing
    assert generate_batch(_StubEngine(base), prompts, str(gen_dir)) == []

    # ground truth: longer and larger clips -> T-trim + center crop path
    import imageio
    gt_dir.mkdir()
    for vid in ("0001", "0002"):
        big = np.zeros((4, 32, 32, 3), np.uint8)
        big[:3, 4:28, 4:28] = load_video(str(gen_dir / f"{vid}.gif"))
        imageio.mimwrite(str(gt_dir / f"{vid}.gif"), list(big), duration=100)

    out = eval_dirs(str(gen_dir), str(gt_dir), file_extension="gif",
                    batch_size=1)
    assert out["n"] == 2
    assert out["psnr"] > 25 and 0 < out["ssim"] <= 1

    # upscale branch: gt smaller than generated
    small = (rng.random((3, 12, 12, 3)) * 255).astype(np.uint8)
    fitted = preprocess_gt_video(small, (3, 24, 24))
    assert fitted.shape == (3, 24, 24, 3)
