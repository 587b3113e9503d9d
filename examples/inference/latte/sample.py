"""Latte inference examples (reference: examples/inference/latte/sample.py)."""

from videosys_tpu import LatteConfig, VideoSysEngine


def _config(tiny: bool, **kw):
    if not tiny:
        return LatteConfig(**kw)
    from videosys_tpu.models.transformers.latte import (
        LatteConfig as LatteModelConfig,
    )

    return LatteConfig(
        model_path="", dtype="fp32",
        transformer_config=LatteModelConfig(
            num_layers=1, num_heads=2, head_dim=16, caption_channels=16,
            sample_size=16, video_length=2), **kw)


def _kwargs(tiny: bool):
    return (dict(video_length=2, height=32, width=32, num_inference_steps=2)
            if tiny else dict(video_length=16, height=512, width=512,
                              num_inference_steps=50))


def _vae(tiny: bool):
    if not tiny:
        return {}
    from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D

    return {"vae": AutoencoderKL2D(mid_block_add_attention=False,
                        block_out_channels=(8, 16),
                                   layers_per_block=1, num_groups=4)}


def run_base(tiny: bool = False, outdir: str = "./outputs"):
    engine = VideoSysEngine(_config(tiny), **_vae(tiny))
    prompt = "Sunset over the sea."
    video = engine.generate(prompt, seed=0, **_kwargs(tiny)).video[0]
    return engine.save_video(video, f"{outdir}/{prompt}-latte")


def run_pab(tiny: bool = False, outdir: str = "./outputs"):
    engine = VideoSysEngine(_config(tiny, enable_pab=True), **_vae(tiny))
    prompt = "Sunset over the sea."
    video = engine.generate(prompt, seed=0, **_kwargs(tiny)).video[0]
    return engine.save_video(video, f"{outdir}/{prompt}-latte-pab")


if __name__ == "__main__":
    run_base()
