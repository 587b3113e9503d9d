"""CogVideoX inference examples (reference: examples/inference/cogvideox/
sample.py: run_base on 2b/ddim, run_pab, run_low_mem via vae tiling)."""

from videosys_tpu import CogVideoXConfig, VideoSysEngine


def _config(tiny: bool, **kw):
    if not tiny:
        return CogVideoXConfig(**kw)
    from videosys_tpu.models.autoencoders.autoencoder_cogvideox import (
        CogVideoXVAEConfig,
    )
    from videosys_tpu.models.transformers.cogvideox import (
        CogVideoXConfig as CogModelConfig,
    )

    return CogVideoXConfig(
        model_path="", dtype="fp32",
        transformer_config=CogModelConfig(
            num_layers=1, num_heads=2, head_dim=16, in_channels=4,
            out_channels=4, text_embed_dim=16, max_text_seq_length=8,
            sample_height=8, sample_width=8, sample_frames=9),
        vae_config=CogVideoXVAEConfig(
            latent_channels=4, block_out_channels=(8, 8, 16, 16),
            layers_per_block=1, norm_num_groups=4), **kw)


def _kwargs(tiny: bool):
    return (dict(num_frames=5, height=32, width=32, num_inference_steps=2)
            if tiny else dict(num_frames=49, height=480, width=720,
                              num_inference_steps=50))


def run_base(tiny: bool = False, outdir: str = "./outputs"):
    engine = VideoSysEngine(_config(tiny))
    prompt = "Sunset over the sea."
    video = engine.generate(prompt, seed=0, **_kwargs(tiny)).video[0]
    return engine.save_video(video, f"{outdir}/{prompt}-cog")


def run_pab(tiny: bool = False, outdir: str = "./outputs"):
    engine = VideoSysEngine(_config(tiny, enable_pab=True))
    prompt = "Sunset over the sea."
    video = engine.generate(prompt, seed=0, **_kwargs(tiny)).video[0]
    return engine.save_video(video, f"{outdir}/{prompt}-cog-pab")


if __name__ == "__main__":
    run_base()
