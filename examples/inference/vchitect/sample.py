"""Vchitect-2.0 inference examples (reference: examples/inference/vchitect/
sample.py: base + pab at 480x288/40 frames)."""

from videosys_tpu import VchitectConfig, VideoSysEngine


def _config(tiny: bool, **kw):
    if not tiny:
        return VchitectConfig(**kw)
    from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D
    from videosys_tpu.models.transformers.vchitect import VchitectModelConfig

    return VchitectConfig(
        dtype="fp32",
        transformer_config=VchitectModelConfig(
            num_layers=2, num_heads=2, head_dim=16, joint_attention_dim=32,
            pooled_projection_dim=24, sample_size=8, pos_embed_max_size=12),
        vae=AutoencoderKL2D(mid_block_add_attention=False,
                        latent_channels=16, block_out_channels=(8, 16),
                            layers_per_block=1, num_groups=4), **kw)


def _kwargs(tiny: bool):
    return (dict(width=32, height=32, frames=2, num_inference_steps=2)
            if tiny else dict(width=480, height=288, frames=40,
                              num_inference_steps=100))


def run_base(tiny: bool = False, outdir: str = "./outputs"):
    engine = VideoSysEngine(_config(tiny))
    prompt = "Sunset over the sea."
    video = engine.generate(prompt, seed=0, **_kwargs(tiny)).video[0]
    return engine.save_video(video, f"{outdir}/{prompt}-vchitect")


def run_pab(tiny: bool = False, outdir: str = "./outputs"):
    engine = VideoSysEngine(_config(tiny, enable_pab=True))
    prompt = "Sunset over the sea."
    video = engine.generate(prompt, seed=0, **_kwargs(tiny)).video[0]
    return engine.save_video(video, f"{outdir}/{prompt}-vchitect-pab")


if __name__ == "__main__":
    run_base()
