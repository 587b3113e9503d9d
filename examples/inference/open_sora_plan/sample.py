"""Open-Sora-Plan inference examples (reference: examples/inference/
open_sora_plan/sample.py: v110 65x512x512 / v120 29x480p, base + pab)."""

from videosys_tpu import OpenSoraPlanConfig, VideoSysEngine


def _config(tiny: bool, version: str = "v120", **kw):
    ttype = "29x480p" if version == "v120" else "65x512x512"
    if not tiny:
        return OpenSoraPlanConfig(version=version, transformer_type=ttype, **kw)
    from videosys_tpu.models.autoencoders.autoencoder_causal_vae import (
        CausalVAE,
        CausalVAEConfig,
    )

    vae = CausalVAE(CausalVAEConfig(
        hidden_size=8, hidden_size_mult=(1, 2), num_res_blocks=1,
        encoder_resnet_blocks=("ResnetBlock3D",) * 2,
        encoder_spatial_downsample=("SpatialDownsample2x", ""),
        encoder_temporal_downsample=("TimeDownsample2x", ""),
        decoder_resnet_blocks=("ResnetBlock3D",) * 2,
        decoder_spatial_upsample=("", "SpatialUpsample2x"),
        decoder_temporal_upsample=("", "TimeUpsample2x")), version=version)
    if version == "v120":
        from videosys_tpu.models.transformers.open_sora_plan_v120 import (
            OpenSoraPlanV120Config,
        )

        tcfg = OpenSoraPlanV120Config(num_layers=1, num_heads=2, head_dim=24,
                                      caption_channels=16, sample_size=(8, 8),
                                      sample_size_t=2)
    else:
        from videosys_tpu.models.transformers.open_sora_plan_v110 import (
            OpenSoraPlanV110Config,
        )

        tcfg = OpenSoraPlanV110Config(num_layers=1, num_heads=2, head_dim=24,
                                      caption_channels=16, sample_size=8,
                                      video_length=2)
    return OpenSoraPlanConfig(version=version, transformer_type=ttype,
                              dtype="fp32", enable_tiling=False,
                              transformer_config=tcfg, vae=vae, **kw)


def run_base(tiny: bool = False, version: str = "v120",
             outdir: str = "./outputs"):
    engine = VideoSysEngine(_config(tiny, version))
    prompt = "Sunset over the sea."
    steps = 8 if tiny else 100  # PNDM needs >= pndm_order steps
    video = engine.generate(prompt, seed=0, num_inference_steps=steps).video[0]
    return engine.save_video(video, f"{outdir}/{prompt}-osp-{version}")


def run_v110(tiny: bool = False, outdir: str = "./outputs"):
    return run_base(tiny, version="v110", outdir=outdir)


def run_pab(tiny: bool = False, outdir: str = "./outputs"):
    engine = VideoSysEngine(_config(tiny, "v120", enable_pab=True))
    prompt = "Sunset over the sea."
    steps = 4 if tiny else 100
    video = engine.generate(prompt, seed=0, num_inference_steps=steps).video[0]
    return engine.save_video(video, f"{outdir}/{prompt}-osp-pab")


if __name__ == "__main__":
    run_base()
