"""Open-Sora v1.2 inference examples.

Mirrors `examples/inference/open_sora/sample.py` in the reference: one
function per mode (base / pab / multi-device); each builds a config, an
engine, generates, and saves. `tiny=True` swaps in a random-init offline
config so the functions are executable as tests (zero-egress image).
"""

from videosys_tpu import OpenSoraConfig, VideoSysEngine


def _config(tiny: bool, **kw):
    if not tiny:
        return OpenSoraConfig(num_sampling_steps=30, cfg_scale=7.0, **kw)
    from videosys_tpu.models.transformers.stdit3 import STDiT3Config

    return OpenSoraConfig(
        transformer=None, vae=None, text_encoder=None,
        num_sampling_steps=2, dtype="fp32",
        transformer_config=STDiT3Config(depth=1, hidden_size=32, num_heads=2,
                                        caption_channels=16,
                                        model_max_length=8), **kw)


def _tiny_vae():
    from videosys_tpu.models.autoencoders.autoencoder_open_sora import (
        OpenSoraVAE,
        OpenSoraVAEConfig,
    )
    from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D
    from videosys_tpu.models.autoencoders.vae_temporal import VAETemporal

    return OpenSoraVAE(
        OpenSoraVAEConfig(micro_frame_size=17, micro_batch_size=4),
        spatial=AutoencoderKL2D(mid_block_add_attention=False,
                        block_out_channels=(8, 16), layers_per_block=1,
                                num_groups=4),
        temporal=VAETemporal(filters=8, num_res_blocks=1, num_groups=4))


def run_base(tiny: bool = False, outdir: str = "./outputs"):
    config = _config(tiny)
    engine = VideoSysEngine(config, **({"vae": _tiny_vae()} if tiny else {}))
    prompt = "Sunset over the sea."
    gen = (dict(resolution="144p", aspect_ratio="1:1", num_frames=1)
           if tiny else dict(resolution="480p", aspect_ratio="9:16",
                             num_frames="2s"))
    video = engine.generate(prompt=prompt, seed=0, **gen).video[0]
    return engine.save_video(video, f"{outdir}/{prompt}")


def run_pab(tiny: bool = False, outdir: str = "./outputs"):
    config = _config(tiny, enable_pab=True)
    engine = VideoSysEngine(config, **({"vae": _tiny_vae()} if tiny else {}))
    prompt = "Sunset over the sea."
    gen = (dict(resolution="144p", aspect_ratio="1:1", num_frames=1)
           if tiny else dict(resolution="480p", aspect_ratio="9:16",
                             num_frames="2s"))
    video = engine.generate(prompt=prompt, seed=0, **gen).video[0]
    return engine.save_video(video, f"{outdir}/{prompt}-pab")


def run_multi_device(tiny: bool = False, outdir: str = "./outputs",
                     num_devices: int = 2):
    """DSP sequence parallelism over a device mesh (the reference's
    num_gpus>1 path)."""
    config = _config(tiny, num_gpus=num_devices)
    engine = VideoSysEngine(config, **({"vae": _tiny_vae()} if tiny else {}))
    prompt = "Sunset over the sea."
    gen = (dict(resolution="144p", aspect_ratio="1:1", num_frames=1)
           if tiny else dict(resolution="480p", aspect_ratio="9:16",
                             num_frames="2s"))
    video = engine.generate(prompt=prompt, seed=0, **gen).video[0]
    return engine.save_video(video, f"{outdir}/{prompt}-sp")


if __name__ == "__main__":
    run_base()
    run_pab()
