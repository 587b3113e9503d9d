"""Open-Sora training entry (reference: examples/training/open_sora/train.py).

The reference is a 516-line torchrun script; here training is a library call
(`videosys_tpu.training.train.run_training`) and this entry only parses flags
into a TrainConfig — the SPMD mesh replaces the process-per-GPU launcher.
"""

import argparse
import os
import sys

# allow running straight from a source checkout (no pip install)
_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", ".."))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import jax.numpy as jnp


def main(argv=None):
    from videosys_tpu.models.transformers.stdit3 import STDiT3Config
    from videosys_tpu.training.train import TrainConfig, run_training

    ap = argparse.ArgumentParser()
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight-decay", type=float, default=0.0)
    ap.add_argument("--warmup-steps", type=int, default=1000)
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--ema-decay", type=float, default=0.99)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--dp-size", type=int, default=1)
    ap.add_argument("--sp-size", type=int, default=1)
    ap.add_argument("--dynamic-sp", action="store_true")
    ap.add_argument("--sp-balance", action="store_true",
                    help="pack plans of differing sp into GlobalSteps "
                         "(grads accumulate, one update per packed step)")
    ap.add_argument("--dynamic-profile", action="store_true")
    ap.add_argument("--remat-policy", default="full",
                    choices=("full", "dots", "none"),
                    help="activation recompute policy for the scanned pairs")
    ap.add_argument("--dynamic-recompute", action="store_true",
                    help="let the DCP profiler pick the least recompute "
                         "that fits memory, per bucket")
    ap.add_argument("--csv", default=None,
                    help="video CSV (path,text,num_frames,height,width); "
                         "trains from raw video through the VAE")
    ap.add_argument("--ckpt-every", type=int, default=None)
    ap.add_argument("--ckpt-dir", default="./checkpoints")
    ap.add_argument("--dataset-size", type=int, default=64)
    ap.add_argument("--tiny", action="store_true",
                    help="random-init tiny model (offline smoke)")
    ap.add_argument("--config", default=None,
                    help="YAML file; CLI flags override its values "
                         "(reference merge_args, utils/utils.py:62-78)")
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
            # CLI takes precedence only when explicitly set (differs from default)
            if getattr(args, k) == defaults.get(k):
                setattr(args, k, v)

    model = (STDiT3Config(depth=1, hidden_size=32, num_heads=2,
                          caption_channels=16, model_max_length=8)
             if args.tiny else STDiT3Config(dtype=jnp.bfloat16))
    cfg = TrainConfig(
        model=model, lr=args.lr, weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps, grad_clip=args.grad_clip,
        ema_decay=args.ema_decay, epochs=args.epochs, max_steps=args.max_steps,
        seed=args.seed, dp_size=args.dp_size, sp_size=args.sp_size,
        dynamic_sp=args.dynamic_sp, sp_balance=args.sp_balance,
        dynamic_profile=args.dynamic_profile,
        remat_policy=args.remat_policy,
        dynamic_recompute=args.dynamic_recompute,
        ckpt_every=args.ckpt_every, ckpt_dir=args.ckpt_dir,
        dataset_size=args.dataset_size,
        bucket_config=({"144p": {1: (1.0, 2), 34: (1.0, 2)}} if args.tiny
                       else None) or TrainConfig().bucket_config,
        mask_ratios=None if args.tiny else TrainConfig().mask_ratios,
    )
    dataset = None
    vae = None
    if args.csv:
        from videosys_tpu.models.autoencoders.autoencoder_open_sora import (
            OpenSoraVAE,
            OpenSoraVAEConfig,
        )
        from videosys_tpu.training.datasets import VariableVideoTextDataset

        dataset = VariableVideoTextDataset(args.csv)
        vae = OpenSoraVAE(OpenSoraVAEConfig())
    state, ema, history = run_training(cfg, dataset=dataset, vae=vae)
    return int(state.step), history


if __name__ == "__main__":
    main()
