"""PAB evaluation experiment entry points (Open-Sora).

Mirrors the reference's `eval/pab/experiments/` scripts (attention_ablation
.py, components_ablation.py, opensora.py) and `eval/pab/webvid/` generation
scripts as one CLI over `videosys_tpu.eval`. Each function is executable as
a test with ``tiny=True`` (random-init offline config, shared weights across
the dense/PAB engines — the protocol's requirement).

Usage:
  python examples/eval/pab_experiments.py attention_ablation --outdir samples/
  python examples/eval/pab_experiments.py components_ablation --outdir samples/
  python examples/eval/pab_experiments.py pab_quality
  python examples/eval/pab_experiments.py webvid --csv prompts.csv --outdir out/
"""

import argparse
import json
import os
import sys

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from videosys_tpu import OpenSoraConfig, OpenSoraPABConfig, VideoSysEngine


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
                                block_out_channels=(8, 16),
                                layers_per_block=1, num_groups=4),
        temporal=VAETemporal(filters=8, num_res_blocks=1, num_groups=4))


def _engine_factory(tiny: bool):
    """Returns make_engine(pab_overrides | None) with SHARED weights: the
    dense engine and every PAB variant run the same parameters, the
    eval protocol's requirement (eval/pab/README.md)."""
    shared = {}

    def make_engine(pab_overrides=None):
        if tiny:
            from videosys_tpu.models.transformers.stdit3 import STDiT3Config

            cfg = OpenSoraConfig(
                transformer=None, vae=None, text_encoder=None,
                num_sampling_steps=4, dtype="fp32",
                enable_pab=pab_overrides is not None,
                pab_config=OpenSoraPABConfig(**pab_overrides)
                if pab_overrides else None,
                transformer_config=STDiT3Config(
                    depth=2, hidden_size=32, num_heads=2, caption_channels=16,
                    model_max_length=8, patch_size=(1, 2, 2)))
            eng = VideoSysEngine(cfg, vae=_tiny_vae(),
                                 params=shared.get("params"))
        else:
            cfg = OpenSoraConfig(
                enable_pab=pab_overrides is not None,
                pab_config=OpenSoraPABConfig(**pab_overrides)
                if pab_overrides else None)
            eng = VideoSysEngine(cfg, params=shared.get("params"))
        shared.setdefault("params", eng.driver_worker.params)
        return eng

    return make_engine


def _gen_kwargs(tiny: bool):
    if tiny:
        return dict(resolution="144p", aspect_ratio="1:1", num_frames=1)
    return dict(resolution="480p", aspect_ratio="9:16", num_frames="2s")


def run_attention_ablation(tiny: bool = False, outdir: str = None,
                           prompts=("a breathtaking sunrise",)):
    """experiments/attention_ablation.py: per-type broadcast-range sweep."""
    from videosys_tpu.eval.pab_eval import attention_ablation

    make = _engine_factory(tiny)
    ranges = ({"spatial": (2,), "temporal": (2,), "cross": (2,)} if tiny
              else None)
    out = attention_ablation(
        lambda ov: make(ov), make(None), list(prompts),
        generate_kwargs=_gen_kwargs(tiny), ranges=ranges)
    if outdir:
        os.makedirs(outdir, exist_ok=True)
        with open(os.path.join(outdir, "attention_ablation.json"), "w") as f:
            json.dump(out, f, indent=1)
    return out


def run_components_ablation(tiny: bool = False, outdir: str = None,
                            prompts=("a breathtaking sunrise",)):
    """experiments/components_ablation.py: leave-one-out over the default
    PAB scope."""
    from videosys_tpu.eval.pab_eval import components_ablation

    make = _engine_factory(tiny)
    out = components_ablation(
        lambda ov: make(ov), make(None), list(prompts),
        generate_kwargs=_gen_kwargs(tiny))
    if outdir:
        os.makedirs(outdir, exist_ok=True)
        with open(os.path.join(outdir, "components_ablation.json"), "w") as f:
            json.dump(out, f, indent=1)
    return out


def run_pab_quality(tiny: bool = False,
                    prompts=("a breathtaking sunrise",)):
    """experiments/opensora.py + common_metrics: dense-vs-PAB pair metrics."""
    from videosys_tpu.eval.pab_eval import eval_pab, summarize

    make = _engine_factory(tiny)
    results = eval_pab(lambda pab: make({} if pab else None), list(prompts),
                       generate_kwargs=_gen_kwargs(tiny))
    return summarize(results)


def run_webvid(csv_path: str, outdir: str, tiny: bool = False,
               gt_dir: str = None):
    """webvid/open_sora.py: batch generation over an (id,text) CSV, then the
    directory-pair eval against ground-truth clips when provided."""
    from videosys_tpu.eval.batch_eval import eval_dirs
    from videosys_tpu.eval.pab_eval import generate_batch, load_eval_prompts

    engine = _engine_factory(tiny)(None)
    prompts = load_eval_prompts(csv_path)
    written = generate_batch(engine, prompts, outdir,
                             generate_kwargs=_gen_kwargs(tiny))
    if gt_dir:
        ext = "mp4" if any(w.endswith(".mp4") for w in written) else "gif"
        return eval_dirs(outdir, gt_dir, file_extension=ext)
    return {"written": len(written)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["attention_ablation",
                                     "components_ablation", "pab_quality",
                                     "webvid"])
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--outdir", default="samples/pab_experiments")
    ap.add_argument("--csv")
    ap.add_argument("--gt-dir")
    args = ap.parse_args(argv)
    if args.mode == "attention_ablation":
        out = run_attention_ablation(args.tiny, args.outdir)
    elif args.mode == "components_ablation":
        out = run_components_ablation(args.tiny, args.outdir)
    elif args.mode == "pab_quality":
        out = run_pab_quality(args.tiny)
    else:
        out = run_webvid(args.csv, args.outdir, args.tiny, args.gt_dir)
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
