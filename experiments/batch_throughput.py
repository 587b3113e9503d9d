"""Batched multi-prompt serving throughput on one chip.

The pipeline accepts a prompt LIST (one batched denoise; row i reproduces
generate(prompt_i, seed=seed+i)). At B=1 the 2s/480p denoise runs at
MFU ~0.47 — this measures how much of the remaining headroom batch=2..4
recovers, in videos/min/chip.

Usage: python experiments/batch_throughput.py [--batches 1,2,4] [--frames 2s]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROMPTS = [
    "a breathtaking sunrise over snowy mountains",
    "a coral reef teeming with colorful fish",
    "city traffic at night in the rain",
    "a field of sunflowers swaying in the wind",
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4")
    ap.add_argument("--resolution", default="480p")
    ap.add_argument("--aspect", default="9:16")
    ap.add_argument("--frames", default="2s")
    args = ap.parse_args(argv)

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from videosys_tpu import OpenSoraConfig, VideoSysEngine

    config = OpenSoraConfig(transformer=None, vae=None, text_encoder=None,
                            num_sampling_steps=30, dtype="bf16")
    engine = VideoSysEngine(config)
    kw = dict(resolution=args.resolution, aspect_ratio=args.aspect,
              num_frames=args.frames)

    rows = []
    for bs in [int(b) for b in args.batches.split(",")]:
        prompts = (PROMPTS * ((bs + len(PROMPTS) - 1) // len(PROMPTS)))[:bs]
        arg = prompts[0] if bs == 1 else prompts
        engine.generate(arg, seed=0, **kw)  # compile
        best = float("inf")
        for i in (1, 2):
            t0 = time.perf_counter()
            out = engine.generate(arg, seed=i, **kw)
            best = min(best, time.perf_counter() - t0)
        timings = dict(getattr(engine.driver_worker, "last_timings", {}) or {})
        rows.append({"batch": bs, "latency_s": round(best, 2),
                     "videos_per_min_chip": round(60.0 * bs / best, 3),
                     "phase_s": {k: round(v, 2) for k, v in timings.items()}})
        print(f"# bs={bs}: {best:.2f}s  "
              f"{60.0 * bs / best:.2f} videos/min/chip", file=sys.stderr)

    out = {"device": jax.devices()[0].device_kind,
           "workload": f"open-sora {args.frames} {args.resolution} 30 steps",
           "rows": rows}
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
