"""PAB speed legs on the real chip: extension ladders + larger workloads.

Measures, in ONE process (shared-pool chip — never A/B across invocations):
  * 2s/480p: dense vs ref-default PAB vs the extension ladders
    (mlp_range, pair-delta) whose quality evidence lives in
    docs/pab_quality.json;
  * 2s/720p and 4s/480p: dense vs pair-delta PAB — the workloads where
    attention dominates; the per-component cache cannot fit a 16 GiB chip
    there (6 full-depth slots), the single-slot pair cache can.

Writes docs/pab_speed.json; bench.py carries the headline keys.

Run:  python experiments/pab_speed.py [--steps 30] [--out docs/pab_speed.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(engine, kwargs, label, runs=2):
    dts = []
    for i in range(1, runs + 1):
        t0 = time.perf_counter()
        engine.generate("a breathtaking sunrise over snowy mountains",
                        seed=i, **kwargs)
        dts.append(time.perf_counter() - t0)
    timings = dict(getattr(engine.driver_worker, "last_timings", {}) or {})
    print(f"# {label}: {[round(d, 2) for d in dts]} "
          f"denoise={timings.get('denoise', 0):.2f}", flush=True)
    return min(dts), timings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--out", default="docs/pab_speed.json")
    ap.add_argument("--skip-large", action="store_true")
    ap.add_argument("--only-large", action="store_true",
                    help="skip the 480p ladder sweep; run just the 720p/4s "
                         "legs (merging into an existing --out file)")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from videosys_tpu import OpenSoraConfig, OpenSoraPABConfig, VideoSysEngine

    results = {"device": jax.devices()[0].device_kind}
    if args.only_large and os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    def engine_for(pab_over, params=None):
        cfg = OpenSoraConfig(transformer=None, vae=None, text_encoder=None,
                             num_sampling_steps=args.steps, dtype="bf16",
                             enable_pab=pab_over is not None,
                             pab_config=(OpenSoraPABConfig(
                                 cache_dtype="float8_e4m3fn", **pab_over)
                                 if pab_over is not None else None))
        return VideoSysEngine(cfg, params=params)

    # ---- 2s/480p ladder sweep ------------------------------------------ #
    if not args.only_large:
        kw = dict(resolution="480p", aspect_ratio="9:16", num_frames="2s")
        dense = engine_for(None)
        dense.generate("warmup", seed=0, **kw)
        t_dense, tim_dense = timed(dense, kw, "480p dense")
        results["480p"] = {"dense_s": round(t_dense, 3),
                           "dense_denoise_s": round(tim_dense["denoise"], 3),
                           "ladders": {}}
        params = dense.driver_worker.params

        ladders = {
            "ref_default": dict(),
            "mlp_range2": dict(mlp_range=2),
            "mlp_range3_heavy": dict(spatial_range=3, temporal_range=6,
                                     cross_range=8, mlp_range=3),
            "pair2": dict(pair_broadcast=True, pair_range=2),
            "pair3": dict(pair_broadcast=True, pair_range=3),
            "pair4": dict(pair_broadcast=True, pair_range=4),
            "pair3_wide": dict(pair_broadcast=True, pair_range=3,
                               pair_threshold=(250, 950)),
        }
        for name, over in ladders.items():
            try:
                eng = engine_for(over, params=params)
                eng.generate("warmup", seed=0, **kw)
                t, tim = timed(eng, kw, f"480p {name}")
                results["480p"]["ladders"][name] = {
                    "latency_s": round(t, 3),
                    "denoise_s": round(tim.get("denoise", 0), 3),
                    "e2e_speedup": round(t_dense / t, 3),
                    "denoise_speedup": round(
                        tim_dense["denoise"] / tim["denoise"], 3)
                    if tim.get("denoise") else None,
                }
                del eng
            except Exception as e:
                results["480p"]["ladders"][name] = {
                    "error": f"{type(e).__name__}: {e}"[:200]}
                print(f"# 480p {name} failed: {type(e).__name__}: {e}",
                      flush=True)

        del dense

    # ---- larger workloads: pair-delta only (memory-bounded cache) ------- #
    if not args.skip_large:
        for label, big_kw in (
                ("720p", dict(resolution="720p", aspect_ratio="9:16",
                              num_frames="2s")),
                ("480p_4s", dict(resolution="480p", aspect_ratio="9:16",
                                 num_frames="4s"))):
            try:
                d = engine_for(None)
                d.generate("warmup", seed=0, **big_kw)
                t_d, tim_d = timed(d, big_kw, f"{label} dense")
                params_b = d.driver_worker.params
                row = {"dense_s": round(t_d, 3),
                       "dense_denoise_s": round(tim_d["denoise"], 3)}
                for name, over in (("pair3", dict(pair_broadcast=True,
                                                  pair_range=3)),
                                   ("pair4", dict(pair_broadcast=True,
                                                  pair_range=4)),
                                   ("pair3_wide",
                                    dict(pair_broadcast=True, pair_range=3,
                                         pair_threshold=(250, 950)))):
                    try:
                        eng = engine_for(over, params=params_b)
                        eng.generate("warmup", seed=0, **big_kw)
                        t, tim = timed(eng, big_kw, f"{label} {name}")
                        row[name] = {
                            "latency_s": round(t, 3),
                            "denoise_s": round(tim.get("denoise", 0), 3),
                            "e2e_speedup": round(t_d / t, 3),
                            "denoise_speedup": round(
                                tim_d["denoise"] / tim["denoise"], 3)
                            if tim.get("denoise") else None,
                        }
                        del eng
                    except Exception as e:
                        row[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
                        print(f"# {label} {name} failed: {e}", flush=True)
                results[label] = row
                del d
            except Exception as e:
                results[label] = {"error": f"{type(e).__name__}: {e}"[:200]}
                print(f"# {label} dense failed: {e}", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    print("PAB SPEED DONE")


if __name__ == "__main__":
    main()
