"""Per-family real-chip step times: dense + default-PAB at one canonical
workload each (VERDICT r3 Next #5 — the framework claims 5 families, the
reference publishes PAB results for every family in docs/pab.md, and until
round 4 only Open-Sora had measured numbers).

Weights are random-init at the REAL default model dims (zero-egress image;
latency is weight-agnostic). Workloads are the reference sample defaults
(examples/inference/*/sample.py):

  Latte            16f  512x512   50 DDIM steps
  CogVideoX-2b     49f  480x720   50 DDIM steps
  OSP v1.2 29x480p 29f  352x640  100 EulerAncestral steps
  Vchitect-XL      40f  288x480  100 flow-match steps (2 model evals/step)

Open-Sora's numbers live in bench.py / docs/performance.md.

Writes docs/family_bench.json.

Run:  python experiments/family_bench.py [--out docs/family_bench.json]
      [--families latte,cogvideox,osp,vchitect] [--steps-scale 1.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed_generate(pipe_generate, kwargs, label, runs=2):
    dts = []
    for i in range(1, runs + 1):
        t0 = time.perf_counter()
        out = pipe_generate(seed=i, **kwargs)
        np.asarray(out.video[..., :1, :1, :])
        dts.append(time.perf_counter() - t0)
    print(f"# {label}: {[round(d, 2) for d in dts]}", flush=True)
    return min(dts)


def bench_family(name, build, steps_scale):
    """build() -> (dense_generate, pab_generate, gen_kwargs, n_steps)."""
    try:
        dense_gen, pab_gen, kw, n_steps = build(steps_scale)
        dense_gen(seed=0, **kw)  # compile
        t_dense = timed_generate(dense_gen, kw, f"{name} dense")
        row = {"dense_s": round(t_dense, 3), "steps": n_steps,
               "dense_s_per_step": round(t_dense / n_steps, 4)}
        if pab_gen is not None:
            try:
                pab_gen(seed=0, **kw)  # compile
                t_pab = timed_generate(pab_gen, kw, f"{name} pab")
                row.update({"pab_s": round(t_pab, 3),
                            "pab_speedup": round(t_dense / t_pab, 3)})
            except Exception as e:
                row["pab_error"] = f"{type(e).__name__}: {e}"[:200]
                print(f"# {name} pab failed: {e}", flush=True)
        return row
    except Exception as e:
        print(f"# {name} failed: {type(e).__name__}: {e}", flush=True)
        return {"error": f"{type(e).__name__}: {e}"[:200]}


def build_latte(scale):
    from videosys_tpu.pipelines.latte.pipeline_latte import (
        LatteConfig, LattePABConfig, LattePipeline)

    steps = max(2, int(50 * scale))
    kw = dict(prompt="a cat playing with a ball of yarn", video_length=16,
              height=512, width=512, num_inference_steps=steps)
    dense = LattePipeline(LatteConfig(model_path=None, dtype="bf16"))
    pab = LattePipeline(
        LatteConfig(model_path=None, dtype="bf16", enable_pab=True,
                    pab_config=LattePABConfig(cache_dtype="float8_e4m3fn")),
        params=dense.params)
    return dense.generate, pab.generate, kw, steps


def build_cogvideox(scale):
    from videosys_tpu.pipelines.cogvideox.pipeline_cogvideox import (
        CogVideoXConfig, CogVideoXPABConfig, CogVideoXPipeline)

    steps = max(2, int(50 * scale))
    kw = dict(prompt="a cat playing with a ball of yarn", num_frames=49,
              height=480, width=720, num_inference_steps=steps)
    dense = CogVideoXPipeline(CogVideoXConfig(model_path=None, dtype="bf16"))
    pab = CogVideoXPipeline(
        CogVideoXConfig(model_path=None, dtype="bf16", enable_pab=True,
                        pab_config=CogVideoXPABConfig(
                            cache_dtype="float8_e4m3fn")),
        params=dense.params)
    return dense.generate, pab.generate, kw, steps


def build_osp(scale):
    from videosys_tpu.pipelines.open_sora_plan.pipeline_open_sora_plan import (
        OpenSoraPlanConfig, OpenSoraPlanPipeline, OpenSoraPlanV120PABConfig)

    steps = max(2, int(100 * scale))
    kw = dict(prompt="a cat playing with a ball of yarn",
              num_inference_steps=steps)
    # 29x480p (the config default, a real reference variant
    # pipeline_open_sora_plan.py:198): 93x480p's 84k-token full-3D attention
    # needs 17.2 GiB dense and cannot fit one 16 GiB v5e at any batch size
    # (measured compile OOM) — that workload is multi-chip territory (sp>=2).
    cfg = OpenSoraPlanConfig(transformer=None, vae=None, text_encoder=None,
                             version="v120", transformer_type="29x480p")
    dense = OpenSoraPlanPipeline(cfg)
    pab_cfg = OpenSoraPlanConfig(
        transformer=None, vae=None, text_encoder=None,
        version="v120", transformer_type="29x480p", enable_pab=True,
        pab_config=OpenSoraPlanV120PABConfig(cache_dtype="float8_e4m3fn"))
    pab = OpenSoraPlanPipeline(pab_cfg, params=dense.params)
    return dense.generate, pab.generate, kw, steps


def build_vchitect(scale):
    from videosys_tpu.pipelines.vchitect.pipeline_vchitect import (
        VchitectConfig, VchitectPABConfig, VchitectXLPipeline)

    steps = max(2, int(100 * scale))
    kw = dict(prompt="a cat playing with a ball of yarn", width=480,
              height=288, frames=40, num_inference_steps=steps)
    dense = VchitectXLPipeline(VchitectConfig(model_path=None, dtype="bf16"))
    pab = VchitectXLPipeline(
        VchitectConfig(model_path=None, dtype="bf16", enable_pab=True,
                       pab_config=VchitectPABConfig(
                           cache_dtype="float8_e4m3fn")),
        params=dense.params)
    return dense.generate, pab.generate, kw, steps


BUILDERS = {"latte": build_latte, "cogvideox": build_cogvideox,
            "osp": build_osp, "vchitect": build_vchitect}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/family_bench.json")
    ap.add_argument("--families", default="latte,cogvideox,osp,vchitect")
    ap.add_argument("--steps-scale", type=float, default=1.0,
                    help="scale canonical step counts (dev shortcut)")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # merge into an existing out-file so each family can run in a fresh
    # process (isolates HBM and any runtime fault between families)
    results = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                results = json.load(f)
        except Exception:
            results = {}
    results["device"] = jax.devices()[0].device_kind
    for fam in args.families.split(","):
        fam = fam.strip()
        print(f"== {fam}", flush=True)
        results[fam] = bench_family(fam, BUILDERS[fam], args.steps_scale)
        # free HBM between families
        import gc

        gc.collect()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    print("FAMILY BENCH DONE")


if __name__ == "__main__":
    main()
