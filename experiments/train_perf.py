"""Training-step throughput sweep on one chip: bucket x remat policy x bs.

Measures `make_train_step` wall time and model FLOP/s (MFU) for STDiT3 at
DCP-style buckets, the training-side companion of the inference chronology in
docs/performance.md. The reference reports training throughput from its DCP
profiler runs (core/dcp/profiler.py); here the same step builder the profiler
uses is timed directly on the real chip.

Usage:
  python experiments/train_perf.py --depth 14 --buckets 240p16,480p51 \
      --policies none,dots,full --bs 1
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# (name, (height, width), pixel frames)
BUCKETS = {
    "144p16": ((144, 256), 16),
    "240p16": ((240, 426), 16),
    "240p51": ((240, 426), 51),
    "480p16": ((480, 848), 16),
    "480p51": ((480, 848), 51),
}

_PEAK = {"TPU v5 lite": 197e12, "TPU v5": 459e12, "TPU v4": 275e12,
         "TPU v6 lite": 918e12, "TPU v6e": 918e12}


def _train_flops(mc, B, T, S, L):
    """fwd + bwd (2x fwd) model matmul/attention FLOPs; remat recompute is
    NOT counted (true model FLOPs, the MFU convention of the scaling book).
    Reuses the bench's per-step forward count (bench.py)."""
    from bench import _stdit3_flops_per_step

    return 3 * _stdit3_flops_per_step(mc, B, T, S, L)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=14)
    ap.add_argument("--hidden", type=int, default=1152)
    ap.add_argument("--buckets", default="240p16")
    ap.add_argument("--policies", default="none,dots,full")
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--force-flash", default="auto", choices=("auto", "0", "1"),
                    help="override the attention dispatch (A/B the Pallas "
                         "flash fwd+bwd vs XLA reference attention in the "
                         "full train step)")
    ap.add_argument("--kv", type=int, default=300,
                    help="text-KV length (the bucketed pipelines run 64)")
    ap.add_argument("--out", default=None, help="append JSON rows here")
    args = ap.parse_args()
    if args.force_flash != "auto":
        os.environ["VIDEOSYS_FORCE_FLASH"] = args.force_flash

    from videosys_tpu.models.transformers.stdit3 import STDiT3, STDiT3Config
    from videosys_tpu.schedulers.rflow import RFlowScheduler
    from videosys_tpu.training import train_step as ts

    dev = jax.devices()[0]
    peak = _PEAK.get(dev.device_kind)
    print(f"# device={dev.device_kind} peak={peak and peak / 1e12} TF/s")

    for bname in args.buckets.split(","):
        (h, w), nf = BUCKETS[bname]
        for policy in args.policies.split(","):
            mc = STDiT3Config(depth=args.depth, hidden_size=args.hidden,
                              dtype=jnp.bfloat16)
            model = STDiT3(mc, remat=policy != "none", remat_policy=policy)
            sched = RFlowScheduler()
            tx = ts.make_optimizer()
            # latent dims: OpenSora VAE, 17 pixel frames -> 5 latent, 8x space
            t_lat = -(-nf // 17) * 5 if nf > 1 else 1
            h_lat, w_lat = h // 8, w // 8
            B = args.bs
            rng = jax.random.key(0)
            x = jax.random.normal(rng, (B, 4, t_lat, h_lat, w_lat), jnp.float32)
            y = jax.random.normal(rng, (B, args.kv, mc.caption_channels), jnp.float32)
            batch = {"x": x, "y": y,
                     "kv_mask": jnp.ones((B, args.kv), bool),
                     "fps": jnp.full((B,), 24.0, jnp.float32)}
            params = model.init(jax.random.key(1), batch["x"],
                                jnp.zeros((B,)), batch["y"],
                                kv_mask=batch["kv_mask"], fps=batch["fps"],
                                height=float(h), width=float(w))
            state = ts.create_train_state(params, tx)
            step = jax.jit(ts.make_train_step(model, sched, tx, float(h),
                                              float(w), num_frames=nf),
                           donate_argnums=(0,))
            T_tok = -(-t_lat // mc.patch_size[0])
            S_tok = (-(-h_lat // mc.patch_size[1])) * (-(-w_lat // mc.patch_size[2]))
            try:
                compiled = step.lower(state, rng, batch).compile()
                mem = compiled.memory_analysis()
                state, m = compiled(state, rng, batch)
                # NOTE: block_until_ready is a no-op on tunneled backends;
                # a host scalar read is the only reliable completion barrier
                float(m["loss"])
                t0 = time.perf_counter()
                for i in range(args.steps):
                    state, m = compiled(state, jax.random.fold_in(rng, i), batch)
                float(m["loss"])
                dt = (time.perf_counter() - t0) / args.steps
            except Exception as e:
                print(f"bucket={bname} policy={policy}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")
                if args.out:
                    import json

                    with open(args.out, "a") as f:
                        f.write(json.dumps({
                            "bucket": bname, "bs": B, "policy": policy,
                            "flash": args.force_flash, "depth": args.depth,
                            "status": f"compile_failed: {type(e).__name__}: "
                                      f"{str(e)[:120]}"}) + "\n")
                continue
            fl = _train_flops(mc, B, T_tok, S_tok, args.kv)
            tfs = fl / dt / 1e12
            mfu = fl / dt / peak if peak else float("nan")
            tmp = getattr(mem, "temp_size_in_bytes", 0) / 2**30
            print(f"bucket={bname} bs={B} policy={policy} "
                  f"flash={args.force_flash}: {dt * 1e3:.1f} ms/step"
                  f"  {tfs:.1f} TF/s  MFU={mfu:.3f}  temp={tmp:.2f} GiB"
                  f"  tokens={T_tok}x{S_tok}", flush=True)
            if args.out:
                import json

                with open(args.out, "a") as f:
                    f.write(json.dumps({
                        "bucket": bname, "bs": B, "policy": policy,
                        "flash": args.force_flash, "depth": args.depth,
                        "ms_per_step": round(dt * 1e3, 1),
                        "tf_s": round(tfs, 1), "mfu": round(mfu, 4),
                        "temp_gib": round(tmp, 2)}) + "\n")


if __name__ == "__main__":
    main()
