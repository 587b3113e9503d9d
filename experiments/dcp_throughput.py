"""Measured DCP training win on one chip: bucketed native-shape executables
plus the profiler's bs-escalation ladder, against two baselines.

The reference claims up to 2.1x for variable-length video training
(reference docs/dcp.md:17, README.md:11,121). Its benchmark compares the DCP
schedulers against plain bucketized training (configs/benchmarks/
{baseline,dcp_intra,dcp_inter}.yaml). The multichip part of the win (dynamic
sp, sp-balance packing) is certified by the dryrun + HLO gates; this
experiment measures the single-chip part end to end:

  * pad-to-max   — what a naive static-shape TPU trainer does: every sample
                   padded to the largest bucket's shape, bs=1.
  * bucketed     — per-bucket native-shape executables, configured bs=1,
                   fixed remat policy (the reference baseline.yaml analog).
  * DCP          — bucketed + the profiler's (bs, remat-policy) escalation
                   (`core/dcp.Profiler`): per bucket, the least-recompute
                   policy that fits and the largest power-of-two bs that
                   fits the compiled memory plan.

All step times are measured on the real chip (host-scalar-read barrier; see
docs/performance.md "Method"), then an epoch over a zipf-ish sample mix is
costed as sum_b ceil(n_b / bs_b) * t_b. Every executable is built by the
production `make_train_step` path.

Usage:
  python experiments/dcp_throughput.py                  # real chip
  python experiments/dcp_throughput.py --tiny           # CPU smoke (tests)
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _latent_thw(T, H, W):
    t_lat = max(1, T // 17 * 5) if T > 1 else 1
    return t_lat, H // 8, W // 8


def _build_step(mc, policy, thw, bs):
    """Production train step (make_train_step) at one bucket shape, jitted
    with state donation exactly like the production loop (the Profiler
    rebuilds fresh args per executed call, so donation is safe)."""
    from videosys_tpu.models.transformers.stdit3 import STDiT3
    from videosys_tpu.schedulers.rflow import RFlowConfig, RFlowScheduler
    from videosys_tpu.training import train_step as ts

    T, H, W = thw
    t_lat, h_lat, w_lat = _latent_thw(T, H, W)
    model = STDiT3(mc, remat=policy != "none", remat_policy=policy)
    sched = RFlowScheduler(RFlowConfig(use_timestep_transform=True,
                                       sample_method="logit-normal"))
    tx = ts.make_optimizer()
    rng = jax.random.key(0)
    x = jax.random.normal(rng, (bs, mc.in_channels, t_lat, h_lat, w_lat),
                          jnp.float32)
    y = jax.random.normal(rng, (bs, 8, mc.caption_channels), jnp.float32)
    batch = {"x": x, "y": y, "fps": jnp.full((bs,), 24.0, jnp.float32)}
    params = model.init(jax.random.key(1), batch["x"], jnp.zeros((bs,)),
                        batch["y"], fps=batch["fps"],
                        height=float(H), width=float(W))
    state = ts.create_train_state(params, tx)
    fn = ts.make_train_step(model, sched, tx, float(H), float(W),
                            num_frames=int(T))
    step = jax.jit(fn, donate_argnums=(0,))
    return step, state, batch


def _time_step(mc, policy, thw, bs, steps):
    """Seconds per train step, measured (host scalar read as the barrier)."""
    step, state, batch = _build_step(mc, policy, thw, bs)
    rng = jax.random.key(2)
    state, m = step(state, rng, batch)
    float(m["loss"])  # compile + warmup barrier
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, jax.random.fold_in(rng, i), batch)
    float(m["loss"])
    return (time.perf_counter() - t0) / steps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=14)
    ap.add_argument("--hidden", type=int, default=1152)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--max-bs", type=int, default=16)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: tiny model/buckets, 1 timed step")
    args = ap.parse_args(argv)

    from videosys_tpu.core.dcp import Profiler
    from videosys_tpu.models.transformers.stdit3 import STDiT3Config
    from videosys_tpu.training.buckets import Bucket

    if args.tiny:
        mc = STDiT3Config(depth=2, hidden_size=32, num_heads=2,
                          caption_channels=16, dtype=jnp.float32)
        bucket_config = {"144p": {1: (1.0, 1), 16: (1.0, 1)}}
        # zipf-ish: many small samples, few large
        mix = {("144p", 1): 6, ("144p", 16): 2}
        steps, max_bs = 1, 4
    else:
        mc = STDiT3Config(depth=args.depth, hidden_size=args.hidden,
                          dtype=jnp.bfloat16)
        bucket_config = {"144p": {16: (1.0, 1)},
                         "240p": {16: (1.0, 1), 51: (1.0, 1)}}
        mix = {("144p", 16): 60, ("240p", 16): 30, ("240p", 51): 10}
        steps, max_bs = args.steps, args.max_bs

    bucket = Bucket(bucket_config)
    # bucket ids with the first aspect entry (Profiler.profile_all convention)
    bids = {}
    for (hw_id, t_id) in mix:
        ar_id = next(iter(bucket.ar_criteria[hw_id]))
        bids[(hw_id, t_id)] = (hw_id, t_id, ar_id)

    # --- DCP discovery: production Profiler (bs ladder + remat escalation) --
    def step_builder(thw, bs, sp, policy="full"):
        # donated, like the production loop: the Profiler rebuilds example
        # args through this builder for each executed timing call
        step, state, batch = _build_step(mc, policy, thw, bs)
        return step, (state, jax.random.key(0), batch)

    prof = Profiler(bucket, step_builder, sp_candidates=(1,),
                    remat_candidates=("none", "dots", "full"),
                    bs_escalate=True, max_bs=max_bs)
    profiles = {}
    for key, bid in bids.items():
        profiles[key] = prof.profile_bucket(bid, bs=1)
        p = profiles[key]
        print(f"# profile {key}: bs={p.bs} policy={p.remat_policy} "
              f"mem={p.memory_bytes / 2**30:.2f} GiB fits={p.fits}",
              file=sys.stderr)

    # --- measured step times for the three regimes -------------------------
    max_key = max(mix, key=lambda k: math.prod(
        _latent_thw(*bucket.get_thw(bids[k]))))
    thw_max = bucket.get_thw(bids[max_key])
    n_total = sum(mix.values())

    t_pad = _time_step(mc, "full", thw_max, 1, steps)
    pad_epoch = n_total * t_pad

    bucketed_epoch = 0.0
    dcp_epoch = 0.0
    rows = []
    for key, n in mix.items():
        thw = bucket.get_thw(bids[key])
        t1 = _time_step(mc, "full", thw, 1, steps)
        bucketed_epoch += n * t1
        p = profiles[key]
        tb = _time_step(mc, p.remat_policy, thw, p.bs, steps)
        n_steps = math.ceil(n / p.bs)
        dcp_epoch += n_steps * tb
        rows.append({"bucket": f"{key[0]}x{key[1]}f", "n": n,
                     "t_bs1_s": round(t1, 4),
                     "dcp_bs": p.bs, "dcp_policy": p.remat_policy,
                     "t_dcp_s": round(tb, 4),
                     "per_sample_speedup": round(t1 / (tb / p.bs), 3)})

    out = {
        "device": jax.devices()[0].device_kind,
        "model": f"STDiT3 d{mc.depth} h{mc.hidden_size}",
        "mix": {f"{k[0]}x{k[1]}f": v for k, v in mix.items()},
        "pad_to_max_epoch_s": round(pad_epoch, 2),
        "bucketed_epoch_s": round(bucketed_epoch, 2),
        "dcp_epoch_s": round(dcp_epoch, 2),
        "dcp_vs_pad_to_max": round(pad_epoch / dcp_epoch, 3),
        "dcp_vs_bucketed": round(bucketed_epoch / dcp_epoch, 3),
        "buckets": rows,
    }
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
