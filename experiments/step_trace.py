"""Rank device-op costs of one dense STDiT3 denoise step from a Perfetto
trace — the measurement loop behind docs/performance.md's "where the
remaining time is" table (reference analog: the per-module TimeStamp
instrumentation in core/dcp/recompute.py).

Usage:
  python experiments/step_trace.py [--res 480p] [--frames 51] [--kv 64] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_step(res, frames, kv):
    from videosys_tpu.models.autoencoders.autoencoder_open_sora import (
        OpenSoraVAE, OpenSoraVAEConfig)
    from videosys_tpu.models.transformers.stdit3 import STDiT3, STDiT3Config
    from videosys_tpu.pipelines.open_sora.pipeline_open_sora import (
        get_image_size, get_num_frames)

    (h, w) = get_image_size(res, "9:16")
    T = get_num_frames(frames)
    lt, lh, lw = OpenSoraVAE(OpenSoraVAEConfig()).get_latent_size((T, h, w))
    config = STDiT3Config(dtype=jnp.bfloat16)
    model = STDiT3(config)
    B = 2  # CFG pair
    x = jax.random.normal(jax.random.key(0),
                          (B, config.in_channels, lt, lh, lw))
    t = jnp.full((B,), 500.0, jnp.float32)
    y = jax.random.normal(jax.random.key(1), (B, kv, config.caption_channels))
    kv_mask = jnp.ones((B, kv), bool)
    fps = jnp.full((B,), 24.0, jnp.float32)
    params = model.init(jax.random.key(2), x[:1], t[:1], y[:1],
                        kv_mask=kv_mask[:1], fps=fps[:1],
                        height=float(h), width=float(w))

    @jax.jit
    def step(params, x, t, y, kv_mask, fps):
        return model.apply(params, x, t, y, kv_mask=kv_mask, fps=fps,
                           height=float(h), width=float(w))

    return step, (params, x, t, y, kv_mask, fps)


def aggregate(logdir, top, n_steps=1):
    """Sum device-stream event durations by op name from the trace.json.gz.

    Restricts the sum to the per-op 'XLA Ops' thread lines: XLA TPU traces
    put overlapping envelope lines ('XLA Modules', 'Steps', TraceMe) in the
    SAME pid as the per-op line, so summing every 'X' event double/triple
    counts. Totals are divided by ``n_steps`` (the number of step()
    invocations inside the trace window) so the print is per-step."""
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace found under", logdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device pids: anchor on the canonical '/device:TPU:' process-name
    # prefix; host-side process names can also contain 'XLA'
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items() if "/device:TPU:" in n}
    if not dev_pids:  # fall back, but say so (layouts vary across versions)
        dev_pids = {p for p, n in pid_names.items()
                    if "TPU" in n or "/device" in n.lower()}
        print(f"# warn: no '/device:TPU:' pid; fallback matched "
              f"{sorted(pid_names[p] for p in dev_pids)}")
    if len(dev_pids) > 4:
        print(f"# warn: {len(dev_pids)} device pids matched — check layout")
    # per-op thread lines: 'XLA Ops' tids only (envelope lines like
    # 'XLA Modules'/'Steps' share the pid and would double-count)
    op_tids = {(e["pid"], e["tid"])
               for e in events if e.get("ph") == "M"
               and e.get("name") == "thread_name" and "args" in e
               and e["pid"] in dev_pids
               and "XLA Ops" in e["args"].get("name", "")}
    totals = defaultdict(float)
    counts = defaultdict(int)
    wall = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if op_tids and (e["pid"], e.get("tid")) not in op_tids:
            continue
        name = e.get("name", "")
        if name.startswith("while"):  # scan wrapper envelope, double counts
            continue
        dur = e.get("dur", 0) / 1e3 / n_steps  # us -> ms, per step
        totals[name] += dur
        counts[name] += 1
        wall += dur
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    print(f"{'ms':>9}  {'n':>5}  op  (device total {wall:.1f} ms/step, "
          f"{n_steps} step(s) traced)")
    for name, ms in rows:
        print(f"{ms:9.2f}  {counts[name]:5d}  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="480p")
    ap.add_argument("--frames", default="2s")
    ap.add_argument("--kv", type=int, default=64)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/step_trace")
    args = ap.parse_args()

    step, args_ = build_step(args.res, args.frames, args.kv)
    out = step(*args_)  # compile
    float(jnp.sum(out))
    import shutil
    shutil.rmtree(args.logdir, ignore_errors=True)
    n_steps = 2
    jax.profiler.start_trace(args.logdir)
    for _ in range(n_steps):
        out = step(*args_)
    float(jnp.sum(out))
    jax.profiler.stop_trace()
    aggregate(args.logdir, args.top, n_steps=n_steps)


if __name__ == "__main__":
    main()
