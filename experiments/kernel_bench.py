"""Attention kernel benchmark: Pallas flash vs XLA reference, fwd and
fwd+bwd, time + peak temp memory — the TPU analog of the reference's
tests/kernel_benchmark.py (flash_attn wheel vs torch matmul attention on
CUDA; memory read from torch.cuda.max_memory_allocated, here from the
compiled executable's memory_analysis, which XLA plans exactly).

Usage:
  python experiments/kernel_bench.py --bs 30 --heads 16 --seq 1590 --dim 72
  python experiments/kernel_bench.py --seq 6360   # 720p-class, KV-blocked bwd
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, args, iters=5):
    """Per-iteration timing with a D2H sync on each output (the axon tunnel's
    block_until_ready is unreliable); a measured sync-only baseline is
    subtracted so short kernels aren't skewed by the reduction+transfer."""
    out = fn(*args)
    # warmup + sync (compile happens here)
    def sync(o):
        return float(sum(jnp.sum(jnp.abs(a).astype(jnp.float32))
                         for a in jax.tree.leaves(o)))
    sync(out)
    # sync-only baseline: reduce+transfer an already-materialized output
    t0 = time.time()
    for _ in range(iters):
        sync(out)
    t_sync = (time.time() - t0) / iters
    ts = []
    for _ in range(iters):
        t0 = time.time()
        sync(fn(*args))
        ts.append(time.time() - t0)
    return max(min(ts) - t_sync, 1e-9)


def temp_gib(fn, args):
    mem = jax.jit(fn).lower(*args).compile().memory_analysis()
    return (getattr(mem, "temp_size_in_bytes", 0) or 0) / 2**30


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=30)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--seq", type=int, default=1590)
    ap.add_argument("--dim", type=int, default=72)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from videosys_tpu.ops.attention import scaled_dot_product_attention as sdpa

    dt = jnp.dtype(args.dtype)
    shape = (args.bs, args.heads, args.seq, args.dim)
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(kk, shape, dt) for kk in ks)

    flops_fwd = 4 * args.bs * args.heads * args.seq**2 * args.dim

    def flash(q, k, v):
        return sdpa(q, k, v, force_flash=True)

    def ref(q, k, v):
        return sdpa(q, k, v, force_flash=False)

    def grad_of(f):
        return jax.jit(jax.grad(lambda q, k, v: jnp.sum(f(q, k, v).astype(jnp.float32)),
                                argnums=(0, 1, 2)))

    rows = []
    for name, f in (("pallas-flash", flash), ("xla-reference", ref)):
        fwd = jax.jit(f)
        try:
            t_f = bench(fwd, (q, k, v), args.iters)
            m_f = temp_gib(f, (q, k, v))
        except Exception as e:  # OOM at long seq is an expected outcome
            t_f, m_f = float("nan"), float("nan")
            print(f"{name} fwd failed: {type(e).__name__}")
        g = grad_of(f)
        try:
            t_b = bench(g, (q, k, v), args.iters)
            m_b = temp_gib(lambda q, k, v: g(q, k, v), (q, k, v))
        except Exception as e:
            t_b, m_b = float("nan"), float("nan")
            print(f"{name} bwd failed: {type(e).__name__}")
        rows.append((name, t_f, flops_fwd / t_f / 1e12 if t_f == t_f else 0,
                     m_f, t_b, m_b))

    print(f"\nshape [{args.bs},{args.heads},{args.seq},{args.dim}] {args.dtype}"
          f" on {jax.devices()[0].device_kind}")
    print(f"{'path':>14}  {'fwd ms':>8}  {'TF/s':>6}  {'fwd temp':>9}  "
          f"{'f+b ms':>8}  {'f+b temp':>9}")
    for name, t_f, tf, m_f, t_b, m_b in rows:
        print(f"{name:>14}  {t_f*1e3:8.2f}  {tf:6.1f}  {m_f:8.2f}G  "
              f"{t_b*1e3:8.2f}  {m_b:8.2f}G")


if __name__ == "__main__":
    main()
