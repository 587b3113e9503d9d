"""Minimal repro for the B=2/480p fused-scan TPU runtime fault
(docs/performance.md "Batched multi-prompt serving": scan L>=8 over the
CFG denoise step at B=2/480p reproducibly kills the TPU runtime — "TPU
worker process crashed", no OOM; single steps, the attention kernels at
the same shapes, scan L=2, and 240p B=2 L=30 are all fine).

The pipeline works around it with per-step dispatch for B>1
(pipeline_open_sora.py, measured equal-time). Run this after a TPU
runtime/libtpu upgrade: if it prints SCAN OK the fault is fixed and the
B>1 fallback can be retired (tests/test_pipeline_open_sora.py::
test_batched_prompts_use_per_step_dispatch is the canary pinning the
workaround's assumption).

Run:  python experiments/scan_fault_repro.py [--frames 2s] [--res 480p]
      [--batch 2] [--scan-len 8]
Exit code 0 + "SCAN OK" = no fault. A runtime crash = fault still live.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="480p")
    ap.add_argument("--frames", default="2s")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--scan-len", type=int, default=8)
    args = ap.parse_args()

    from videosys_tpu.models.autoencoders.autoencoder_open_sora import (
        OpenSoraVAE, OpenSoraVAEConfig)
    from videosys_tpu.models.transformers.stdit3 import STDiT3, STDiT3Config
    from videosys_tpu.pipelines.open_sora.data_process import (
        get_image_size, get_num_frames)

    h, w = get_image_size(args.res, "9:16")
    T = get_num_frames(args.frames)
    lt, lh, lw = OpenSoraVAE(OpenSoraVAEConfig()).get_latent_size((T, h, w))
    config = STDiT3Config(dtype=jnp.bfloat16)
    model = STDiT3(config)
    B = args.batch
    L = 64
    z = jax.random.normal(jax.random.key(0), (B, 4, lt, lh, lw))
    y = jax.random.normal(jax.random.key(1), (2 * B, L, config.caption_channels))
    kv_mask = jnp.ones((2 * B, L), bool)
    fps = jnp.full((2 * B,), 24.0, jnp.float32)
    params = model.init(jax.random.key(2), z[:1], jnp.zeros((1,)), y[:1],
                        kv_mask=kv_mask[:1], fps=fps[:1],
                        height=float(h), width=float(w))

    def step(z, t_scalar, dt):
        z_in = jnp.concatenate([z, z], axis=0).astype(jnp.bfloat16)
        t_in = jnp.full((2 * B,), t_scalar, jnp.float32)
        out = model.apply(params, z_in, t_in, y, kv_mask=kv_mask, fps=fps,
                          height=float(h), width=float(w))
        pred = out[:, :4]
        v = pred[:B] + 7.0 * (pred[:B] - pred[B:])
        return z + v * dt

    @jax.jit
    def scanned(z, ts, dts):
        def body(z, tdt):
            t, dt = tdt
            return step(z, t, dt), None

        z, _ = jax.lax.scan(body, z, (ts, dts))
        return z

    n = args.scan_len
    ts = jnp.linspace(1000.0, 30.0, n)
    dts = jnp.full((n,), 1.0 / 30)

    print(f"compiling scan L={n} at B={B}/{args.res}/{args.frames} "
          f"(latents {z.shape})...", flush=True)
    out = scanned(z, ts, dts)
    print("compiled; executing...", flush=True)
    s = float(jnp.sum(out.astype(jnp.float32)))
    print(f"SCAN OK sum={s:.3f} — fault not reproduced; the B>1 per-step "
          f"fallback in pipeline_open_sora.py can be retired", flush=True)


if __name__ == "__main__":
    main()
