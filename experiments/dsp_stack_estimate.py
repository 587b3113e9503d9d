"""HLO-cost-model estimate of the PAB+DSP stack on an 8-chip v5e mesh.

The reference's 10.6x PAB headline (docs/pab.md:17) stacks PAB on a
multi-GPU DSP run. Only one real chip is reachable here, so this script
produces the honest analog (VERDICT r3 Next #1c): compile the REAL-shape
sp=8 XL-2 2s/480p CFG denoise step on the 8-device fake mesh, read the
per-device collective bytes out of the compiled HLO
(videosys_tpu/utils/hlo.py — the same accounting the DSP regression gate
uses), and combine them with the MEASURED single-chip step time under an
explicit ICI bandwidth model:

    t_step(8) = t_measured_compute / 8  +  collective_bytes / BW_ici

Assumptions, stated so the number can be audited:
  * compute scales 1/8: DSP shards the spatial axis; per-chip FLOPs are
    exactly 1/8th and the single-chip MFU (0.45) is taken as achievable at
    the sharded shapes (S/8 = 795 spatial tokens/frame-group still fills
    the MXU; the same-shape bucket 240p measured 0.42 MFU single-chip).
  * ICI: v5e chips have 4 ICI links; an 8-chip slice is a 2D (4x2) torus.
    Effective all-to-all/all-gather bandwidth is swept over
    {4.5e10, 9e10, 1.8e11} B/s per chip so the estimate carries its own
    sensitivity; 9e10 is the midpoint used for the headline.
  * non-denoise phases (text encode, VAE, postprocess) are taken at their
    measured single-chip values in the "replicated VAE" rows. The
    "sharded VAE" rows split the measured VAE phase 8 ways: round 4 made
    the VAE decode mesh-aware (par.shard_frames frame sharding for the 2D
    stage + par.shard_vae_rows for the temporal stage,
    autoencoder_open_sora.py), exactness-tested on the fake mesh
    (tests/test_vae.py); its collective bytes are read from the compiled
    sp=8 real-shape decode the same way as the denoise step's.
  * PAB stacks multiplicatively on denoise only: broadcast steps skip the
    same fraction of per-chip FLOPs and, because a pair-read step skips the
    block pair INCLUDING its all-to-alls, the collective bytes scale by the
    same measured denoise ratio. This matches how the reference stacks its
    claims (PAB x DSP measured separately, docs/pab.md).

Writes docs/dsp_stack_estimate.json and prints the table.

Run (CPU fake mesh):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python experiments/dsp_stack_estimate.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:  # must run before the backend initializes (querying it would init it)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    pass  # backend already up (e.g. invoked from a session with devices)

import jax.numpy as jnp

from videosys_tpu.core import parallel as par
from videosys_tpu.models.transformers.stdit3 import STDiT3, STDiT3Config
from videosys_tpu.utils.hlo import collective_account

# measured on one v5e (BENCH_r03/r04 runs; docs/performance.md)
MEASURED = {
    "dense_e2e_s": 40.0,
    "dense_denoise_s": 36.4,
    "dense_steps": 30,
    "nondenoise_s": 40.0 - 36.4,  # text + VAE + postprocess, single chip
    "vae_s": 3.1,                 # phase_s_dense.vae, BENCH_r03
    "pab_best_denoise_ratio": 1.97,  # pair3_wide, docs/pab_speed.json
    "pab_best_e2e_single_chip": 1.80,
}

BW_SWEEP = [4.5e10, 9.0e10, 1.8e11]  # B/s effective per chip


def compile_sp8_step():
    n = 8
    mesh = par.build_mesh(par.ParallelConfig(dp_size=1, cp_size=1, sp_size=n))
    config = STDiT3Config(dtype=jnp.bfloat16)  # XL-2: depth 28, h1152
    model = STDiT3(config)
    B, L = 2, 64
    x = jax.ShapeDtypeStruct((B, 4, 15, 60, 106), jnp.float32)
    t = jax.ShapeDtypeStruct((B,), jnp.float32)
    y = jax.ShapeDtypeStruct((B, L, config.caption_channels), jnp.float32)
    kv_mask = jax.ShapeDtypeStruct((B, L), jnp.bool_)
    fps = jax.ShapeDtypeStruct((B,), jnp.float32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.key(0),
                           jnp.zeros((1, 4, 15, 60, 106)), jnp.zeros((1,)),
                           jnp.zeros((1, L, config.caption_channels)),
                           kv_mask=jnp.ones((1, L), bool),
                           fps=jnp.full((1,), 24.0),
                           height=480.0, width=848.0))
    params = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), params)

    def fwd(params, x, t, y, kv_mask, fps):
        return model.apply(params, x, t, y, kv_mask=kv_mask, fps=fps,
                           height=480.0, width=848.0)

    with par.use_mesh(mesh):
        compiled = jax.jit(fwd).lower(params, x, t, y, kv_mask, fps).compile()
    return compiled


def compile_sp8_vae_decode():
    """Real-shape (2s/480p: z [1,4,15,60,106] -> 51f 480x848 video) sharded
    VAE decode over the sp=8 mesh; returns the compiled program."""
    from videosys_tpu.models.autoencoders.autoencoder_open_sora import (
        OpenSoraVAE, OpenSoraVAEConfig)

    n = 8
    mesh = par.build_mesh(par.ParallelConfig(dp_size=1, cp_size=1, sp_size=n))
    vae = OpenSoraVAE(OpenSoraVAEConfig(dtype=jnp.bfloat16))
    z_shape = (1, 4, 15, 60, 106)
    params = jax.eval_shape(lambda: vae.init(jax.random.key(0)))
    params = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), params)
    z = jax.ShapeDtypeStruct(z_shape, jnp.float32)

    def dec(params, z):
        return vae._decode_impl(params, z, 51)

    with par.use_mesh(mesh):
        compiled = jax.jit(dec).lower(params, z).compile()
    return compiled


def main():
    compiled = compile_sp8_step()
    acct = collective_account(compiled.as_text())
    per_step_bytes = sum(acct.bytes_by_kind.values())
    by_kind = {k: v for k, v in sorted(acct.bytes_by_kind.items())}
    counts = {k: v for k, v in sorted(acct.count_by_kind.items())}
    print(f"# sp=8 XL-2 2s/480p CFG step collectives: "
          f"{per_step_bytes / 2**20:.1f} MiB/device/step  {counts}")

    vae_compiled = compile_sp8_vae_decode()
    vae_acct = collective_account(vae_compiled.as_text())
    vae_bytes = sum(vae_acct.bytes_by_kind.values())
    print(f"# sp=8 sharded VAE decode collectives: "
          f"{vae_bytes / 2**20:.1f} MiB/device  "
          f"{dict(sorted(vae_acct.count_by_kind.items()))}")

    m = MEASURED
    t_comp_1 = m["dense_denoise_s"] / m["dense_steps"]  # measured step
    rows = {}
    for bw in BW_SWEEP:
        t_comm = per_step_bytes / bw
        t_step8 = t_comp_1 / 8 + t_comm
        dense_denoise8 = t_step8 * m["dense_steps"]
        dense_e2e8 = dense_denoise8 + m["nondenoise_s"]
        # PAB scales both per-chip FLOPs and (pair-read skips the pair's
        # all-to-alls) collective bytes by the measured denoise ratio
        pab_denoise8 = dense_denoise8 / m["pab_best_denoise_ratio"]
        pab_e2e8 = pab_denoise8 + m["nondenoise_s"]
        # round 4: the VAE decode itself shards over the mesh (frames for
        # the 2D stage, latent rows for the temporal stage) — its measured
        # single-chip phase splits 8 ways plus its compiled comm bytes
        vae8 = m["vae_s"] / 8 + vae_bytes / bw
        nondenoise_sharded = m["nondenoise_s"] - m["vae_s"] + vae8
        pab_e2e8_sv = pab_denoise8 + nondenoise_sharded
        rows[f"bw_{bw:.0e}"] = {
            "t_comm_per_step_ms": round(t_comm * 1e3, 1),
            "dense_denoise_s": round(dense_denoise8, 2),
            "dense_e2e_s": round(dense_e2e8, 2),
            "pab_denoise_s": round(pab_denoise8, 2),
            "pab_e2e_s": round(pab_e2e8, 2),
            "stack_speedup_vs_1chip_dense": round(
                m["dense_e2e_s"] / pab_e2e8, 2),
            "vae_sharded_s": round(vae8, 3),
            "pab_e2e_s_sharded_vae": round(pab_e2e8_sv, 2),
            "stack_speedup_sharded_vae": round(
                m["dense_e2e_s"] / pab_e2e8_sv, 2),
        }
        print(f"# bw={bw:.1e} B/s: comm {t_comm*1e3:.1f} ms/step, "
              f"dense e2e {dense_e2e8:.1f}s, PAB+DSP e2e {pab_e2e8:.1f}s "
              f"(stack {m['dense_e2e_s']/pab_e2e8:.2f}x vs 1-chip dense); "
              f"sharded-VAE e2e {pab_e2e8_sv:.2f}s "
              f"(stack {m['dense_e2e_s']/pab_e2e8_sv:.2f}x)")

    out = {
        "workload": "OpenSora XL-2 2s/480p CFG, 30 rflow steps, sp=8",
        "collective_bytes_per_step_per_device": per_step_bytes,
        "collective_bytes_by_kind": by_kind,
        "collective_count_by_kind": counts,
        "vae_decode_collective_bytes_per_device": vae_bytes,
        "vae_decode_collective_count_by_kind": dict(
            sorted(vae_acct.count_by_kind.items())),
        "measured_inputs": m,
        "estimate": rows,
        "assumptions": "see experiments/dsp_stack_estimate.py docstring",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "dsp_stack_estimate.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path}))


if __name__ == "__main__":
    main()
