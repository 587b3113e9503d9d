"""PAB quality-gate evidence on TRAINED weights (v2 protocol).

The BASELINE gate — latent PSNR >= 35 dB, PAB on vs off — is a property of
trained models: PAB reuses attention/MLP outputs across adjacent denoise
steps, which only stay close when the learned velocity field is smooth along
the sampling trajectory. Random-init weights are chaotic step-to-step, so
bench.py's random-weights PSNR (~25 dB) is a floor, not the gate.

v2 upgrades over the round-3 evidence (VERDICT r3 Weak #4 / Next #6):
* model depth 8 / hidden 128 (was 4/96) — deeper residual stream, a harder
  regime for step-to-step redundancy;
* COMPOSITIONAL scene set: 20 (spatial-pattern x motion) combinations,
  16 trained / 4 HELD OUT — held-out prompts measure PAB fidelity on
  outputs the model composes rather than memorizes;
* SSIM column next to PSNR (the reference protocol scores PSNR/SSIM/LPIPS,
  eval/pab/common_metrics/eval.py; LPIPS needs a pretrained perceptual net,
  unavailable in this zero-egress image — recorded as such);
* sweep includes the TPU-first extension ladders (full-depth `mlp_range`
  broadcast, `pair_broadcast` residual cache — core/pab.py) whose speed
  legs bench.py reports.

Replicates the reference protocol end-to-end on real hardware
(`/root/reference/eval/pab/experiments/attn_ablation.py` +
`eval/pab/common_metrics/eval.py`: same model, PAB on/off, same seed,
score the pair):

1. train a small STDiT3 to convergence on the deterministic compositional
   latent dataset (rflow objective, the actual `run_training` loop);
2. generate with the trained EMA weights, dense vs PAB, same seed, through
   the actual `VideoSysEngine` pipeline (30 rflow steps);
3. sweep PAB ladders -> PSNR/SSIM vs structural step savings.

Run:  python experiments/pab_quality.py [--steps 16000] [--out docs/pab_quality.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_SPATIAL = 5
N_MOTION = 4
# held-out (spatial, motion) combos — never seen in training
HELD_OUT = ((0, 3), (1, 2), (3, 0), (4, 1))
SHAPE_WORDS = ("circle", "stripe", "spiral", "lattice", "ripple")
MOTION_WORDS = ("drifting", "pulsing", "rotating", "flowing")


def combo_prompt(si: int, mi: int) -> str:
    return f"{SHAPE_WORDS[si]} {MOTION_WORDS[mi]}"


def combo_latent(si: int, mi: int, shape=(4, 5, 24, 24)) -> np.ndarray:
    """Deterministic compositional latent: spatial Fourier pattern from the
    shape factor x temporal modulation from the motion factor. The factors
    are independent, so a converged model can compose held-out pairs."""
    C, T, H, W = shape
    srng = np.random.default_rng(2000 + si)   # spatial params: shape only
    mrng = np.random.default_rng(3000 + mi)   # temporal params: motion only
    t = np.linspace(0.0, 1.0, T)[:, None, None]
    h = np.linspace(0.0, 1.0, H)[None, :, None]
    w = np.linspace(0.0, 1.0, W)[None, None, :]
    lat = np.zeros(shape, np.float32)
    for c in range(C):
        for _ in range(3):
            fh, fw = srng.uniform(0.5, 1.8, 2)
            ph, pw = srng.uniform(0, 2 * np.pi, 2)
            amp = srng.uniform(0.4, 1.0)
            ft = mrng.uniform(0.5, 1.8)
            pt = mrng.uniform(0, 2 * np.pi)
            lat[c] += amp * (np.sin(2 * np.pi * (fh * h) + ph)
                             * np.sin(2 * np.pi * (fw * w) + pw)
                             * np.cos(2 * np.pi * (ft * t) + pt))
    return (lat / max(lat.std(), 1e-6) * 0.7).astype(np.float32)


TRAIN_COMBOS = [(s, m) for s in range(N_SPATIAL) for m in range(N_MOTION)
                if (s, m) not in HELD_OUT]


class ComboLatentDataset:
    """run_training-compatible dataset over the 16 TRAINED combos."""

    def __init__(self, size: int = 256):
        self._size = size

    def __len__(self):
        return self._size

    def shapes(self):
        return [(17, 192, 192)] * self._size

    def shape_of(self, i):
        return (17, 192, 192)

    def load_latents(self, indices, latent_thw, rng_seed: int = 0):
        del rng_seed
        lats = [combo_latent(*TRAIN_COMBOS[int(i) % len(TRAIN_COMBOS)],
                             (4, *latent_thw))
                for i in indices]
        return np.stack(lats)


def latent_psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR over latents with the dense run's dynamic range as the peak."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    peak = float(b.max() - b.min())
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(peak ** 2 / max(mse, 1e-12))


def video_ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Mean SSIM over frames/channels (uint8 videos [B,T,H,W,C]): the
    standard 11x11 gaussian-window formula the reference protocol uses
    (eval/pab/common_metrics/calculate_ssim.py), in pure numpy."""
    from numpy.lib.stride_tricks import sliding_window_view

    k = np.arange(11) - 5.0
    g = np.exp(-(k ** 2) / (2 * 1.5 ** 2))
    win = np.outer(g, g)
    win /= win.sum()
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2

    def frame_ssim(x, y):  # [H, W] float64
        xw = sliding_window_view(x, (11, 11))
        yw = sliding_window_view(y, (11, 11))
        mx = (xw * win).sum(axis=(-1, -2))
        my = (yw * win).sum(axis=(-1, -2))
        sxx = (xw ** 2 * win).sum(axis=(-1, -2)) - mx ** 2
        syy = (yw ** 2 * win).sum(axis=(-1, -2)) - my ** 2
        sxy = (xw * yw * win).sum(axis=(-1, -2)) - mx * my
        num = (2 * mx * my + C1) * (2 * sxy + C2)
        den = (mx ** 2 + my ** 2 + C1) * (sxx + syy + C2)
        return float((num / den).mean())

    a = a.astype(np.float64)
    b = b.astype(np.float64)
    vals = [frame_ssim(a[bi, ti, :, :, ci], b[bi, ti, :, :, ci])
            for bi in range(a.shape[0])
            for ti in range(0, a.shape[1], max(1, a.shape[1] // 6))
            for ci in range(a.shape[4])]
    return float(np.mean(vals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16000)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--lr-decay", action="store_true",
                    help="cosine-decay the LR to lr/10 over the run (v3: "
                         "the constant-LR v2 fit plateaued short of scene "
                         "fidelity)")
    ap.add_argument("--guidance", type=float, default=4.0)
    ap.add_argument("--out", default="docs/pab_quality.json")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend (smoke testing)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from videosys_tpu import OpenSoraConfig, OpenSoraPABConfig, VideoSysEngine
    from videosys_tpu.models.autoencoders.autoencoder_open_sora import (
        OpenSoraVAE, OpenSoraVAEConfig)
    from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D
    from videosys_tpu.models.autoencoders.vae_temporal import VAETemporal
    from videosys_tpu.models.text_encoders.t5 import StubTextEncoder
    from videosys_tpu.models.transformers.stdit3 import STDiT3Config
    from videosys_tpu.pipelines.open_sora.data_process import text_preprocessing
    from videosys_tpu.training.train import TrainConfig, run_training

    mc = STDiT3Config(depth=args.depth, hidden_size=args.hidden,
                      num_heads=args.heads,
                      caption_channels=32, model_max_length=8,
                      patch_size=(1, 2, 2))

    # the SAME deterministic stub encoder serves training and inference, so
    # the conditioning seen at eval is exactly the trained conditioning
    enc = StubTextEncoder(output_dim=mc.caption_channels,
                          max_length=mc.model_max_length)

    def text_embed_fn(micro_idx):
        prompts = [text_preprocessing(
            combo_prompt(*TRAIN_COMBOS[int(i) % len(TRAIN_COMBOS)]))
            for i in micro_idx]
        return enc.encode(prompts)

    ds = ComboLatentDataset(size=256)
    cfg = TrainConfig(
        model=mc,
        bucket_config={"144p": {17: (1.0, 8)}},
        mask_ratios=None,
        lr=args.lr, warmup_steps=100, grad_clip=1.0, ema_decay=0.995,
        lr_decay_steps=args.steps if args.lr_decay else None,
        epochs=10_000, max_steps=args.steps,
        log_every=min(500, max(1, args.steps // 2)),
        dataset_size=len(ds), seed=args.seed,
        ckpt_every=None, remat_policy="none",
    )
    t0 = time.time()
    state, ema_params, history = run_training(cfg, dataset=ds,
                                              text_embed_fn=text_embed_fn)
    train_s = time.time() - t0
    losses = [h["loss"] for h in history] or [float("nan")]
    print(f"# trained {args.steps} steps in {train_s:.0f}s; "
          f"loss {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)

    # --- inference with the trained EMA weights -------------------------- #
    # 8x-spatial tiny VAE => latent (4, 5, 24, 24) for 17f/192x192, matching
    # the training latents' shape (training ran in latent space)
    vae = OpenSoraVAE(
        OpenSoraVAEConfig(micro_frame_size=17, micro_batch_size=4),
        spatial=AutoencoderKL2D(mid_block_add_attention=False,
                                block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, num_groups=4),
        temporal=VAETemporal(filters=8, num_res_blocks=1, num_groups=4),
    )
    tparams = jax.device_get(state.params)
    if "params" in tparams and ema_params is not None:
        tparams = dict(tparams, params=jax.device_get(ema_params))
    shared = {"transformer": tparams,
              "vae": vae.init(jax.random.key(args.seed + 7))}

    def make_engine(pab_cfg):
        c = OpenSoraConfig(
            transformer=None, vae=None, text_encoder=None,
            num_sampling_steps=30, dtype="fp32", transformer_config=mc,
            enable_pab=pab_cfg is not None, pab_config=pab_cfg)
        e = VideoSysEngine(c, vae=vae, params=shared)
        e.driver_worker.keep_latents = True
        return e

    # guidance 4.0 is meaningful because training ran with caption dropout
    # (class_dropout_prob=0.1), which trains the null embedding CFG uses
    gen_kwargs = dict(resolution="144p", aspect_ratio="1:1", num_frames=17,
                      guidance_scale=args.guidance, aes=None, verbose=False)
    trained_eval = ((0, 0), (1, 1), (2, 2), (4, 3))  # in-distribution combos
    eval_combos = list(trained_eval) + list(HELD_OUT)
    prompts = {c: combo_prompt(*c) for c in eval_combos}
    seeds = {c: 17 + 7 * c[0] + c[1] for c in eval_combos}

    dense = make_engine(None)
    dense_lat, dense_vid, fidelity = {}, {}, {}
    for c in eval_combos:
        out = dense.generate(prompts[c], seed=seeds[c], **gen_kwargs)
        dense_lat[c] = dense.driver_worker.last_latents
        dense_vid[c] = out.video
        # fidelity: does the dense generation match the COMPOSED target?
        # (underfit models make PAB trivially exact; held-out combos also
        # measure compositional generalization — reported separately)
        gen = dense_lat[c][0].reshape(-1).astype(np.float64)
        tgt = combo_latent(*c).reshape(-1).astype(np.float64)
        fidelity[c] = float(np.corrcoef(gen, tgt)[0, 1])
        tag = "HELD-OUT" if c in HELD_OUT else "trained"
        print(f"# {prompts[c]} [{tag}]: corr(target)={fidelity[c]:.3f}",
              flush=True)
    fid_trained = float(np.mean([fidelity[c] for c in trained_eval]))
    fid_held = float(np.mean([fidelity[c] for c in HELD_OUT]))
    print(f"# fidelity: trained={fid_trained:.3f} held-out={fid_held:.3f}",
          flush=True)

    # PAB ladders: reference config, heavier points, and the TPU-first
    # extension ladders whose speed legs bench.py measures
    sweep = {
        "ref_default(s2,t4,c6,mlp)": dict(),
        "heavy(s3,t6,c8,mlp)": dict(spatial_range=3, temporal_range=6,
                                    cross_range=8),
        "mlp_range2(s2,t4,c6,mlpR2)": dict(mlp_range=2),
        "mlp_range3(s3,t6,c8,mlpR3)": dict(spatial_range=3, temporal_range=6,
                                           cross_range=8, mlp_range=3),
        "pair2": dict(pair_broadcast=True, pair_range=2),
        "pair3": dict(pair_broadcast=True, pair_range=3),
        "pair4": dict(pair_broadcast=True, pair_range=4),
        "pair3_wide(250,950)": dict(pair_broadcast=True, pair_range=3,
                                    pair_threshold=(250, 950)),
    }

    from videosys_tpu.core.pab import build_plans
    from videosys_tpu.schedulers.rflow import RFlowConfig, RFlowScheduler

    sched = RFlowScheduler(RFlowConfig(num_sampling_steps=30,
                                       use_timestep_transform=True))
    ts = sched.prepare_timesteps(192, 192, 17)

    results = {}
    for name, over in sweep.items():
        pab_cfg = OpenSoraPABConfig(**over)
        eng = make_engine(pab_cfg)
        psnrs, held_psnrs, vid_psnrs, ssims = [], [], [], []
        for c in eval_combos:
            out = eng.generate(prompts[c], seed=seeds[c], **gen_kwargs)
            p = latent_psnr(eng.driver_worker.last_latents, dense_lat[c])
            (held_psnrs if c in HELD_OUT else psnrs).append(p)
            mse = float(np.mean((out.video.astype(np.float32)
                                 - dense_vid[c].astype(np.float32)) ** 2))
            vid_psnrs.append(10 * np.log10(255.0 ** 2 / max(mse, 1e-10)))
            ssims.append(video_ssim(out.video, dense_vid[c]))
        # structural savings: fraction of (branch x step) evaluations
        # replaced by cache reads (the single-chip speedup driver); pair
        # mode counts the whole pair (all three components) as read
        plans = build_plans(pab_cfg, ts, mc.depth, np.float32)
        saved = sum(3 * int(pl.pair) or (int(pl.spatial) + int(pl.temporal)
                                         + int(pl.cross)) for pl in plans)
        total = 3 * len(plans)
        all_psnrs = psnrs + held_psnrs
        results[name] = {
            "branch_reads_frac": round(saved / total, 3),
            "latent_psnr_db": round(float(np.mean(all_psnrs)), 2),
            "latent_psnr_min_db": round(float(np.min(all_psnrs)), 2),
            "latent_psnr_trained_db": round(float(np.mean(psnrs)), 2),
            "latent_psnr_held_out_db": round(float(np.mean(held_psnrs)), 2),
            "video_psnr_db": round(float(np.mean(vid_psnrs)), 2),
            "video_ssim": round(float(np.mean(ssims)), 4),
            "overrides": over,
        }
        r = results[name]
        print(f"# {name}: latent {r['latent_psnr_db']} dB (min "
              f"{r['latent_psnr_min_db']}, held-out "
              f"{r['latent_psnr_held_out_db']}), video {r['video_psnr_db']} "
              f"dB, ssim {r['video_ssim']}", flush=True)

    rec = {
        "protocol": f"v3: trained STDiT3 d{args.depth}/h{args.hidden} on 16 "
                    "compositional (shape x motion) scenes with 4 HELD-OUT "
                    f"combos, rflow + caption dropout, {args.steps} steps, "
                    f"lr {args.lr}"
                    + (" cosine-decayed to lr/10" if args.lr_decay else "")
                    + "; dense vs PAB, per-prompt seeds, 30 steps, latent "
                    "PSNR peak=dense dynamic range; SSIM = 11x11-gaussian "
                    "frame SSIM",
        "lpips": "unavailable: zero-egress image has no pretrained "
                 "perceptual net (reference protocol scores it via the "
                 "lpips package, eval/pab/common_metrics/eval.py)",
        "train_loss_first": round(float(losses[0]), 4),
        "train_loss_last": round(float(losses[-1]), 4),
        "train_seconds": round(train_s, 1),
        "guidance_scale": args.guidance,
        "backend": jax.default_backend(),
        "scene_fidelity_corr_trained": round(fid_trained, 4),
        "scene_fidelity_corr_held_out": round(fid_held, 4),
        "scene_fidelity_per_prompt": {prompts[c]: round(v, 4)
                                      for c, v in fidelity.items()},
        "gate": "latent PSNR >= 35 dB at some PAB config (on a model whose "
                "dense output matches the composed scenes)",
        # validity precondition: the PSNR columns only evidence the gate if
        # the dense model actually generates the trained scenes (VERDICT r4
        # Weak #2 — v2 shipped gate_met=true with fidelity 0.32 undisclosed)
        "fidelity_valid": fid_trained >= 0.9,
        "gate_met": bool(fid_trained >= 0.9 and any(
            r["latent_psnr_db"] >= 35.0 for r in results.values())),
        "results": results,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: v for k, v in rec.items() if k != "results"}))
    print("PAB QUALITY DONE; gate_met =", rec["gate_met"])


if __name__ == "__main__":
    main()
