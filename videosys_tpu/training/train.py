"""Open-Sora training loop (DCP-enabled), TPU-native.

Behavioral reference: `examples/training/open_sora/train.py:38-446`:
DeepSpeed ZeRO-1 -> AdamW with dp-sharded optimizer state; auto_recompute ->
remat'd scan; DCP profiler/dynamic-sp -> compiled-executable profiling +
MeshPool; EMA, checkpointing, epoch loop with per-bucket batches.

This is a library entry — `run_training(cfg)` — rather than a torchrun
script; one host process drives the mesh.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videosys_tpu.core import parallel as par
from videosys_tpu.core.dcp import Profiler
from videosys_tpu.models.transformers.stdit3 import STDiT3, STDiT3Config
from videosys_tpu.schedulers.rflow import RFlowConfig, RFlowScheduler
from videosys_tpu.training import ckpt as ckpt_io
from videosys_tpu.training.buckets import Bucket
from videosys_tpu.training.datasets import DummyVariableVideoTextDataset, MaskGenerator
from videosys_tpu.training.ema import init_ema, update_ema
from videosys_tpu.training.sampler import VariableVideoBatchSampler
from videosys_tpu.training.train_step import (
    create_train_state,
    make_optimizer,
    make_train_step,
    zero1_shardings,
    zero3_shardings,
)

logger = logging.getLogger(__name__)

DEFAULT_BUCKET_CONFIG = {
    # {resolution: {frames: (keep_prob, batch_size)}} — mirrors the shape of
    # examples/training/open_sora/configs/train.yaml bucket_config
    "144p": {1: (1.0, 32), 34: (1.0, 8), 51: (1.0, 4)},
    "240p": {1: (0.5, 16), 34: (0.5, 4), 51: (0.5, 2)},
}

DEFAULT_MASK_RATIOS = {
    "identity": 0.75, "quarter_head": 0.05, "quarter_tail": 0.05,
    "quarter_head_tail": 0.05, "interpolate": 0.05, "random": 0.05,
}


@dataclasses.dataclass
class TrainConfig:
    model: STDiT3Config = dataclasses.field(
        default_factory=lambda: STDiT3Config(dtype=jnp.bfloat16))
    bucket_config: dict = dataclasses.field(
        default_factory=lambda: dict(DEFAULT_BUCKET_CONFIG))
    mask_ratios: Optional[dict] = dataclasses.field(
        default_factory=lambda: dict(DEFAULT_MASK_RATIOS))
    lr: float = 1e-4
    weight_decay: float = 0.0
    warmup_steps: int = 1000
    grad_clip: Optional[float] = 1.0
    ema_decay: float = 0.99
    epochs: int = 1
    max_steps: Optional[int] = None
    seed: int = 42
    dataset_size: int = 64
    dynamic_sp: bool = False
    # sp-balance: pack plans of differing sp into GlobalSteps (sampler.py
    # :576-871); each packed step accumulates grads across its plans and the
    # optimizer updates ONCE — the same gradient as the reference's
    # concurrent rank groups + all-reduce (wall-clock concurrency is a
    # scheduling detail; the math is the packed-step gradient)
    sp_balance: bool = False
    dynamic_profile: bool = False
    # activation recompute policy for the scanned pairs: "full" | "dots" |
    # "none". With dynamic_recompute=True the DCP profile phase escalates
    # none -> dots -> full per bucket (the reference's dynamic_recompute
    # knapsack, core/dcp/profiler.py:584-622, re-landed as XLA remat
    # policies) and the loop builds each bucket's step with its policy.
    remat_policy: str = "full"
    dynamic_recompute: bool = False
    ckpt_every: Optional[int] = None
    ckpt_dir: str = "./checkpoints"
    log_every: int = 10
    dp_size: int = 1
    sp_size: int = 1
    # caption dropout: trains y_embedder.y_embedding (the CFG uncond branch)
    # — reference class_dropout_prob=0.1 (open_sora_transformer_3d.py:331)
    class_dropout_prob: float = 0.1
    # experiment tracker (reference wandb hook, train.py:390-401): set
    # wandb_project to log loss/avg_loss/lr per logged step via wandb (gated
    # on the package being installed), or pass any callable(dict) as
    # `tracker` for a dependency-free hook (tested with a list appender)
    wandb_project: Optional[str] = None
    tracker: Optional[Any] = None
    # ZeRO-3: shard params (not just moments) over all mesh devices — the
    # forward all-gathers each scan layer's weights and the backward
    # reduce-scatters dW (train_step.make_train_step(zero3=True)); frees
    # (1-1/N) of param HBM. Incompatible with sp_balance (its cross-mesh
    # grad accumulation relies on the replicated pin).
    zero3: bool = False
    # cosine LR decay to lr * lr_min_ratio over lr_decay_steps after warmup
    # (None = the reference's warmup-then-constant schedule)
    lr_decay_steps: Optional[int] = None
    lr_min_ratio: float = 0.1


def run_training(cfg: TrainConfig, dataset=None, text_embed_fn=None,
                 planner=None, vae=None, vae_params=None):
    """Train STDiT3 with rflow loss over bucketized variable-length batches.
    Returns (train_state, ema_params, metrics_history).

    Raw-video mode: pass ``vae`` (+ its params) and a dataset exposing
    `load_video(i, (T, H, W))` — each micro-batch is read from disk,
    resize-cropped to the bucket shape, and encoded to latents by a jitted
    per-bucket `vae.encode` before the train step (no grads through the VAE),
    matching the reference's non-preprocessed path (train.py:326-339).

    Dynamic sequence parallelism (cfg.dynamic_sp): per-batch the loop selects
    the mesh matching the DCP plan's sp_size from a `MeshPool` — the TPU
    equivalent of `DynamicParallelManager.set_sp_size` consumed at reference
    train.py:315-317. ZeRO-1 optimizer shards use the combined device axes
    (train_step.zero1_shardings), which are physically identical across pool
    meshes, so mesh switches move no optimizer bytes."""
    import jax.sharding as jsh

    mesh = None
    pool = None
    if cfg.dynamic_sp:
        n = cfg.dp_size * cfg.sp_size
        pool = par.MeshPool(jax.devices()[:n] if n > 1 else jax.devices())
    elif cfg.dp_size * cfg.sp_size > 1:
        mesh = par.build_mesh(par.ParallelConfig(cfg.dp_size, 1, cfg.sp_size))

    if cfg.zero3 and cfg.sp_balance:
        raise ValueError(
            "zero3 shards params per-mesh; sp_balance accumulates grads "
            "across pool meshes via the replicated pin — use one or the "
            "other")
    shardings_fn = zero3_shardings if cfg.zero3 else zero1_shardings

    if cfg.dynamic_recompute and not cfg.dynamic_profile:
        raise ValueError(
            "dynamic_recompute picks the remat policy during the DCP "
            "profile phase; set dynamic_profile=True as well (or set a "
            "fixed remat_policy instead)")
    models_by_policy = {
        p: STDiT3(cfg.model, remat=True, remat_policy=p)
        for p in ("full", "dots", "none")
    }
    model = models_by_policy[cfg.remat_policy]
    scheduler = RFlowScheduler(RFlowConfig(
        use_timestep_transform=True, sample_method="logit-normal"))
    tx = make_optimizer(cfg.lr, cfg.weight_decay, cfg.warmup_steps,
                        cfg.grad_clip, decay_steps=cfg.lr_decay_steps,
                        lr_min_ratio=cfg.lr_min_ratio)

    if dataset is None:
        dataset = DummyVariableVideoTextDataset(size=cfg.dataset_size,
                                                seed=cfg.seed)
    bucket = Bucket(cfg.bucket_config)
    mask_gen = MaskGenerator(cfg.mask_ratios) if cfg.mask_ratios else None

    # --- DCP profile phase (profiler.py two-phase flow) ----------------- #
    if cfg.dynamic_profile:
        def step_builder(thw, bs, sp, policy=cfg.remat_policy):
            T, H, W = thw
            t_lat, h_lat, w_lat = max(1, T // 17 * 5) if T > 1 else 1, H // 8, W // 8
            fn = make_train_step(models_by_policy[policy], scheduler, tx,
                                 float(H), float(W), num_frames=int(T),
                                 class_dropout_prob=cfg.class_dropout_prob,
                                 zero3=cfg.zero3)
            x = jnp.zeros((bs, cfg.model.in_channels, t_lat, h_lat, w_lat))
            y = jnp.zeros((bs, 8, cfg.model.caption_channels))
            batch = {"x": x, "y": y, "fps": jnp.full((bs,), 24.0)}
            params = jax.eval_shape(lambda: _init_params(model, cfg, batch))
            params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
            state = create_train_state(params, tx)
            # donate like the production step (:399-403): the profiler's
            # memory plan must see the same in/out train-state aliasing
            return jax.jit(fn, donate_argnums=(0,)), (state,
                                                      jax.random.key(0),
                                                      batch)

        profiler = Profiler(bucket, step_builder,
                            sp_candidates=(cfg.sp_size,) if not cfg.dynamic_sp
                            else (1, 2, 4, 8),
                            remat_candidates=("none", "dots", "full")
                            if cfg.dynamic_recompute
                            else (cfg.remat_policy,))
        profiler.profile_all()
        planner = profiler.make_planner()
        logger.info("DCP profile: %s", profiler.dump())

    sampler = VariableVideoBatchSampler(
        bucket, dataset.shapes(), batch_multiplier=cfg.dp_size,
        seed=cfg.seed, planner=planner)

    # --- init params against the first bucket shape --------------------- #
    rng = jax.random.key(cfg.seed)
    probe = {"x": jnp.zeros((1, cfg.model.in_channels, 2, 8, 8)),
             "y": jnp.zeros((1, 8, cfg.model.caption_channels)),
             "fps": jnp.full((1,), 24.0)}
    params = _init_params(model, cfg, probe)
    state = create_train_state(params, tx)
    ema_params = init_ema(params["params"]) if "params" in params else init_ema(params)

    step_fns: dict = {}
    metrics_history = []
    global_step = 0
    state_placed = False

    encode_fns: dict = {}
    raw_video = vae is not None and hasattr(dataset, "load_video")
    if vae is not None and vae_params is None:
        vae_params = vae.init(jax.random.key(cfg.seed + 7))

    def _load_micro_x(micro_idx, thw, lat_shape, rng_seed):
        """Latents for one micro-batch: pre-encoded (preprocess flow) or raw
        video through the jitted VAE encoder."""
        if not raw_video:
            return jnp.asarray(dataset.load_latents(
                micro_idx, lat_shape, rng_seed=rng_seed))
        T, H, W = thw
        vids = np.stack([dataset.load_video(i, (T, H, W), seed=rng_seed)
                         for i in micro_idx])
        key = ("enc", T, H, W, len(micro_idx))
        if key not in encode_fns:
            encode_fns[key] = jax.jit(
                lambda p, v, k: vae.encode(p, v, k))
        return encode_fns[key](vae_params, jnp.asarray(vids),
                               jax.random.fold_in(rng, rng_seed))

    def _plan_mesh(plan):
        if pool is not None:
            # largest pool sp <= the planned sp (pool is powers of two)
            sp = max((s for s in pool.sp_sizes if s <= max(1, plan.sp_size)),
                     default=1)
            return pool.mesh_for_sp(sp)
        return mesh

    def _lat_shape(plan):
        T, H, W = plan.thw
        if vae is not None:
            return tuple(vae.get_latent_size((T, H, W)))
        # real Open-Sora VAE factors (17->5 temporal, 8x spatial)
        t_lat = max(1, T // 17 * 5) if T > 1 else 1
        return (t_lat, H // 8, W // 8)

    def _place_state():
        nonlocal state, state_placed
        if not state_placed:
            # ZeRO-1 placement: replicated params, all-device-sharded
            # moments; identical physical layout for every pool mesh
            anchor = pool.mesh_for_sp(1) if pool is not None else mesh
            if anchor is not None:
                state = jax.device_put(state, shardings_fn(anchor, state))
            state_placed = True

    def _build_batch(plan, plan_mesh, lat_shape, step_seed):
        """gas micro-batches of DISTINCT samples (reference train.py:321-364
        gas loop), stacked on a leading gas axis and placed on the plan's
        mesh (batch over dp/cp; the model's constraints shard sp)."""
        micro_batches = plan.micro_batches()
        if hasattr(dataset, "prefetch"):
            # queue the whole plan's reads on the native IO pool so later
            # micro-batches stream while earlier ones are encoded/stepped
            dataset.prefetch([int(i) for mb in micro_batches for i in mb])
        gas = len(micro_batches)
        t_lat = lat_shape[0]
        micros = []
        for k, micro_idx in enumerate(micro_batches):
            # pre-encoded latents (preprocess.py flow), synthetic latents
            # (dummy dataset), or raw video via the jitted VAE encoder
            x = _load_micro_x(micro_idx, plan.thw, lat_shape,
                              rng_seed=step_seed * gas + k)
            if text_embed_fn is not None:
                y, kv_mask = text_embed_fn(micro_idx)
            else:
                y = jax.random.normal(
                    jax.random.fold_in(rng, step_seed * gas + k),
                    (len(micro_idx), 8, cfg.model.caption_channels))
                kv_mask = jnp.ones((len(micro_idx), 8), bool)
            mb = {"x": x, "y": y, "kv_mask": kv_mask,
                  "fps": jnp.full((x.shape[0],), 24.0)}
            if mask_gen is not None and t_lat > 1:
                mb["mask"] = jnp.asarray(mask_gen(
                    x.shape[0], t_lat, seed=cfg.seed + step_seed * gas + k))
            micros.append(mb)
        batch = (micros[0] if gas == 1
                 else jax.tree.map(lambda *xs: jnp.stack(xs), *micros))
        if plan_mesh is not None:
            def _bsh(a):
                spec = [None] * a.ndim
                spec[1 if gas > 1 else 0] = par.BATCH_AXES
                return jsh.NamedSharding(plan_mesh, jsh.PartitionSpec(*spec))

            batch = {k: jax.device_put(v, _bsh(v)) for k, v in batch.items()}
        return batch, gas

    # experiment tracker (reference wandb per-step loss/avg_loss/lr,
    # train.py:390-401); avg_loss is the running mean since start
    tracker = cfg.tracker
    if tracker is None and cfg.wandb_project:
        try:
            import wandb

            wandb.init(project=cfg.wandb_project)
            tracker = lambda rec: wandb.log(rec, step=rec["step"])  # noqa: E731
        except Exception as e:  # wandb not installed / offline
            logger.warning("wandb tracker disabled: %s", e)
    loss_sum = 0.0
    loss_n = 0

    def _log_and_ckpt(epoch, plan, metrics, mesh_key, extra=None):
        nonlocal global_step, loss_sum, loss_n
        global_step += 1
        if global_step % cfg.log_every == 0 or tracker is not None:
            loss = float(metrics["loss"])
            loss_sum += loss
            loss_n += 1
            lr = cfg.lr * min(1.0, global_step / max(1, cfg.warmup_steps))
            if cfg.lr_decay_steps and global_step > cfg.warmup_steps:
                import math
                frac = min(1.0, (global_step - cfg.warmup_steps)
                           / max(1, cfg.lr_decay_steps - cfg.warmup_steps))
                lo = cfg.lr * cfg.lr_min_ratio
                lr = lo + (cfg.lr - lo) * 0.5 * (1 + math.cos(math.pi * frac))
            if tracker is not None:
                tracker({"step": global_step, "loss": loss,
                         "avg_loss": loss_sum / loss_n, "lr": lr})
        if global_step % cfg.log_every == 0:
            loss = float(metrics["loss"])
            entry = {"step": global_step, "loss": loss,
                     "bucket": str(plan.bucket_id), "sp": plan.sp_size,
                     "mesh": mesh_key}
            entry.update(extra or {})
            metrics_history.append(entry)
            logger.info("step %d bucket=%s loss=%.4f sp=%s mesh=%s",
                        global_step, plan.bucket_id, loss, plan.sp_size,
                        mesh_key)
        if cfg.ckpt_every and global_step % cfg.ckpt_every == 0:
            ckpt_io.save(cfg.ckpt_dir, state, ema_params, epoch, global_step,
                         sampler_state=sampler.state_dict(global_step))
        return bool(cfg.max_steps and global_step >= cfg.max_steps)

    if cfg.sp_balance:
        from videosys_tpu.training.sampler import pack_global_steps
        from videosys_tpu.training.train_step import (
            make_apply_step,
            make_grad_step,
        )

        n_dev = (len(pool._devices) if pool is not None
                 else (int(np.prod(mesh.devices.shape)) if mesh is not None
                       else 1))
        grad_fns: dict = {}
        apply_fn = None
        profile = planner.profile if planner is not None else None
        for epoch in range(cfg.epochs):
            sampler.set_epoch(epoch)
            gsteps = pack_global_steps(list(sampler), n_dev, profile)
            for gstep in gsteps:
                grads_acc = None
                n_evals = 0
                losses = []
                for plan in gstep.plans:
                    plan_mesh = _plan_mesh(plan)
                    if plan_mesh is not None:
                        _place_state()
                    T, H, W = plan.thw
                    lat_shape = _lat_shape(plan)
                    mesh_key = (None if plan_mesh is None
                                else tuple(plan_mesh.devices.shape))
                    gkey = (plan.bucket_id, mesh_key)
                    if gkey not in grad_fns:
                        pol = (planner.remat_policy(plan.bucket_id,
                                                    cfg.remat_policy)
                               if planner is not None else cfg.remat_policy)
                        grad_fns[gkey] = jax.jit(make_grad_step(
                            models_by_policy[pol], scheduler, float(H),
                            float(W), num_frames=int(T),
                            class_dropout_prob=cfg.class_dropout_prob))
                    gfn = grad_fns[gkey]
                    batch, gas = _build_batch(plan, plan_mesh, lat_shape,
                                              global_step + n_evals)
                    micros = ([batch] if gas == 1 else [
                        jax.tree.map(lambda a, i=i: a[i], batch)
                        for i in range(gas)])
                    for mb in micros:
                        rng, skey = jax.random.split(rng)
                        with par.use_mesh(plan_mesh) if plan_mesh is not None \
                                else _null():
                            loss, grads = gfn(state.params, skey, mb)
                        # keep losses on device: float() here would force a
                        # host sync per micro-batch and serialize dispatch
                        losses.append(loss)
                        grads_acc = grads if grads_acc is None else \
                            jax.tree.map(jnp.add, grads_acc, grads)
                        n_evals += 1
                if grads_acc is None:
                    continue
                if apply_fn is None:
                    anchor = pool.mesh_for_sp(1) if pool is not None else mesh
                    if anchor is not None:
                        rep = jsh.NamedSharding(anchor, jsh.PartitionSpec())
                        apply_fn = jax.jit(
                            make_apply_step(tx), donate_argnums=(0, 1),
                            out_shardings=(zero1_shardings(anchor, state),
                                           {"grad_norm": rep}))
                    else:
                        apply_fn = jax.jit(make_apply_step(tx),
                                           donate_argnums=(0, 1))
                state, metrics = apply_fn(state, grads_acc,
                                          jnp.float32(n_evals))
                # one host sync per GlobalStep, after the apply step
                metrics = dict(
                    metrics, loss=float(np.mean([np.asarray(l) for l in losses])))
                ema_params = update_ema(
                    ema_params, _model_params(state.params), cfg.ema_decay)
                if _log_and_ckpt(epoch, gstep.plans[0], metrics,
                                 "sp_balance",
                                 extra={"packed_plans": len(gstep.plans),
                                        "imbalance": gstep.imbalance}):
                    return state, ema_params, metrics_history
        return state, ema_params, metrics_history

    for epoch in range(cfg.epochs):
        sampler.set_epoch(epoch)
        for plan in sampler:
            plan_mesh = _plan_mesh(plan)
            T, H, W = plan.thw
            lat_shape = _lat_shape(plan)
            gas = len(plan.micro_batches())
            mesh_key = (None if plan_mesh is None
                        else tuple(plan_mesh.devices.shape))
            key = (plan.bucket_id, len(plan.indices) // gas, gas, mesh_key)
            if key not in step_fns:
                pol = (planner.remat_policy(plan.bucket_id, cfg.remat_policy)
                       if planner is not None else cfg.remat_policy)
                fn = make_train_step(
                    models_by_policy[pol], scheduler, tx, float(H), float(W),
                    num_frames=int(T), gas=gas,
                    class_dropout_prob=cfg.class_dropout_prob,
                    zero3=cfg.zero3)
                if plan_mesh is not None:
                    # pin the output layout to the canonical ZeRO placement
                    # (params replicated under ZeRO-1, device-sharded under
                    # ZeRO-3; moments all-device-sharded either way) so every
                    # step ends in the SAME physical layout and mesh switches
                    # stay zero-copy
                    state_sh = shardings_fn(plan_mesh, state)
                    rep = jsh.NamedSharding(plan_mesh, jsh.PartitionSpec())
                    step_fns[key] = jax.jit(
                        fn, donate_argnums=(0,),
                        out_shardings=(state_sh,
                                       {"loss": rep, "grad_norm": rep}))
                else:
                    step_fns[key] = jax.jit(fn, donate_argnums=(0,))
            fn = step_fns[key]
            if plan_mesh is not None:
                _place_state()
            batch, gas = _build_batch(plan, plan_mesh, lat_shape, global_step)
            rng, skey = jax.random.split(rng)
            with par.use_mesh(plan_mesh) if plan_mesh is not None else _null():
                state, metrics = fn(state, skey, batch)
            ema_params = update_ema(ema_params, _model_params(state.params),
                                    cfg.ema_decay)
            if _log_and_ckpt(epoch, plan, metrics, mesh_key):
                return state, ema_params, metrics_history
    return state, ema_params, metrics_history


def _init_params(model, cfg, batch):
    from videosys_tpu.utils.jit import jit_init

    return jit_init(model.init, jax.random.key(cfg.seed), batch["x"],
                    jnp.zeros((batch["x"].shape[0],)), batch["y"],
                    fps=batch["fps"], height=64.0, width=64.0)


def _model_params(params):
    return params["params"] if isinstance(params, dict) and "params" in params else params


class _null:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
