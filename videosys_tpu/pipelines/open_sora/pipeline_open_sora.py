"""Open-Sora v1.2 text-to-video pipeline — TPU-native.

Behavioral reference: `videosys/pipelines/open_sora/pipeline_open_sora.py`
(OpenSoraPABConfig :32-69, OpenSoraConfig :72-163, OpenSoraPipeline :166-656).
Same public surface — `OpenSoraConfig` -> `VideoSysEngine` -> `generate(prompt,
resolution, aspect_ratio, num_frames, seed, ...)` -> uint8 video — but the
execution model is jit-first:

* the denoise loop is a host loop over per-step jitted functions; PAB gives a
  bounded set of step-plan specializations (see core/pab.py), the PAB cache is
  an explicit donated pytree;
* CFG doubling, the model forward, guidance combine, and the Euler update all
  live inside one jitted step (one compiled program per plan);
* DSP/CP parallelism comes from the active mesh (core/parallel.py) — no
  process spawning.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videosys_tpu.core import parallel as par
from videosys_tpu.core.pab import PABConfig, build_plans
from videosys_tpu.core.pipeline import VideoSysPipeline, VideoSysPipelineOutput
from videosys_tpu.models.autoencoders.autoencoder_open_sora import (
    OpenSoraVAE,
    OpenSoraVAEConfig,
)
from videosys_tpu.models.text_encoders.t5 import StubTextEncoder, T5TextEncoder
from videosys_tpu.models.transformers.stdit3 import STDiT3, STDiT3Config
from videosys_tpu.pipelines.open_sora.data_process import (
    append_score_to_prompts,
    extract_prompts_loop,
    get_image_size,
    get_num_frames,
    merge_prompt,
    split_prompt,
    text_preprocessing,
)
from videosys_tpu.schedulers.rflow import RFlowConfig, RFlowScheduler


def OpenSoraPABConfig(**overrides) -> PABConfig:
    """Default PAB thresholds for Open-Sora (pipeline_open_sora.py:32-69)."""
    mlp_cfg = {
        676: {"block": [0, 1, 2, 3, 4], "skip_count": 2},
        788: {"block": [0, 1, 2, 3, 4], "skip_count": 2},
        864: {"block": [0, 1, 2, 3, 4], "skip_count": 2},
    }
    defaults = dict(
        spatial_broadcast=True, spatial_threshold=(450, 930), spatial_range=2,
        temporal_broadcast=True, temporal_threshold=(450, 930), temporal_range=4,
        cross_broadcast=True, cross_threshold=(450, 930), cross_range=6,
        mlp_broadcast=True,
        mlp_spatial_broadcast_config=mlp_cfg,
        mlp_temporal_broadcast_config=dict(mlp_cfg),
    )
    defaults.update(overrides)
    return PABConfig(**defaults)


@dataclasses.dataclass
class OpenSoraConfig:
    """Mirror of OpenSoraConfig (pipeline_open_sora.py:72-163).
    `num_gpus` is kept for API compatibility and means number of devices."""

    transformer: Optional[str] = "hpcai-tech/OpenSora-STDiT-v3"
    vae: Optional[str] = "hpcai-tech/OpenSora-VAE-v1.2"
    text_encoder: Optional[str] = "DeepFloyd/t5-v1_1-xxl"
    # ======== distributed ========
    num_gpus: int = 1
    # Low-memory mode (reference pipeline_open_sora.py:239-242 +
    # tests/pipelines/open_sora/test_open_sora.py:30-37 test_low_mem):
    # params stay committed to HOST memory; each phase device_puts only the
    # module it runs (text encoder -> free -> transformer -> free -> VAE), so
    # peak HBM is one module + activations instead of all three. Costs one
    # H2D transfer of each module's params per generate. Compose with
    # tiling_size=1 for minimal VAE memory.
    cpu_offload: bool = False
    enable_cp: bool = False
    # ======== scheduler ========
    num_sampling_steps: int = 30
    cfg_scale: float = 7.0
    # ======== vae ========
    # spatial-VAE frame micro-batch. The reference defaults to 4 (GPU memory
    # headroom); on v5e 8 measured 2.2x faster decode (4.77 -> 2.13 s at
    # 2s/480p, lax.map utilization) and fits comfortably
    tiling_size: int = 8
    # ======== speedup ========
    enable_flash_attn: bool = True  # pallas kernel dispatch (auto on TPU)
    # static text-KV bucketing (exact; the reference's y_lens compression,
    # open_sora_transformer_3d.py:622-633 — see pipelines/common.py)
    text_kv_bucket: bool = True
    # ======== pab ========
    enable_pab: bool = False
    pab_config: Optional[PABConfig] = None
    # ======== tpu ========
    dtype: str = "bf16"
    # test/offline hooks: override model sizes, skip weight loading
    transformer_config: Optional[STDiT3Config] = None
    vae_config: Optional[OpenSoraVAEConfig] = None

    def __post_init__(self):
        if self.pab_config is None:
            self.pab_config = OpenSoraPABConfig()
        self.pipeline_cls = OpenSoraPipeline


_DTYPES = {"fp32": jnp.float32, "bf16": jnp.bfloat16, "fp16": jnp.float16}


class OpenSoraPipeline(VideoSysPipeline):
    def __init__(
        self,
        config: OpenSoraConfig,
        text_encoder: Any = None,
        vae: Optional[OpenSoraVAE] = None,
        params: Optional[dict] = None,
        mesh=None,
        seed: int = 42,
    ):
        self._config = config
        dtype = _DTYPES[config.dtype]
        self.dtype = dtype

        # --- mesh (replaces engine process spawning + ParallelManager) ---- #
        if mesh is None and config.num_gpus > 1:
            pcfg = par.ParallelConfig.from_world_size(config.num_gpus,
                                                      enable_cp=config.enable_cp)
            mesh = par.build_mesh(pcfg)
        self.mesh = mesh

        # --- modules ------------------------------------------------------ #
        self.model_config = config.transformer_config or STDiT3Config(dtype=dtype)
        self.vae = vae or OpenSoraVAE(
            config.vae_config
            or OpenSoraVAEConfig(micro_batch_size=config.tiling_size, dtype=dtype)
        )
        if text_encoder is not None:
            self.text_encoder = text_encoder
        else:
            self.text_encoder = self._load_text_encoder(config)

        self.scheduler = RFlowScheduler(RFlowConfig(
            num_sampling_steps=config.num_sampling_steps,
            cfg_scale=config.cfg_scale,
            use_timestep_transform=True,
        ))

        if params is not None:
            self.params = params
        elif config.cpu_offload:
            # build params under a host default device so init never peaks
            # device HBM with modules the phases will stream in one by one
            with jax.default_device(jax.devices("cpu")[0]):
                self.params = self._init_params(seed)
        else:
            self.params = self._init_params(seed)
        if config.cpu_offload:
            self._offload_params_to_host()
        self._step_fns: dict = {}

    # ------------------------------------------------------------------ #
    def _load_text_encoder(self, config):
        if config.text_encoder:
            try:
                return T5TextEncoder(config.text_encoder, dtype=self.dtype,
                                     offload=config.cpu_offload)
            except Exception as e:
                # the reference fails in from_pretrained; don't silently
                # substitute a stub for a configured encoder
                raise RuntimeError(
                    f"text encoder {config.text_encoder!r} could not be "
                    f"loaded ({e}); pass text_encoder=None for the offline "
                    f"stub, or a local HF snapshot path") from e
        return StubTextEncoder(output_dim=self.model_config.caption_channels,
                               max_length=self.model_config.model_max_length)

    def _init_params(self, seed: int) -> dict:
        """Load checkpoints via utils/checkpoint.py when model paths resolve
        to local orbax/safetensors dirs; random init is reserved for the
        explicit test hooks (transformer_config/vae_config) — a configured
        path that doesn't resolve raises, like the reference's
        from_pretrained (pipeline_open_sora.py:211-229)."""
        from videosys_tpu.utils.checkpoint import try_load_params
        from videosys_tpu.utils.jit import jit_init

        loaded = try_load_params(self._config) or {}
        mc = self.model_config
        params = dict(loaded)
        cfg = self._config
        if "transformer" not in params and cfg.transformer and \
                cfg.transformer_config is None:
            raise FileNotFoundError(
                f"transformer weights not found at {cfg.transformer!r} "
                f"(need a local orbax dir or HF safetensors snapshot); set "
                f"transformer=None with transformer_config=... for "
                f"random-init testing")
        if "vae" not in params and cfg.vae and cfg.vae_config is None:
            raise FileNotFoundError(
                f"VAE weights not found at {cfg.vae!r}; set vae=None with "
                f"vae_config=... for random-init testing")
        if "transformer" not in params:
            model = STDiT3(mc)
            dummy_x = jnp.zeros((1, mc.in_channels, 2, 8, 8), jnp.float32)
            dummy_t = jnp.zeros((1,), jnp.float32)
            dummy_y = jnp.zeros((1, 4, mc.caption_channels), jnp.float32)
            params["transformer"] = jit_init(
                model.init, jax.random.key(seed), dummy_x, dummy_t, dummy_y,
                height=64.0, width=64.0)
        if "vae" not in params:
            params["vae"] = self.vae.init(jax.random.key(seed + 1))
        if self.dtype != jnp.float32:
            # the reference holds inference weights in half precision
            # (pipeline_open_sora.py:213-229 torch_dtype=fp16); on TPU this
            # halves HBM for params and leaves fp32 accumulation to the MXU
            params = jax.tree.map(
                lambda x: x.astype(self.dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params)
        return params

    # ------------------------------------------------------------------ #
    def null_embed(self, n: int) -> jax.Array:
        """Uncond caption features for CFG (pipeline_open_sora.py:294-296)."""
        y_emb = self.params["transformer"]["params"]["y_embedder"]["y_embedding"]
        # under cpu_offload the stored param is committed to host; fetch the
        # (small) null embedding so it can concatenate with device tensors
        y_emb = self._exec_put(y_emb)
        return jnp.broadcast_to(y_emb[None], (n,) + y_emb.shape)

    def _step_core(self, plan, height: float, width: float,
                   guidance_scale: float):
        """One CFG-doubled model eval + guidance + Euler update (the shared
        body of the per-step and scanned samplers)."""
        pab = self._config.pab_config if self._config.enable_pab else None
        model = STDiT3(self.model_config, plan=plan, pab_config=pab)
        sched = self.scheduler

        def step(params, z, t_scalar, dt, y_all, kv_mask_all, fps, cache):
            B = z.shape[0]
            z_in = jnp.concatenate([z, z], axis=0).astype(self.dtype)
            t_in = jnp.full((2 * B,), t_scalar, jnp.float32)
            fps_in = jnp.concatenate([fps, fps], axis=0)
            kwargs = dict(kv_mask=kv_mask_all, fps=fps_in,
                          height=height, width=width)
            if cache is not None:
                out, cache = model.apply(params, z_in, t_in, y_all,
                                         pab_cache=cache, **kwargs)
            else:
                out = model.apply(params, z_in, t_in, y_all, **kwargs)
            pred = out[:, : self.model_config.in_channels]
            v_cond, v_uncond = pred[:B], pred[B:]
            v = sched.apply_cfg(v_cond, v_uncond, guidance_scale)
            z = sched.step(z, v, dt)
            return z, cache

        return step

    def _get_step_fn(self, plan, height: float, width: float, guidance_scale: float):
        key = (plan, height, width, guidance_scale)
        if key in self._step_fns:
            return self._step_fns[key]
        fn = jax.jit(self._step_core(plan, height, width, guidance_scale),
                     donate_argnums=(1, 7))
        self._step_fns[key] = fn
        return fn

    def _get_scan_fn(self, plan, height: float, width: float,
                     guidance_scale: float, length: int):
        """Whole same-plan run of the ladder in ONE compiled program
        (lax.scan over (t, dt)): removes per-step host dispatch and lets XLA
        schedule across steps. Compiles once per (plan, run length)."""
        key = ("scan", plan, height, width, guidance_scale, length)
        if key in self._step_fns:
            return self._step_fns[key]
        step = self._step_core(plan, height, width, guidance_scale)

        def multi(params, z, ts, dts, y_all, kv_mask_all, fps, cache):
            has_cache = cache is not None

            def body(carry, tdt):
                z, c = carry
                t, dt = tdt
                z, c = step(params, z, t, dt, y_all, kv_mask_all, fps,
                            c if has_cache else None)
                return (z, c), None

            (z, cache), _ = jax.lax.scan(body, (z, cache), (ts, dts))
            return z, cache

        fn = jax.jit(multi, donate_argnums=(1, 7))
        self._step_fns[key] = fn
        return fn

    def _get_masked_step_fn(self, plan, height: float, width: float,
                            guidance_scale: float):
        """Step with condition-frame masking (scheduling_rflow_open_sora.py
        :226-257): frames whose edit threshold has passed stay clamped to
        their reference content; frames crossing it are noised once."""
        key = ("masked", plan, height, width, guidance_scale)
        if key in self._step_fns:
            return self._step_fns[key]

        pab = self._config.pab_config if self._config.enable_pab else None
        model = STDiT3(self.model_config, plan=plan, pab_config=pab)
        sched = self.scheduler

        def step(params, z, t_scalar, dt, y_all, kv_mask_all, fps, cache,
                 mask, noise_added, nkey):
            B = z.shape[0]
            t_b = jnp.full((B,), t_scalar, jnp.float32)
            x0 = z
            x_noise = sched.add_noise(x0, jax.random.normal(nkey, x0.shape,
                                                            x0.dtype), t_b)
            mask_t = mask * float(sched.config.num_timesteps)
            mask_t_upper = mask_t >= t_b[:, None]          # [B, T] bool
            x_mask = jnp.concatenate([mask_t_upper, mask_t_upper], axis=0)
            mask_add_noise = mask_t_upper & ~noise_added
            z = jnp.where(mask_add_noise[:, None, :, None, None], x_noise, x0)

            z_in = jnp.concatenate([z, z], axis=0).astype(self.dtype)
            t_in = jnp.full((2 * B,), t_scalar, jnp.float32)
            fps_in = jnp.concatenate([fps, fps], axis=0)
            kwargs = dict(kv_mask=kv_mask_all, x_mask=x_mask, fps=fps_in,
                          height=height, width=width)
            if cache is not None:
                out, cache = model.apply(params, z_in, t_in, y_all,
                                         pab_cache=cache, **kwargs)
            else:
                out = model.apply(params, z_in, t_in, y_all, **kwargs)
            pred = out[:, : self.model_config.in_channels]
            v_cond, v_uncond = pred[:B], pred[B:]
            v = sched.apply_cfg(v_cond, v_uncond, guidance_scale)
            z = sched.step(z, v, dt)
            z = jnp.where(mask_t_upper[:, None, :, None, None], z, x0)
            return z, cache, mask_t_upper

        fn = jax.jit(step, donate_argnums=(1, 7))
        self._step_fns[key] = fn
        return fn

    # ------------------------------------------------------------------ #
    def generate(
        self,
        prompt,
        resolution: str = "480p",
        aspect_ratio: str = "9:16",
        num_frames="2s",
        seed=-1,
        guidance_scale: Optional[float] = None,
        aes: float = 6.5,
        flow: Optional[float] = None,
        camera_motion: Optional[float] = None,
        fps: int = 24,
        # condition-frame generation (:607-643): reference is an image/video
        # path or pixel array [C, T, H, W]; mask_strategy strings per
        # pipelines/open_sora/mask_strategy.py
        reference=None,
        mask_strategy: Optional[str] = None,
        loop: int = 1,
        condition_frame_length: int = 5,
        condition_frame_edit: float = 0.0,
        align: Optional[int] = 5,
        verbose: bool = True,
        return_dict: bool = True,
    ):
        import time as _time

        cfg = self._config
        height, width = get_image_size(resolution, aspect_ratio)
        num_frames = get_num_frames(num_frames)
        if guidance_scale is None:
            guidance_scale = cfg.cfg_scale

        # --- batched prompts & per-sample seeds (TPU-first extension of the
        # reference's single-prompt surface: the whole denoise below is
        # batch-general, and batching prompts is the cheapest MFU lever on a
        # chip; batched([p_i], seed=s) row i == generate(p_i, seed=s+i)) --- #
        prompt_list = (list(prompt) if isinstance(prompt, (list, tuple))
                       else [prompt])
        B = len(prompt_list)
        if isinstance(seed, (list, tuple)):
            if len(seed) != B:
                raise ValueError(
                    f"seed list length {len(seed)} != {B} prompts")
            seeds = [int(s) for s in seed]
        else:
            base = int(seed) if seed >= 0 else np.random.randint(0, 2**31 - 1)
            seeds = [base + i for i in range(B)]
        # per-sample RNG streams; stream 0 doubles as the batch-level stream
        # (mask noise, condition-frame keys) so B=1 is bit-identical to the
        # single-prompt code path
        rngs = [jax.random.key(s) for s in seeds]

        # --- prompt processing (:530-607); the reference's order: split
        # loop segments (:753-786), append scores (:588-595), THEN clean
        # (:598-601) ------------------------------------------------------ #
        _t0 = _time.perf_counter()
        merged_prompts = []
        for p in prompt_list:
            segs, loop_idx = split_prompt(p)
            segs = append_score_to_prompts(segs, aes=aes, flow=flow,
                                           camera_motion=camera_motion)
            segs = [text_preprocessing(s) for s in segs]
            merged_prompts.append(merge_prompt(segs, loop_idx))

        def _encode_prompts(texts):
            y, kv_mask = self.text_encoder.encode(texts)
            np.asarray(y[..., :1])  # sync for the phase timer (tiny transfer)
            y_null = self.null_embed(len(texts))
            y_all = jnp.concatenate([y, y_null], axis=0).astype(self.dtype)
            kv_mask_all = jnp.concatenate([kv_mask, kv_mask], axis=0)
            self.last_text_kv_len = y_all.shape[1]
            if getattr(cfg, "text_kv_bucket", False):
                from videosys_tpu.pipelines.common import bucket_text_kv

                y_all, kv_mask_all, self.last_text_kv_len = bucket_text_kv(
                    y_all, kv_mask_all, self.model_config.model_max_length)
            return y_all, kv_mask_all

        cur_texts = extract_prompts_loop(merged_prompts, 0)
        y_all, kv_mask_all = _encode_prompts(cur_texts)
        _t_text = _time.perf_counter() - _t0

        # --- latents + denoise, once per loop (:607-643) ------------------- #
        from videosys_tpu.pipelines.open_sora import mask_strategy as ms_mod

        t_lat, h_lat, w_lat = self.vae.get_latent_size((num_frames, height, width))
        timesteps = self.scheduler.prepare_timesteps(height, width, num_frames)
        dts = self.scheduler.prepare_dts(timesteps)
        pab = cfg.pab_config if cfg.enable_pab else None
        plans = build_plans(pab, timesteps, self.model_config.depth, self.dtype)
        mc = self.model_config
        fps_arr = jnp.full((B,), float(fps), jnp.float32)

        # low-mem phase streaming: the transformer params ride the device for
        # the denoise loops and are freed before the VAE phase (no-ops when
        # cpu_offload is off — _exec_put returns the resident tree)
        tparams = self._exec_put(self.params["transformer"])

        refs = [None] * B
        strategies = [mask_strategy] * B
        if reference is not None:
            rngs[0], rkey = jax.random.split(rngs[0])
            ref_lat = ms_mod.load_reference(reference, self.vae,
                                            self._exec_put(self.params["vae"]),
                                            (height, width), rkey)
            refs = [[ref_lat]] * B
            if mask_strategy is None:
                strategies = ["0"] * B  # condition on ref frame 0

        mesh_ctx = par.use_mesh(self.mesh) if self.mesh is not None else _nullcontext()
        clips = []
        _t_denoise = _t_vae = 0.0
        with mesh_ctx:
            for loop_i in range(loop):
                if loop_i > 0:
                    rngs[0], akey = jax.random.split(rngs[0])
                    refs, strategies = ms_mod.append_generated(
                        self.vae, self._exec_put(self.params["vae"]),
                        clips[-1], refs,
                        strategies, loop_i, condition_frame_length,
                        condition_frame_edit, akey)
                    # per-loop prompt segments (|0|-syntax): re-encode when
                    # any prompt changes for this loop (reference :611-626)
                    texts_i = extract_prompts_loop(merged_prompts, loop_i)
                    if texts_i != cur_texts:
                        _te = _time.perf_counter()
                        y_all, kv_mask_all = _encode_prompts(texts_i)
                        cur_texts = texts_i
                        _t_text += _time.perf_counter() - _te
                # per-sample z streams: sample i depends only on seeds[i], so
                # a batched generate row-matches the per-prompt single runs
                zkeys = []
                for i in range(B):
                    rngs[i], zk = jax.random.split(rngs[i])
                    zkeys.append(zk)
                shape1 = (1, self.vae.out_channels, t_lat, h_lat, w_lat)
                z = (jax.random.normal(zkeys[0], shape1, jnp.float32)
                     if B == 1 else
                     jnp.concatenate([jax.random.normal(zk, shape1,
                                                        jnp.float32)
                                      for zk in zkeys], axis=0))
                if any(s for s in strategies) or any(r for r in refs):
                    # condition-frame path: host-side latent edit
                    z_np, mask = ms_mod.apply_mask_strategy(
                        np.asarray(z), refs, strategies, loop_i, align=align)
                    z = jnp.asarray(z_np)
                else:
                    mask = None  # plain T2V: no device->host roundtrip

                _t0 = _time.perf_counter()
                cache = None
                if cfg.enable_pab:
                    T_tok = -(-t_lat // mc.patch_size[0])
                    S_tok = (-(-h_lat // mc.patch_size[1])) * (
                        -(-w_lat // mc.patch_size[2]))
                    cache = STDiT3(mc, pab_config=pab).init_cache(
                        2 * B, T_tok, S_tok)

                def _touched_bytes(plan):
                    """HBM the plan's WRITTEN slots would double-buffer as a
                    scan carry (untouched / read-only slots are loop-invariant
                    or aliased; slot modes are static, core/pab.py)."""
                    if cache is None:
                        return 0
                    total = 0
                    for branch, slots in cache.items():
                        for sl, a in slots.items():
                            mode = plan.slot_mode(branch, sl)
                            if mode in ("write", "readwrite"):
                                total += int(np.prod(a.shape)) * a.dtype.itemsize
                    return total

                if mask is None:
                    # group consecutive same-plan steps into scanned runs;
                    # fall back to per-step dispatch when the run would
                    # double-buffer a large written cache slot, or above the
                    # runtime-fault token scale: the fused scan program
                    # reproducibly kills the TPU runtime at scan L>=8 when
                    # the CFG-doubled batch carries ~>=95k total DiT tokens
                    # (first isolated at B=2/480p = 4x23.9k; B=1 720p (108k)
                    # and 4s/480p (95k) hit the same fault — single steps
                    # and the attention kernels at the same shapes are
                    # fine). 64k is the conservative cut between the largest
                    # known-good fused scan (48k) and the smallest fault
                    # (95k); at multi-second step times per-step dispatch
                    # overhead is <1% anyway. Repro:
                    # experiments/scan_fault_repro.py; canary:
                    # test_batched_prompts_use_per_step_dispatch.
                    T_tok_s = -(-t_lat // mc.patch_size[0])
                    S_tok_s = (-(-h_lat // mc.patch_size[1])) * (
                        -(-w_lat // mc.patch_size[2]))
                    total_tokens = 2 * B * T_tok_s * S_tok_s
                    i = 0
                    while i < len(timesteps):
                        j = i
                        while j < len(plans) and plans[j] == plans[i]:
                            j += 1
                        if (j - i > 1 and B == 1 and total_tokens < 64_000
                                and _touched_bytes(plans[i]) < (3 << 30)):
                            run_ts = jnp.asarray(timesteps[i:j], jnp.float32)
                            run_dts = jnp.asarray(dts[i:j], jnp.float32)
                            fn = self._get_scan_fn(
                                plans[i], float(height), float(width),
                                float(guidance_scale), j - i)
                            z, cache = fn(tparams, z,
                                          run_ts, run_dts, y_all, kv_mask_all,
                                          fps_arr, cache)
                        else:
                            step_fn = self._get_step_fn(
                                plans[i], float(height), float(width),
                                float(guidance_scale))
                            for k in range(i, j):
                                z, cache = step_fn(
                                    tparams, z,
                                    timesteps[k], dts[k], y_all, kv_mask_all,
                                    fps_arr, cache)
                        i = j
                else:
                    mask_arr = jnp.asarray(mask, jnp.float32)
                    noise_added = jnp.asarray(mask, jnp.float32) >= 1.0
                    for i, (t_i, dt_i) in enumerate(zip(timesteps, dts)):
                        step_fn = self._get_masked_step_fn(
                            plans[i], float(height), float(width),
                            float(guidance_scale))
                        rngs[0], nkey = jax.random.split(rngs[0])
                        z, cache, noise_added = step_fn(
                            tparams, z, t_i, dt_i, y_all,
                            kv_mask_all, fps_arr, cache, mask_arr,
                            noise_added, nkey)
                float(jnp.sum(z[..., :1]))  # force z; denoise phase boundary
                _t_denoise += _time.perf_counter() - _t0
                if getattr(self, "keep_latents", False):
                    # PAB quality protocol compares LATENTS (BASELINE gate:
                    # latent PSNR >= 35 dB PAB-on vs PAB-off); opt-in so the
                    # hot path never pays the device->host transfer
                    self.last_latents = np.asarray(z)
                cache = None  # free PAB cache HBM before the VAE runs
                if loop_i == loop - 1:
                    tparams = None  # cpu_offload: free transformer HBM
                vparams = self._exec_put(self.params["vae"])
                _t0 = _time.perf_counter()
                if loop == 1:
                    # streaming decode: per-chunk programs emit uint8 in the
                    # final layout; the D2H copy of chunk i overlaps the
                    # decode of chunk i+1 (slow-link postprocess killer)
                    u8_chunks = self.vae.decode_chunks_u8(
                        vparams, z, num_frames)
                    for c in u8_chunks:
                        try:
                            c.copy_to_host_async()
                        except Exception:  # backends without async copy
                            pass
                    # compute-done boundary for the phase timer (any slice
                    # read waits on the producing program)
                    float(jnp.sum(
                        u8_chunks[-1][:, -1:, :8, :8].astype(jnp.float32)))
                    _t_vae += _time.perf_counter() - _t0
                    clips.append(u8_chunks)
                else:
                    clip = self.vae.decode(vparams, z,
                                           num_frames=num_frames)
                    np.asarray(clip[..., :1, :1])  # sync for the phase timer
                    _t_vae += _time.perf_counter() - _t0
                    clips.append(clip)

        # --- postprocess (:648-652) ---------------------------------------- #
        _t0 = _time.perf_counter()
        if loop == 1:
            # chunks are uint8 on device with transfers already in flight;
            # assembly is the only host work left
            video = np.concatenate([np.asarray(c) for c in clips[0]], axis=1)
        else:
            # stitch loops, dropping duplicated condition frames (:641-643)
            dpix = ms_mod.dframe_to_frame(condition_frame_length)
            clips = [clips[0]] + [c[:, :, dpix:] for c in clips[1:]]
            samples = jnp.concatenate(clips, axis=2) if len(clips) > 1 else clips[0]
            # uint8-convert ON DEVICE: the fp32 video is ~4x the bytes of the
            # final uint8 frames, and device->host rides a slow link on
            # remote TPU setups — transfer the small representation
            u8 = jnp.clip((jnp.clip(samples, -1, 1) + 1) / 2 * 255 + 0.5, 0, 255)
            u8 = jnp.transpose(u8, (0, 2, 3, 4, 1)).astype(jnp.uint8)
            video = np.asarray(u8)  # [B, T, H, W, C]
        self.last_timings = {"text": _t_text, "denoise": _t_denoise,
                             "vae": _t_vae,
                             "postprocess": _time.perf_counter() - _t0}
        if not return_dict:
            return (video,)
        return VideoSysPipelineOutput(video=video)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
