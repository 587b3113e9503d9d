"""Latte text-to-video pipeline (DDIM, 16x512x512).

Behavioral reference: `videosys/pipelines/latte/pipeline_latte.py`
(LattePABConfig :35-77, LatteConfig :80-163, LattePipeline :166-951).
CFG convention is diffusers-style: uncond (negative prompt "") FIRST in the
doubled batch (:867-869). Video postprocess: x/2+0.5 -> uint8, fps=8.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videosys_tpu.core import parallel as par
from videosys_tpu.core.pab import PABConfig, build_plans
from videosys_tpu.core.pipeline import VideoSysPipeline, VideoSysPipelineOutput
from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D
from videosys_tpu.models.text_encoders.t5 import StubTextEncoder, T5TextEncoder
from videosys_tpu.models.transformers.latte import LatteConfig as LatteModelConfig
from videosys_tpu.models.transformers.latte import LatteT2V
from videosys_tpu.pipelines.open_sora.data_process import text_preprocessing
from videosys_tpu.schedulers.ddim import DDIMConfig, DDIMScheduler

VAE_SCALING = 0.18215


def LattePABConfig(**overrides) -> PABConfig:
    """Default PAB thresholds for Latte (pipeline_latte.py:35-77)."""
    mlp_cfg = {
        t: {"block": [0, 1, 2, 3, 4], "skip_count": 2}
        for t in (720, 640, 560, 480, 400)
    }
    defaults = dict(
        spatial_broadcast=True, spatial_threshold=(100, 800), spatial_range=2,
        temporal_broadcast=True, temporal_threshold=(100, 800), temporal_range=3,
        cross_broadcast=True, cross_threshold=(100, 800), cross_range=6,
        mlp_broadcast=True,
        mlp_spatial_broadcast_config=mlp_cfg,
        mlp_temporal_broadcast_config=dict(mlp_cfg),
    )
    defaults.update(overrides)
    return PABConfig(**defaults)


@dataclasses.dataclass
class LatteConfig:
    """Mirror of LatteConfig (pipeline_latte.py:80-163)."""

    model_path: str = "maxin-cn/Latte-1"
    num_gpus: int = 1
    # low-memory mode (shared VideoSysPipeline._exec_put): params stay
    # committed to host; each phase streams its module onto the device
    cpu_offload: bool = False
    enable_cp: bool = False
    # scheduler
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    # exact static text-KV bucketing (see pipelines/common.py)
    text_kv_bucket: bool = True
    # pab
    enable_pab: bool = False
    pab_config: Optional[PABConfig] = None
    dtype: str = "bf16"
    transformer_config: Optional[LatteModelConfig] = None
    vae: Optional[AutoencoderKL2D] = None

    def __post_init__(self):
        if self.pab_config is None:
            self.pab_config = LattePABConfig()
        self.pipeline_cls = LattePipeline


_DTYPES = {"fp32": jnp.float32, "bf16": jnp.bfloat16, "fp16": jnp.float16}


class LattePipeline(VideoSysPipeline):
    def __init__(self, config: LatteConfig, text_encoder: Any = None,
                 vae: Optional[AutoencoderKL2D] = None,
                 params: Optional[dict] = None, mesh=None, seed: int = 42):
        self._config = config
        self.dtype = _DTYPES[config.dtype]

        if mesh is None and config.num_gpus > 1:
            pcfg = par.ParallelConfig.from_world_size(config.num_gpus,
                                                      enable_cp=config.enable_cp)
            mesh = par.build_mesh(pcfg)
        self.mesh = mesh

        self.model_config = config.transformer_config or LatteModelConfig(dtype=self.dtype)
        self.vae = vae or config.vae or AutoencoderKL2D(dtype=self.dtype)
        if text_encoder is not None:
            self.text_encoder = text_encoder
        else:
            try:
                self.text_encoder = T5TextEncoder(
                    config.model_path, dtype=self.dtype,
                    offload=config.cpu_offload) \
                    if config.model_path else None
            except Exception as e:
                raise RuntimeError(
                    f"text encoder for {config.model_path!r} could not be "
                    f"loaded ({e}); pass model_path=None for the offline "
                    f"stub") from e
            if self.text_encoder is None:
                self.text_encoder = StubTextEncoder(
                    output_dim=self.model_config.caption_channels,
                    max_length=120)

        self.scheduler = DDIMScheduler(DDIMConfig(
            beta_start=config.beta_start, beta_end=config.beta_end,
            beta_schedule=config.beta_schedule, clip_sample=False))

        if params is not None:
            self.params = params
        elif config.cpu_offload:
            # low-mem: build params under a host default device (no init-time
            # HBM peak); phases stream modules in via _exec_put
            with jax.default_device(jax.devices("cpu")[0]):
                self.params = self._init_params(seed)
        else:
            self.params = self._init_params(seed)
        if config.cpu_offload:
            self._offload_params_to_host()
        self._step_fns: dict = {}

    def _init_params(self, seed: int) -> dict:
        from videosys_tpu.utils.checkpoint import require_weights, try_load_params
        from videosys_tpu.utils.jit import jit_init

        loaded = try_load_params(self._config, family="latte") or {}
        require_weights(loaded, self._config)
        mc = self.model_config
        model = LatteT2V(mc)
        dummy_x = jnp.zeros((1, mc.in_channels, 2, 2 * mc.patch_size,
                             2 * mc.patch_size), jnp.float32)
        p_t = loaded.get("transformer") or jit_init(
            model.init, jax.random.key(seed), dummy_x, jnp.zeros((1,)),
            jnp.zeros((1, 4, mc.caption_channels)))
        p_v = loaded.get("vae") or jit_init(
            self.vae.init, jax.random.key(seed + 1),
            jnp.zeros((1, 16, 16, 3), jnp.float32), jax.random.key(0))
        from videosys_tpu.utils.params import cast_float_params
        # half-precision inference weights (see cast_float_params)
        return cast_float_params({"transformer": p_t, "vae": p_v},
                                 self.dtype)

    def _get_step_fn(self, plan, guidance_scale: float, a_t: float, a_prev: float):
        key = (plan, guidance_scale, a_t, a_prev)
        if key in self._step_fns:
            return self._step_fns[key]
        pab = self._config.pab_config if self._config.enable_pab else None
        model = LatteT2V(self.model_config, plan=plan, pab_config=pab)
        sched = self.scheduler

        def step(params, z, t_scalar, y_all, kv_mask_all, cache):
            B = z.shape[0]
            z_in = jnp.concatenate([z, z], axis=0).astype(self.dtype)
            t_in = jnp.full((2 * B,), t_scalar, jnp.float32)
            if cache is not None:
                out, cache = model.apply(params, z_in, t_in, y_all,
                                         kv_mask=kv_mask_all, pab_cache=cache)
            else:
                out = model.apply(params, z_in, t_in, y_all, kv_mask=kv_mask_all)
            eps = out[:, : self.model_config.in_channels]  # learned sigma split
            eps_uncond, eps_text = eps[:B], eps[B:]
            eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
            x0, eps_hat = sched.predict_x0(z, eps, a_t)
            z = a_prev**0.5 * x0 + (1 - a_prev) ** 0.5 * eps_hat
            return z, cache

        fn = jax.jit(step, donate_argnums=(1, 5))
        self._step_fns[key] = fn
        return fn

    def generate(
        self,
        prompt: str,
        negative_prompt: str = "",
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        video_length: int = 16,
        height: int = 512,
        width: int = 512,
        seed: int = -1,
        verbose: bool = True,
        return_dict: bool = True,
    ):
        cfg = self._config
        if seed < 0:
            seed = np.random.randint(0, 2**31 - 1)
        rng = jax.random.key(seed)

        # uncond FIRST (diffusers convention, :867-869)
        y_pos, m_pos = self.text_encoder.encode([text_preprocessing(prompt)])
        y_neg, m_neg = self.text_encoder.encode([text_preprocessing(negative_prompt)])
        y_all = jnp.concatenate([y_neg, y_pos], axis=0).astype(self.dtype)
        kv_mask_all = jnp.concatenate([m_neg, m_pos], axis=0)
        B = y_pos.shape[0]
        # exact static text-KV bucketing (pipelines/common.py) — Latte's
        # cross-attention masks pad tokens to -1e9 + fp32 softmax, so the
        # slice changes no output bit
        self.last_text_kv_len = y_all.shape[1]
        if getattr(cfg, "text_kv_bucket", False):
            from videosys_tpu.pipelines.common import bucket_text_kv

            y_all, kv_mask_all, self.last_text_kv_len = bucket_text_kv(
                y_all, kv_mask_all, y_all.shape[1])

        sf = 2 ** (len(self.vae.block_out_channels) - 1)
        h_lat, w_lat = height // sf, width // sf
        rng, zkey = jax.random.split(rng)
        z = jax.random.normal(
            zkey, (B, self.model_config.in_channels, video_length, h_lat, w_lat),
            jnp.float32)

        timesteps = self.scheduler.set_timesteps(num_inference_steps)
        pab = cfg.pab_config if cfg.enable_pab else None
        plans = build_plans(pab, timesteps.astype(np.float32),
                            self.model_config.num_layers, None)

        cache = None
        if cfg.enable_pab:
            p = self.model_config.patch_size
            S_tok = (h_lat // p) * (w_lat // p)
            cache = LatteT2V(self.model_config, pab_config=pab).init_cache(
                2 * B, video_length, S_tok)

        mesh_ctx = par.use_mesh(self.mesh) if self.mesh is not None else jax.default_device(jax.devices()[0])
        with mesh_ctx:
            tparams = self._exec_put(self.params["transformer"])
            for i, t_i in enumerate(timesteps):
                a_t, a_prev = self.scheduler.alphas_for_step(int(t_i))
                fn = self._get_step_fn(plans[i], float(guidance_scale), a_t, a_prev)
                z, cache = fn(tparams, z, float(t_i),
                              y_all, kv_mask_all, cache)
            tparams = None  # cpu_offload: free transformer HBM before decode
            # per-frame VAE decode (:917-925), jitted per frame shape
            frames = jnp.transpose(z, (0, 2, 3, 4, 1)).reshape(
                (B * video_length, h_lat, w_lat, -1))
            from videosys_tpu.utils.jit import jit_method

            video = jit_method(self, "_decode_frames")(
                self._exec_put(self.params["vae"]), frames)

        # uint8 on device: transfer 1/4 the bytes over the host link
        video = jnp.reshape(video, (B, video_length) + video.shape[1:])
        video = video.astype(jnp.float32)
        video = (jnp.clip(video / 2 + 0.5, 0, 1) * 255).astype(jnp.uint8)
        video = np.asarray(video)
        if not return_dict:
            return (video,)
        return VideoSysPipelineOutput(video=video)

    def _decode_frames(self, vae_params, frames):
        return self.vae.apply(vae_params, frames / VAE_SCALING, method="decode")

    def save_video(self, video, output_path: str, fps: int = 8):
        return super().save_video(video, output_path, fps=fps)
