"""CogVideoX text-to-video pipeline (49x480x720, DDIM or DPM).

Behavioral reference: `videosys/pipelines/cogvideox/pipeline_cogvideox.py`
(CogVideoXPABConfig :33-45, CogVideoXConfig :47-113, CogVideoXPipeline
:116-833). Notable semantics preserved:
* CFG uncond-first (prompt_embeds = cat([neg, pos]), :676);
* dynamic CFG: 1 + g * (1 - cos(pi * ((N - t)/N)^5)) / 2 (:702-705);
* DPM branch threads old_pred_original_sample (:711-722);
* latent layout [B, F, C, h, w]; decode divides by scaling_factor 1.15258426.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videosys_tpu.core import parallel as par
from videosys_tpu.core.pab import PABConfig, build_plans
from videosys_tpu.core.pipeline import VideoSysPipeline, VideoSysPipelineOutput
from videosys_tpu.models.autoencoders.autoencoder_cogvideox import (
    AutoencoderKLCogVideoX,
    CogVideoXVAEConfig,
)
from videosys_tpu.models.text_encoders.t5 import StubTextEncoder, T5TextEncoder
from videosys_tpu.models.transformers.cogvideox import (
    CogVideoXConfig as CogModelConfig,
    CogVideoXTransformer3D,
)
from videosys_tpu.schedulers.ddim import DDIMConfig, DDIMScheduler
from videosys_tpu.schedulers.dpm_cogvideox import CogVideoXDPMConfig, CogVideoXDPMScheduler


def CogVideoXPABConfig(**overrides) -> PABConfig:
    """Spatial-only PAB for CogVideoX (pipeline_cogvideox.py:33-45)."""
    defaults = dict(spatial_broadcast=True, spatial_threshold=(100, 850),
                    spatial_range=2)
    defaults.update(overrides)
    return PABConfig(**defaults)


@dataclasses.dataclass
class CogVideoXConfig:
    """Mirror of CogVideoXConfig (:47-113)."""

    model_path: str = "THUDM/CogVideoX-2b"
    num_gpus: int = 1
    # low-memory mode (shared VideoSysPipeline._exec_put): params stay
    # committed to host; each phase streams its module onto the device
    cpu_offload: bool = False
    vae_tiling: bool = True
    enable_pab: bool = False
    pab_config: Optional[PABConfig] = None
    scheduler: str = "ddim"  # "ddim" (2b) | "dpm" (5b default)
    dtype: str = "bf16"
    transformer_config: Optional[CogModelConfig] = None
    vae_config: Optional[CogVideoXVAEConfig] = None

    def __post_init__(self):
        if self.pab_config is None:
            self.pab_config = CogVideoXPABConfig()
        self.pipeline_cls = CogVideoXPipeline


_DTYPES = {"fp32": jnp.float32, "bf16": jnp.bfloat16, "fp16": jnp.float16}


class CogVideoXPipeline(VideoSysPipeline):
    def __init__(self, config: CogVideoXConfig, text_encoder: Any = None,
                 vae: Optional[AutoencoderKLCogVideoX] = None,
                 params: Optional[dict] = None, mesh=None, seed: int = 42):
        self._config = config
        self.dtype = _DTYPES[config.dtype]

        if mesh is None and config.num_gpus > 1:
            mesh = par.build_mesh(par.ParallelConfig.from_world_size(config.num_gpus))
        self.mesh = mesh

        is_5b = "5b" in (config.model_path or "")
        self.model_config = config.transformer_config or CogModelConfig(
            dtype=self.dtype,
            use_rotary_positional_embeddings=is_5b,
            num_layers=42 if is_5b else 30,
            num_heads=48 if is_5b else 30,
        )
        self.vae = vae or AutoencoderKLCogVideoX(
            config.vae_config or CogVideoXVAEConfig(dtype=self.dtype))
        if config.vae_tiling:
            self.vae.enable_tiling()

        if text_encoder is not None:
            self.text_encoder = text_encoder
        else:
            try:
                self.text_encoder = T5TextEncoder(
                    config.model_path, max_length=self.model_config.max_text_seq_length,
                    dtype=self.dtype,
                    offload=config.cpu_offload) if config.model_path else None
            except Exception as e:
                raise RuntimeError(
                    f"text encoder for {config.model_path!r} could not be "
                    f"loaded ({e}); pass model_path=None for the offline "
                    f"stub") from e
            if self.text_encoder is None:
                self.text_encoder = StubTextEncoder(
                    output_dim=self.model_config.text_embed_dim,
                    max_length=self.model_config.max_text_seq_length)

        if config.scheduler == "dpm":
            self.scheduler = CogVideoXDPMScheduler(CogVideoXDPMConfig())
        else:
            self.scheduler = DDIMScheduler(DDIMConfig(
                prediction_type="v_prediction", snr_shift_scale=3.0,
                rescale_betas_zero_snr=True, timestep_spacing="trailing",
                beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
                set_alpha_to_one=True))

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

        loaded = try_load_params(self._config, family="cogvideox",
                                 default_depth=30) or {}
        require_weights(loaded, self._config)
        mc = self.model_config
        model = CogVideoXTransformer3D(mc)
        dummy_x = jnp.zeros((1, 2, mc.in_channels, 2 * mc.patch_size,
                             2 * mc.patch_size), jnp.float32)
        dummy_enc = jnp.zeros((1, 4, mc.text_embed_dim), jnp.float32)
        p_t = loaded.get("transformer") or jit_init(
            model.init, jax.random.key(seed), dummy_x, dummy_enc,
            jnp.zeros((1,)))
        p_v = loaded.get("vae") or self.vae.init(jax.random.key(seed + 1))
        from videosys_tpu.utils.params import cast_float_params
        # half-precision inference weights (see cast_float_params)
        return cast_float_params({"transformer": p_t, "vae": p_v},
                                 self.dtype)

    def _get_model_fn(self, plan):
        pab = self._config.pab_config if self._config.enable_pab else None
        model = CogVideoXTransformer3D(self.model_config, plan=plan,
                                       pab_config=pab)

        def model_fn(params, z, t_scalar, enc_all, cache):
            B = z.shape[0]
            z_in = jnp.concatenate([z, z], axis=0).astype(self.dtype)
            t_in = jnp.full((2 * B,), t_scalar, jnp.float32)
            if cache is not None:
                out, cache = model.apply(params, z_in, enc_all, t_in,
                                         pab_cache=cache)
            else:
                out = model.apply(params, z_in, enc_all, t_in)
            return out.astype(jnp.float32), cache

        key = plan
        if key not in self._step_fns:
            self._step_fns[key] = jax.jit(model_fn, donate_argnums=(4,))
        return self._step_fns[key]

    def generate(
        self,
        prompt: str,
        negative_prompt: str = "",
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = False,
        num_frames: int = 49,
        height: int = 480,
        width: int = 720,
        seed: int = -1,
        verbose: bool = True,
        return_dict: bool = True,
    ):
        cfg = self._config
        mc = self.model_config
        if seed < 0:
            seed = np.random.randint(0, 2**31 - 1)
        rng = jax.random.key(seed)

        y_pos, _ = self.text_encoder.encode([prompt])
        y_neg, _ = self.text_encoder.encode([negative_prompt])
        enc_all = jnp.concatenate([y_neg, y_pos], axis=0).astype(self.dtype)
        B = y_pos.shape[0]

        sf = self.vae.spatial_factor
        t_ratio = mc.temporal_compression_ratio
        F_lat = (num_frames - 1) // t_ratio + 1
        h_lat, w_lat = height // sf, width // sf
        rng, zkey = jax.random.split(rng)
        z = jax.random.normal(zkey, (B, F_lat, mc.in_channels, h_lat, w_lat),
                              jnp.float32)

        timesteps = self.scheduler.set_timesteps(num_inference_steps)
        pab = cfg.pab_config if cfg.enable_pab else None
        plans = build_plans(pab, timesteps.astype(np.float32), mc.num_layers, None)

        cache = None
        if cfg.enable_pab:
            p = mc.patch_size
            N_vid = F_lat * (h_lat // p) * (w_lat // p)
            cache = CogVideoXTransformer3D(mc, pab_config=pab).init_cache(
                2 * B, N_vid, y_pos.shape[1])

        is_dpm = isinstance(self.scheduler, CogVideoXDPMScheduler)
        old_x0 = None
        mesh_ctx = par.use_mesh(self.mesh) if self.mesh is not None else _null()
        with mesh_ctx:
            tparams = self._exec_put(self.params["transformer"])
            for i, t_i in enumerate(timesteps):
                model_fn = self._get_model_fn(plans[i])
                pred, cache = model_fn(tparams, z,
                                       float(t_i), enc_all, cache)
                g = guidance_scale
                if use_dynamic_cfg:
                    g = 1 + guidance_scale * (
                        (1 - math.cos(math.pi * ((num_inference_steps - float(t_i))
                                                 / num_inference_steps) ** 5.0)) / 2)
                eps_u, eps_t = pred[:B], pred[B:]
                eps = eps_u + g * (eps_t - eps_u)
                if is_dpm:
                    rng, skey = jax.random.split(rng)
                    t_back = int(timesteps[i - 1]) if i > 0 else None
                    z, old_x0 = self.scheduler.step(eps, old_x0, int(t_i),
                                                    t_back, z, skey)
                else:
                    z = self.scheduler.step(eps, int(t_i), z)

            # decode: [B, F, C, h, w] -> [B, C, F, h, w], /scaling (:decode_latents)
            tparams = None  # cpu_offload: free transformer HBM
            lat = jnp.swapaxes(z, 1, 2) / self.vae.config.scaling_factor
            video = self.vae.decode(self._exec_put(self.params["vae"]), lat)

        # uint8 on device: transfer 1/4 the bytes over the host link
        video = video.astype(jnp.float32)
        video = jnp.round(jnp.clip(video / 2 + 0.5, 0, 1) * 255)
        video = jnp.transpose(video, (0, 2, 3, 4, 1)).astype(jnp.uint8)
        video = np.asarray(video)  # [B, T, H, W, C]
        if not return_dict:
            return (video,)
        return VideoSysPipelineOutput(video=video)


class _null:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
