"""Open-Sora-Plan text-to-video pipeline (v1.1 PNDM / v1.2 Euler-Ancestral).

Behavioral reference:
`videosys/pipelines/open_sora_plan/pipeline_open_sora_plan.py`
(OpenSoraPlanV110PABConfig :41-102, OpenSoraPlanV120PABConfig :103-121,
OpenSoraPlanConfig :123-225, OpenSoraPlanPipeline :228-1195). v1.1 runs the
LatteT2V variant with a PNDM scheduler at 65/221x512x512; v1.2 runs
OpenSoraT2V with Euler-Ancestral at 29/93 x 480p/720p. CFG uncond-first;
CausalVAE (4x8x8) decode with optional tiling; output uint8, fps 24.
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
from videosys_tpu.models.autoencoders.autoencoder_causal_vae import (
    CausalVAE,
    CausalVAEConfig,
)
from videosys_tpu.models.text_encoders.t5 import StubTextEncoder, T5TextEncoder
from videosys_tpu.models.transformers.open_sora_plan_v110 import (
    OpenSoraPlanV110Config,
    OpenSoraPlanV110Transformer,
)
from videosys_tpu.models.transformers.open_sora_plan_v120 import (
    OpenSoraPlanV120Config,
    OpenSoraPlanV120Transformer,
)
from videosys_tpu.pipelines.open_sora.data_process import text_preprocessing
from videosys_tpu.schedulers.euler_ancestral import EulerAncestralScheduler
from videosys_tpu.schedulers.pndm import PNDMScheduler


def OpenSoraPlanV110PABConfig(**overrides) -> PABConfig:
    """(:41-102): spatial/temporal/cross in (100, 850) + 14-timestep MLP skip
    over blocks 0-6."""
    mlp_cfg = {
        t: {"block": [0, 1, 2, 3, 4, 5, 6], "skip_count": 2}
        for t in range(426, 739, 24)
    }
    defaults = dict(
        spatial_broadcast=True, spatial_threshold=(100, 850), spatial_range=2,
        temporal_broadcast=True, temporal_threshold=(100, 850), temporal_range=4,
        cross_broadcast=True, cross_threshold=(100, 850), cross_range=6,
        mlp_broadcast=True,
        mlp_spatial_broadcast_config=mlp_cfg,
        mlp_temporal_broadcast_config=dict(mlp_cfg),
    )
    defaults.update(overrides)
    return PABConfig(**defaults)


def OpenSoraPlanV120PABConfig(**overrides) -> PABConfig:
    """(:103-121): spatial + cross only (single-stream blocks)."""
    defaults = dict(
        spatial_broadcast=True, spatial_threshold=(100, 850), spatial_range=2,
        cross_broadcast=True, cross_threshold=(100, 850), cross_range=6,
    )
    defaults.update(overrides)
    return PABConfig(**defaults)


# latent (h, w) per v1.2 transformer_type suffix; pixels = latent * 8
_V120_SAMPLE_SIZES = {"480p": (60, 80), "720p": (90, 120)}
_DTYPES = {"fp32": jnp.float32, "bf16": jnp.bfloat16, "fp16": jnp.float16}


@dataclasses.dataclass
class OpenSoraPlanConfig:
    """Mirror of OpenSoraPlanConfig (:171-225)."""

    version: str = "v120"
    transformer_type: str = "29x480p"
    transformer: Optional[str] = None      # HF id (weights path)
    text_encoder: Optional[str] = None
    num_gpus: int = 1
    enable_cp: bool = False
    cpu_offload: bool = False
    enable_tiling: bool = True
    tile_overlap_factor: float = 0.25
    # exact static text-KV bucketing (see pipelines/common.py)
    text_kv_bucket: bool = True
    enable_pab: bool = False
    pab_config: Optional[PABConfig] = None
    dtype: str = "bf16"
    transformer_config: Any = None
    vae: Optional[CausalVAE] = None

    def __post_init__(self):
        assert self.version in ("v110", "v120")
        if self.version == "v110":
            assert self.transformer_type in ("65x512x512", "221x512x512")
        else:
            assert self.transformer_type in (
                "93x480p", "93x720p", "29x480p", "29x720p")
        self.num_frames = int(self.transformer_type.split("x")[0])
        if self.enable_pab and self.pab_config is None:
            self.pab_config = (OpenSoraPlanV110PABConfig()
                               if self.version == "v110"
                               else OpenSoraPlanV120PABConfig())
        self.pipeline_cls = OpenSoraPlanPipeline


class OpenSoraPlanPipeline(VideoSysPipeline):
    def __init__(self, config: OpenSoraPlanConfig, text_encoder: Any = None,
                 vae: Optional[CausalVAE] = None,
                 params: Optional[dict] = None, mesh=None, seed: int = 42):
        self._config = config
        self.dtype = _DTYPES[config.dtype]
        self.version = config.version

        if mesh is None and config.num_gpus > 1:
            pcfg = par.ParallelConfig.from_world_size(config.num_gpus,
                                                      enable_cp=config.enable_cp)
            mesh = par.build_mesh(pcfg)
        self.mesh = mesh

        # --- model config ------------------------------------------------- #
        if config.transformer_config is not None:
            self.model_config = config.transformer_config
        elif self.version == "v110":
            self.model_config = OpenSoraPlanV110Config(
                config.transformer_type, dtype=self.dtype)
        else:
            frames = config.num_frames
            hw = _V120_SAMPLE_SIZES[config.transformer_type.split("x")[1]]
            self.model_config = OpenSoraPlanV120Config(
                sample_size=hw, sample_size_t=(frames - 1) // 4 + 1,
                dtype=self.dtype)
        self.model_cls = (OpenSoraPlanV110Transformer if self.version == "v110"
                         else OpenSoraPlanV120Transformer)

        # --- VAE ----------------------------------------------------------- #
        if vae is not None or config.vae is not None:
            self.vae = vae or config.vae
        else:
            vcfg = (CausalVAEConfig(dtype=self.dtype) if self.version == "v110"
                    else CausalVAEConfig.v120(dtype=self.dtype))
            self.vae = CausalVAE(vcfg, version=self.version)
        if config.enable_tiling:
            self.vae.enable_tiling(config.tile_overlap_factor)

        # --- text encoder (T5-XXL v110 / mT5-XXL v120) --------------------- #
        if text_encoder is not None:
            self.text_encoder = text_encoder
        else:
            try:
                self.text_encoder = T5TextEncoder(
                    config.text_encoder, dtype=self.dtype,
                    offload=config.cpu_offload) \
                    if config.text_encoder else None
            except Exception as e:
                raise RuntimeError(
                    f"text encoder {config.text_encoder!r} could not be "
                    f"loaded ({e}); pass text_encoder=None for the offline "
                    f"stub") from e
            if self.text_encoder is None:
                self.text_encoder = StubTextEncoder(
                    output_dim=self.model_config.caption_channels,
                    max_length=300 if self.version == "v110" else 512)

        # --- scheduler (:299-306) ------------------------------------------ #
        if self.version == "v110":
            self.scheduler = PNDMScheduler()
        else:
            self.scheduler = EulerAncestralScheduler()

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

    # ---------------------------------------------------------------------- #
    def _init_params(self, seed: int) -> dict:
        from videosys_tpu.utils.checkpoint import require_weights, try_load_params
        from videosys_tpu.utils.jit import jit_init

        from videosys_tpu.utils.params import cast_float_params

        family = "latte" if self.version == "v110" else "osp_v120"
        loaded = try_load_params(self._config, family=family,
                                 default_depth=28 if self.version == "v110"
                                 else 32) or {}
        require_weights(loaded, self._config)
        if "transformer" in loaded:
            p_v = loaded.get("vae") or self.vae.init(jax.random.key(seed + 1))
            return cast_float_params(
                {"transformer": loaded["transformer"], "vae": p_v},
                self.dtype)
        mc = self.model_config
        model = self.model_cls(mc)
        p = mc.patch_size
        dummy_x = jnp.zeros((1, mc.in_channels, 2, 2 * p, 2 * p), jnp.float32)
        if self.version == "v110":
            p_t = jit_init(model.init, jax.random.key(seed), dummy_x,
                           jnp.zeros((1,)),
                           jnp.zeros((1, 4, mc.caption_channels)))
        else:
            p_t = jit_init(model.init, jax.random.key(seed), dummy_x,
                           jnp.zeros((1, 4, mc.caption_channels)),
                           jnp.zeros((1,)))
        p_v = self.vae.init(jax.random.key(seed + 1))
        # half-precision inference weights: OSP v1.2's 2.7B params at fp32
        # are 10.3 GiB of arguments — compile-OOMs a 16 GiB v5e (measured)
        return cast_float_params({"transformer": p_t, "vae": p_v},
                                 self.dtype)

    def _get_eps_fn(self, plan, guidance_scale: float):
        """Jitted CFG model eval returning epsilon; scheduler math runs
        host-side (PNDM is stateful / Euler-Ancestral draws noise)."""
        key = (plan, guidance_scale)
        if key in self._step_fns:
            return self._step_fns[key]
        pab = self._config.pab_config if self._config.enable_pab else None
        model = self.model_cls(self.model_config, plan=plan, pab_config=pab)
        in_ch = self.model_config.in_channels
        version = self.version

        def eps_fn(params, z_in, t_scalar, y_all, kv_mask_all, cache):
            B2 = z_in.shape[0]
            t_in = jnp.full((B2,), t_scalar, jnp.float32)
            zi = z_in.astype(self.dtype)
            if version == "v110":
                args = (zi, t_in, y_all)
                kw = dict(kv_mask=kv_mask_all)
            else:
                args = (zi, y_all, t_in)
                kw = dict(kv_mask=kv_mask_all)
            if cache is not None:
                out, cache = model.apply(params, *args, pab_cache=cache, **kw)
            else:
                out = model.apply(params, *args, **kw)
            eps = out[:, :in_ch]  # learned-sigma split (:1155-1158)
            B = B2 // 2
            eps_uncond, eps_text = eps[:B], eps[B:]
            eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
            return eps, cache

        fn = jax.jit(eps_fn, donate_argnums=(5,))
        self._step_fns[key] = fn
        return fn

    # ---------------------------------------------------------------------- #
    def generate(
        self,
        prompt: str,
        negative_prompt: str = "",
        num_inference_steps: int = 100,
        guidance_scale: float = 7.5,
        seed: int = -1,
        verbose: bool = True,
        return_dict: bool = True,
    ):
        cfg = self._config
        mc = self.model_config
        if seed < 0:
            seed = np.random.randint(0, 2**31 - 1)
        rng = jax.random.key(seed)

        # encode prompts, uncond FIRST (:1072-1075)
        y_pos, m_pos = self.text_encoder.encode([text_preprocessing(prompt)])
        y_neg, m_neg = self.text_encoder.encode([text_preprocessing(negative_prompt)])
        y_all = jnp.concatenate([y_neg, y_pos], axis=0).astype(self.dtype)
        kv_mask_all = jnp.concatenate([m_neg, m_pos], axis=0)
        B = y_pos.shape[0]
        # exact static text-KV bucketing (pipelines/common.py): both OSP
        # versions mask pad tokens to -1e9 + fp32 softmax in cross-attention
        self.last_text_kv_len = y_all.shape[1]
        if getattr(cfg, "text_kv_bucket", False):
            from videosys_tpu.pipelines.common import bucket_text_kv

            y_all, kv_mask_all, self.last_text_kv_len = bucket_text_kv(
                y_all, kv_mask_all, y_all.shape[1])

        # latent shape from the checkpoint's sample size (:1040-1043)
        if self.version == "v110":
            t_lat = mc.video_length
            h_lat = w_lat = mc.sample_size
        else:
            t_lat = mc.sample_size_t
            h_lat, w_lat = mc.sample_size
        rng, zkey = jax.random.split(rng)
        z = jax.random.normal(zkey, (B, mc.in_channels, t_lat, h_lat, w_lat),
                              jnp.float32)

        timesteps = self.scheduler.set_timesteps(num_inference_steps)
        if self.version == "v120":
            z = z * self.scheduler.init_noise_sigma

        pab = cfg.pab_config if cfg.enable_pab else None
        plans = build_plans(pab, np.asarray(timesteps, np.float32),
                            mc.num_layers, None)

        cache = None
        if cfg.enable_pab:
            p = mc.patch_size
            if self.version == "v110":
                S_tok = (h_lat // p) * (w_lat // p)
                cache = self.model_cls(mc, pab_config=pab).init_cache(
                    2 * B, t_lat, S_tok)
            else:
                N = t_lat * (h_lat // p) * (w_lat // p)
                cache = self.model_cls(mc, pab_config=pab).init_cache(2 * B, N)

        mesh_ctx = (par.use_mesh(self.mesh) if self.mesh is not None
                    else jax.default_device(jax.devices()[0]))
        with mesh_ctx:
            tparams = self._exec_put(self.params["transformer"])
            for i, t_i in enumerate(timesteps):
                fn = self._get_eps_fn(plans[i], float(guidance_scale))
                z_in = jnp.concatenate([z, z], axis=0)
                if self.version == "v120":
                    z_in = self.scheduler.scale_model_input(z_in, i)
                eps, cache = fn(tparams, z_in, float(t_i),
                                y_all, kv_mask_all, cache)
                if self.version == "v110":
                    z = self.scheduler.step(eps, int(t_i), z)
                else:
                    rng, nkey = jax.random.split(rng)
                    z = self.scheduler.step(eps, i, z, key=nkey)
            tparams = None  # cpu_offload: free transformer HBM
            video = self.vae.decode(self._exec_put(self.params["vae"]), z)

        # uint8 on device: transfer 1/4 the bytes over the host link
        video = video.astype(jnp.float32)
        video = jnp.clip(video / 2 + 0.5, 0, 1) * 255
        video = jnp.transpose(video, (0, 2, 3, 4, 1)).astype(jnp.uint8)
        video = np.asarray(video)  # [B, T, H, W, C]
        video = video[:, :cfg.num_frames]
        if not return_dict:
            return (video,)
        return VideoSysPipelineOutput(video=video)

    def save_video(self, video, output_path: str, fps: int = 24):
        return super().save_video(video, output_path, fps=fps)
