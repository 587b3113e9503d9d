"""Vchitect-2.0 text-to-video pipeline (flow-match Euler, dual CLIP + T5).

Behavioral reference: `videosys/pipelines/vchitect/pipeline_vchitect.py`
(VchitectPABConfig :32-56, VchitectConfig :59-127, VchitectXLPipeline
:130-998). SD3-style prompt embedding: CLIP-L + CLIP-G token embeds
(concat to 2048, zero-padded to the T5 width 4096) stacked with T5 embeds on
the sequence axis; pooled projections concat to 2048. Denoise: the
transformer is evaluated once per CFG branch (:925-947) with a per-step
cosine-dynamic guidance scale (:943-947); 16-ch 2D KL VAE per-frame decode
with SD3 scaling/shift (:980-983); output uint8, fps 8.
"""

from __future__ import annotations

import dataclasses
import hashlib
import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videosys_tpu.core import parallel as par
from videosys_tpu.core.pab import PABConfig, build_plans
from videosys_tpu.core.pipeline import VideoSysPipeline, VideoSysPipelineOutput
from videosys_tpu.models.autoencoders.vae2d import AutoencoderKL2D
from videosys_tpu.models.transformers.vchitect import (
    VchitectModelConfig,
    VchitectXLTransformer,
)
from videosys_tpu.pipelines.open_sora.data_process import text_preprocessing
from videosys_tpu.schedulers.flow_match_euler import FlowMatchEulerScheduler

# SD3 VAE constants (:980: latents / scaling + shift before decode)
VAE_SCALING = 1.5305
VAE_SHIFT = 0.0609


def VchitectPABConfig(**overrides) -> PABConfig:
    """(:32-56)."""
    defaults = dict(
        spatial_broadcast=True, spatial_threshold=(100, 800), spatial_range=2,
        temporal_broadcast=True, temporal_threshold=(100, 800), temporal_range=4,
        cross_broadcast=True, cross_threshold=(100, 800), cross_range=6,
    )
    defaults.update(overrides)
    return PABConfig(**defaults)


class DualStubTextEncoder:
    """Offline stand-in for the CLIP-L + CLIP-G + T5 trio (:287-399):
    deterministic word-hash embeddings shaped exactly like the SD3 packing —
    (prompt_embeds [B, L_clip + L_t5, joint_dim], pooled [B, pooled_dim])."""

    def __init__(self, joint_dim: int = 4096, pooled_dim: int = 2048,
                 clip_len: int = 77, t5_len: int = 256):
        self.joint_dim = joint_dim
        self.pooled_dim = pooled_dim
        self.clip_len = clip_len
        self.t5_len = t5_len

    def _vec(self, word: str, dim: int, salt: str) -> np.ndarray:
        seed = int.from_bytes(
            hashlib.sha256((salt + word).encode()).digest()[:4], "little")
        return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)

    def encode_dual(self, texts: Sequence[str]) -> Tuple[jax.Array, jax.Array]:
        B = len(texts)
        L = self.clip_len + self.t5_len
        embs = np.zeros((B, L, self.joint_dim), np.float32)
        pooled = np.zeros((B, self.pooled_dim), np.float32)
        for i, text in enumerate(texts):
            words = text.split() if text else []
            for j, w in enumerate(words[: self.clip_len]):
                # clip part: 2048 wide, zero-padded to joint_dim (:486-498)
                embs[i, j, : self.pooled_dim] = self._vec(w, self.pooled_dim, "clip")
            for j, w in enumerate(words[: self.t5_len]):
                embs[i, self.clip_len + j] = self._vec(w, self.joint_dim, "t5")
            if words:
                pooled[i] = np.mean(
                    [self._vec(w, self.pooled_dim, "pool") for w in words], axis=0)
        return jnp.asarray(embs), jnp.asarray(pooled)


@dataclasses.dataclass
class VchitectConfig:
    """Mirror of VchitectConfig (:59-127)."""

    model_path: str = "Vchitect/Vchitect-2.0-2B"
    num_gpus: int = 1
    enable_cp: bool = False
    cpu_offload: bool = False
    enable_pab: bool = False
    pab_config: Optional[PABConfig] = None
    dtype: str = "bf16"
    transformer_config: Optional[VchitectModelConfig] = None
    vae: Optional[AutoencoderKL2D] = None

    def __post_init__(self):
        if self.pab_config is None:
            self.pab_config = VchitectPABConfig()
        self.pipeline_cls = VchitectXLPipeline


_DTYPES = {"fp32": jnp.float32, "bf16": jnp.bfloat16, "fp16": jnp.float16}


class VchitectXLPipeline(VideoSysPipeline):
    def __init__(self, config: VchitectConfig, text_encoder: Any = None,
                 vae: Optional[AutoencoderKL2D] = None,
                 params: Optional[dict] = None, mesh=None, seed: int = 42):
        self._config = config
        self.dtype = _DTYPES[config.dtype]

        if mesh is None and config.num_gpus > 1:
            pcfg = par.ParallelConfig.from_world_size(config.num_gpus,
                                                      enable_cp=config.enable_cp)
            mesh = par.build_mesh(pcfg)
        self.mesh = mesh

        self.model_config = (config.transformer_config
                             or VchitectModelConfig(dtype=self.dtype))
        self.vae = vae or config.vae or AutoencoderKL2D(
            latent_channels=self.model_config.in_channels, dtype=self.dtype)
        if text_encoder is not None:
            self.text_encoder = text_encoder
        else:
            # real CLIP-L + CLIP-G + T5 trio when the checkpoint dir carries
            # the text encoders (reference :287-399); offline stub otherwise
            import os

            if config.model_path and os.path.isdir(
                    os.path.join(str(config.model_path), "text_encoder")):
                from videosys_tpu.models.text_encoders.clip import (
                    VchitectTripleTextEncoder,
                )

                self.text_encoder = VchitectTripleTextEncoder(
                    str(config.model_path), dtype=self.dtype)
            else:
                self.text_encoder = DualStubTextEncoder(
                    joint_dim=self.model_config.joint_attention_dim,
                    pooled_dim=self.model_config.pooled_projection_dim)
        self.scheduler = FlowMatchEulerScheduler()

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

        loaded = try_load_params(self._config, family="vchitect",
                                 default_depth=18) or {}
        require_weights(loaded, self._config)
        mc = self.model_config
        model = VchitectXLTransformer(mc)
        p = mc.patch_size
        dummy = jnp.zeros((1, 2, mc.in_channels, 2 * p, 2 * p), jnp.float32)
        p_t = loaded.get("transformer") or jit_init(
            model.init, jax.random.key(seed), dummy,
            jnp.zeros((1, 4, mc.joint_attention_dim)),
            jnp.zeros((1, mc.pooled_projection_dim)), jnp.zeros((1,)))
        p_v = loaded.get("vae") or jit_init(
            self.vae.init, jax.random.key(seed + 1),
            jnp.zeros((1, 16, 16, 3), jnp.float32), jax.random.key(0))
        from videosys_tpu.utils.params import cast_float_params
        # half-precision inference weights (see cast_float_params)
        return cast_float_params({"transformer": p_t, "vae": p_v},
                                 self.dtype)

    def _get_v_fn(self, plan):
        """Jitted single-branch velocity eval (the reference runs uncond and
        cond as separate forwards, :925-941)."""
        key = plan
        if key in self._step_fns:
            return self._step_fns[key]
        pab = self._config.pab_config if self._config.enable_pab else None
        model = VchitectXLTransformer(self.model_config, plan=plan,
                                      pab_config=pab)

        def v_fn(params, z, t_scalar, y, pooled, cache):
            t_in = jnp.full((z.shape[0],), t_scalar, jnp.float32)
            if cache is not None:
                out, cache = model.apply(params, z.astype(self.dtype), y,
                                         pooled, t_in, pab_cache=cache)
            else:
                out = model.apply(params, z.astype(self.dtype), y, pooled, t_in)
            return out, cache

        fn = jax.jit(v_fn, donate_argnums=(5,))
        self._step_fns[key] = fn
        return fn

    def generate(
        self,
        prompt: str,
        negative_prompt: str = "",
        num_inference_steps: int = 100,
        guidance_scale: float = 7.5,
        width: int = 480,
        height: int = 288,
        frames: int = 40,
        seed: int = -1,
        verbose: bool = True,
        return_dict: bool = True,
    ):
        cfg = self._config
        mc = self.model_config
        if seed < 0:
            seed = np.random.randint(0, 2**31 - 1)
        rng = jax.random.key(seed)

        y_pos, pool_pos = self.text_encoder.encode_dual(
            [text_preprocessing(prompt)])
        y_neg, pool_neg = self.text_encoder.encode_dual(
            [text_preprocessing(negative_prompt)])
        y_pos, y_neg = y_pos.astype(self.dtype), y_neg.astype(self.dtype)

        sf = 2 ** (len(self.vae.block_out_channels) - 1)
        h_lat, w_lat = height // sf, width // sf
        rng, zkey = jax.random.split(rng)
        z = jax.random.normal(zkey, (1, frames, mc.in_channels, h_lat, w_lat),
                              jnp.float32)

        timesteps = self.scheduler.set_timesteps(num_inference_steps)
        pab = cfg.pab_config if cfg.enable_pab else None
        plans = build_plans(pab, np.asarray(timesteps, np.float32),
                            mc.num_layers, None)

        cache_u = cache_c = None
        if cfg.enable_pab:
            p = mc.patch_size
            S = (h_lat // p) * (w_lat // p)
            L = y_pos.shape[1]
            m = VchitectXLTransformer(mc, pab_config=pab)
            cache_u = m.init_cache(1, frames, S, L)
            cache_c = m.init_cache(1, frames, S, L)

        mesh_ctx = (par.use_mesh(self.mesh) if self.mesh is not None
                    else jax.default_device(jax.devices()[0]))
        with mesh_ctx:
            tparams = self._exec_put(self.params["transformer"])
            for i, t_i in enumerate(timesteps):
                fn = self._get_v_fn(plans[i])
                v_uncond, cache_u = fn(tparams, z,
                                       float(t_i), y_neg, pool_neg, cache_u)
                v_text, cache_c = fn(tparams, z,
                                     float(t_i), y_pos, pool_pos, cache_c)
                # cosine-dynamic guidance (:943-947)
                gs = 1 + guidance_scale * (
                    (1 - math.cos(math.pi * (
                        (num_inference_steps - float(t_i))
                        / num_inference_steps) ** 5.0)) / 2)
                v = v_uncond + gs * (v_text - v_uncond)
                z = self.scheduler.step(v, i, z)

            # per-frame 2D decode with SD3 scaling/shift (:980-983), jitted
            lat = z / VAE_SCALING + VAE_SHIFT
            lat = jnp.transpose(lat, (0, 1, 3, 4, 2)).reshape(
                (frames, h_lat, w_lat, mc.in_channels))
            from videosys_tpu.utils.jit import jit_method

            tparams = None  # cpu_offload: free transformer HBM
            video = jit_method(self, "_decode_frames")(
                self._exec_put(self.params["vae"]), lat.astype(self.dtype))

        # uint8 on device: transfer 1/4 the bytes over the host link
        video = video.astype(jnp.float32)
        video = (jnp.clip(video / 2 + 0.5, 0, 1) * 255).astype(jnp.uint8)
        video = np.asarray(video)[None]  # [1, F, H, W, C]
        if not return_dict:
            return (video,)
        return VideoSysPipelineOutput(video=video)

    def _decode_frames(self, vae_params, frames):
        return self.vae.apply(vae_params, frames, method="decode")

    def save_video(self, video, output_path: str, fps: int = 8):
        return super().save_video(video, output_path, fps=fps)
