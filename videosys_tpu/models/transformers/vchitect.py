"""Vchitect-XL transformer — MMDiT (SD3-style) joint blocks with fused
spatial + temporal + cross attention.

Behavioral reference:
`videosys/models/transformers/vchitect_transformer_3d.py`
(JointTransformerBlock :49-177, VchitectXLTransformerModel :237-592,
precompute_freqs_cis :341-349) and `videosys/models/modules/attentions.py`
(VchitectAttention :423-638, VchitectAttnProcessor :641-949). Per block and
per frame: joint [video; context] self-attention (spatial), rotary temporal
attention across frames for every joint token, and cross-attention of all
tokens to the frame-0 context; combined as `spatial * 1.1 + cross` then
`+ temporal` after separate output projections (:905-931).

TPU-native notes:
* activations are [B, F, S, C] video tokens + [B, F, L, C] context tokens
  (the reference merges (B F) into the batch dim; per-frame context rows
  appear there implicitly through modulation broadcasting, :128-133);
* DSP: resident frame shard; only the temporal attention flips to a
  token shard and back (dynamic_switch :928-949) — expressed as sharding
  constraints, XLA emits the all-to-alls;
* rotary temporal embedding = complex multiply on interleaved pairs
  (apply_rotary_emb :654-665) == `apply_rope` with theta 1e6;
* PAB (spatial/temporal/cross, pipeline_vchitect.py:32-56) via static step
  plans + explicit cache pytrees;
* blocks scan over the first (depth-1) layers; the context_pre_only final
  layer (:302) is a separate module.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from videosys_tpu.core import parallel as par
from videosys_tpu.core.pab import PABConfig, PABStepPlan
from videosys_tpu.models.modules.embeddings import (
    TimestepEmbedder,
    apply_rope,
    pos_embed_2d,
    rope_freqs,
)
from videosys_tpu.ops.attention import scaled_dot_product_attention

PABCache = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class VchitectModelConfig:
    """Defaults follow VchitectXLTransformerModel (:261-275)."""

    sample_size: int = 128
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 18
    num_heads: int = 18
    head_dim: int = 64
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 96
    rope_theta: float = 1e6
    dtype: Any = jnp.float32

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def depth(self) -> int:
        return self.num_layers


class AdaLayerNormZeroMods(nn.Module):
    """diffusers AdaLayerNormZero: silu -> Dense(6*dim); returns
    (normed * (1+scale) + shift, gate_msa, shift_mlp, scale_mlp, gate_mlp)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        mods = nn.Dense(6 * self.dim, dtype=self.dtype, name="linear")(nn.silu(emb))
        # broadcast over any leading token axes
        mods = mods.reshape(mods.shape[:1] + (1,) * (x.ndim - 2) + (6 * self.dim,))
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(mods, 6, axis=-1)
        nx = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                          dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        return nx * (1 + sc_msa) + sh_msa, g_msa, sh_mlp, sc_mlp, g_mlp


class VchitectJointAttention(nn.Module):
    """VchitectAttention + its processor: three attention paths sharing the
    context projections (attentions.py :667-931)."""

    config: VchitectModelConfig
    bcast_spatial: bool = False
    bcast_temporal: bool = False
    bcast_cross: bool = False
    context_pre_only: bool = False
    cache_dtype: Any = None  # storage dtype for written slots (fp8 support)

    @nn.compact
    def __call__(self, x, enc, freqs, cache):
        cfg = self.config
        B, F, S, C = x.shape
        L = enc.shape[2]
        H, D = cfg.num_heads, cfg.head_dim
        cdt = self.cache_dtype or cfg.dtype
        new_cache: PABCache = {}

        # shared context projections (:836-839)
        enc_q = nn.Dense(C, dtype=cfg.dtype, name="add_q_proj")(enc)
        enc_k = nn.Dense(C, dtype=cfg.dtype, name="add_k_proj")(enc)
        enc_v = nn.Dense(C, dtype=cfg.dtype, name="add_v_proj")(enc)

        def heads(t):
            return t.reshape(t.shape[:-1] + (H, D))

        # ---- temporal attention (:706-766) ------------------------------- #
        if self.bcast_temporal:
            temporal_x = cache["temporal_x"].astype(x.dtype)
            temporal_enc = cache["temporal_enc"].astype(x.dtype)
        else:
            qt = jnp.concatenate(
                [nn.Dense(C, dtype=cfg.dtype, name="to_q_temp")(x), enc_q], axis=2)
            kt = jnp.concatenate(
                [nn.Dense(C, dtype=cfg.dtype, name="to_k_temp")(x), enc_k], axis=2)
            vt = jnp.concatenate(
                [nn.Dense(C, dtype=cfg.dtype, name="to_v_temp")(x), enc_v], axis=2)
            # DSP flip: frame shard -> token shard (dynamic_switch :928-949)
            qt, kt, vt = (par.shard_spatial(a) for a in (qt, kt, vt))
            # [B, F, S+L, H, D] -> [B*(S+L), H, F, D]
            def to_frames(t):
                t = heads(t)
                t = jnp.moveaxis(t, 1, 2)          # [B, S+L, F, H, D]
                return jnp.swapaxes(
                    t.reshape(B * (S + L), F, H, D), 1, 2)
            qf, kf, vf = to_frames(qt), to_frames(kt), to_frames(vt)
            pos = np.arange(F)
            qf = apply_rope(qf, pos, freqs)
            kf = apply_rope(kf, pos, freqs)
            of = scaled_dot_product_attention(qf, kf, vf, scale=D**-0.5)
            of = jnp.swapaxes(of, 1, 2).reshape(B, S + L, F, C)
            of = jnp.moveaxis(of, 2, 1)            # [B, F, S+L, C]
            of = par.shard_temporal(of)            # flip back to frame shard
            temporal_x = nn.Dense(C, dtype=cfg.dtype, name="to_out_temporal")(
                of[:, :, :S])
            temporal_enc = of[:, :, S:]
        if "temporal_x" in cache:
            new_cache["temporal_x"] = temporal_x.astype(cdt)
            new_cache["temporal_enc"] = temporal_enc.astype(cdt)

        # ---- cross attention (:768-808): all tokens -> frame-0 context --- #
        if self.bcast_cross:
            cross = cache["cross"].astype(x.dtype)
        else:
            qc = jnp.concatenate(
                [nn.Dense(C, dtype=cfg.dtype, name="to_q_cross")(x), enc_q], axis=2)
            qc = heads(qc).reshape(B, F * (S + L), H, D)
            kc, vc = heads(enc_k[:, 0]), heads(enc_v[:, 0])  # [B, L, H, D]
            oc = scaled_dot_product_attention(
                jnp.swapaxes(qc, 1, 2), jnp.swapaxes(kc, 1, 2),
                jnp.swapaxes(vc, 1, 2), scale=D**-0.5)
            oc = jnp.swapaxes(oc, 1, 2).reshape(B, F, S + L, C)
            cross = nn.Dense(C, dtype=cfg.dtype, name="to_out_context")(oc)
        if "cross" in cache:
            new_cache["cross"] = cross.astype(cdt)

        # ---- spatial (joint per-frame) attention (:667-704) -------------- #
        if self.bcast_spatial:
            spatial = cache["spatial"].astype(x.dtype)
        else:
            qs = jnp.concatenate(
                [nn.Dense(C, dtype=cfg.dtype, name="to_q")(x), enc_q], axis=2)
            ks = jnp.concatenate(
                [nn.Dense(C, dtype=cfg.dtype, name="to_k")(x), enc_k], axis=2)
            vs = jnp.concatenate(
                [nn.Dense(C, dtype=cfg.dtype, name="to_v")(x), enc_v], axis=2)
            def per_frame(t):
                return jnp.swapaxes(heads(t).reshape(B * F, S + L, H, D), 1, 2)
            os_ = scaled_dot_product_attention(
                per_frame(qs), per_frame(ks), per_frame(vs), scale=D**-0.5)
            spatial = jnp.swapaxes(os_, 1, 2).reshape(B, F, S + L, C)
        if "spatial" in cache:
            new_cache["spatial"] = spatial.astype(cdt)

        # ---- combine (:905-931): spatial * 1.1 + cross, split, project --- #
        joint = spatial * 1.1 + cross
        out_x = nn.Dense(C, dtype=cfg.dtype, name="to_out")(joint[:, :, :S])
        out_enc = joint[:, :, S:]
        if F == 1:
            temporal_x = temporal_x * 0
        out_x = out_x + temporal_x
        if not self.context_pre_only:
            out_enc = nn.Dense(C, dtype=cfg.dtype, name="to_add_out")(out_enc)
        t_enc = nn.Dense(C, dtype=cfg.dtype, name="to_add_out_temporal")(temporal_enc)
        if F == 1:
            t_enc = t_enc * 0
        out_enc = out_enc + t_enc
        return out_x, out_enc, new_cache


class VchitectBlock(nn.Module):
    """JointTransformerBlock (:49-177)."""

    config: VchitectModelConfig
    plan: PABStepPlan = PABStepPlan()
    context_pre_only: bool = False
    cache_dtype: Any = None

    @nn.compact
    def __call__(self, x, enc, temb, freqs, cache):
        cfg = self.config
        C = cfg.hidden_size
        nx, g_msa, sh_mlp, sc_mlp, g_mlp = AdaLayerNormZeroMods(
            C, cfg.dtype, name="norm1")(x, temb)
        if self.context_pre_only:
            # AdaLayerNormContinuous (:73-76)
            mods = nn.Dense(2 * C, dtype=cfg.dtype, name="norm1_context_linear")(
                nn.silu(temb))
            scale, shift = jnp.split(mods[:, None, None], 2, axis=-1)
            nenc = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                                dtype=jnp.float32, name="norm1_context_norm")(
                enc).astype(cfg.dtype) * (1 + scale) + shift
            c_gates = None
        else:
            nenc, c_gmsa, c_shmlp, c_scmlp, c_gmlp = AdaLayerNormZeroMods(
                C, cfg.dtype, name="norm1_context")(enc, temb)
            c_gates = (c_gmsa, c_shmlp, c_scmlp, c_gmlp)

        attn_x, attn_enc, new_cache = VchitectJointAttention(
            cfg, bcast_spatial=self.plan.spatial,
            bcast_temporal=self.plan.temporal, bcast_cross=self.plan.cross,
            context_pre_only=self.context_pre_only,
            cache_dtype=self.cache_dtype, name="attn",
        )(nx, nenc, freqs, cache)

        x = x + g_msa * attn_x
        nx2 = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                           dtype=jnp.float32, name="norm2")(x).astype(cfg.dtype)
        nx2 = nx2 * (1 + sc_mlp) + sh_mlp
        h = nn.Dense(4 * C, dtype=cfg.dtype, name="ff_in")(nx2)
        h = nn.gelu(h, approximate=True)
        x = x + g_mlp * nn.Dense(C, dtype=cfg.dtype, name="ff_out")(h)

        if self.context_pre_only:
            return x, enc, new_cache
        c_gmsa, c_shmlp, c_scmlp, c_gmlp = c_gates
        enc = enc + c_gmsa * attn_enc
        ne = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                          dtype=jnp.float32, name="norm2_context")(enc).astype(cfg.dtype)
        ne = ne * (1 + c_scmlp) + c_shmlp
        h = nn.Dense(4 * C, dtype=cfg.dtype, name="ff_context_in")(ne)
        h = nn.gelu(h, approximate=True)
        enc = enc + c_gmlp * nn.Dense(C, dtype=cfg.dtype, name="ff_context_out")(h)
        return x, enc, new_cache


class VchitectScannedBlock(nn.Module):
    config: VchitectModelConfig
    plan: PABStepPlan = PABStepPlan()
    cache_dtype: Any = None

    @nn.compact
    def __call__(self, carry, scanned, temb, freqs):
        # full [depth, ...] cache slots ride the CARRY and update in place:
        # scan-stacked cache outputs defeat donation (no aliasing) and double
        # the cache HBM (same fix as STDiT3/Latte/CogVideoX)
        x, enc, cache = carry
        (depth_idx,) = scanned
        read = {k: jax.lax.dynamic_index_in_dim(a, depth_idx, 0,
                                                keepdims=False)
                for k, a in cache.items()}
        x, enc, written = VchitectBlock(
            config=self.config, plan=self.plan,
            cache_dtype=self.cache_dtype, name="block",
        )(x, enc, temb, freqs, read)
        new_cache = dict(cache)
        for k, v in written.items():
            new_cache[k] = jax.lax.dynamic_update_index_in_dim(
                cache[k], v, depth_idx, 0)
        return (x, enc, new_cache), ()


class VchitectXLTransformer(nn.Module):
    """Full model (:237-592). __call__(hidden_states [B, F, C, H, W],
    encoder_hidden_states [B, L, joint_dim], pooled [B, pooled_dim],
    timestep [B]) -> [B, F, C_out, H, W]."""

    config: VchitectModelConfig
    plan: PABStepPlan = PABStepPlan()
    pab_config: Optional[PABConfig] = None
    remat: bool = False

    def _cache_dtype(self):
        if self.pab_config is not None and self.pab_config.cache_dtype:
            return getattr(jnp, self.pab_config.cache_dtype)
        return None

    def init_cache(self, B: int, F: int, S: int, L: int) -> Dict[str, jax.Array]:
        cfg = self.config
        if self.pab_config is None:
            return {}
        n = cfg.num_layers - 1  # scanned blocks only; final block runs dense
        C = cfg.hidden_size
        cdt = self._cache_dtype() or cfg.dtype
        cache: Dict[str, jax.Array] = {}
        if self.pab_config.spatial_broadcast:
            cache["spatial"] = jnp.zeros((n, B, F, S + L, C), cdt)
        if self.pab_config.cross_broadcast:
            cache["cross"] = jnp.zeros((n, B, F, S + L, C), cdt)
        if self.pab_config.temporal_broadcast:
            cache["temporal_x"] = jnp.zeros((n, B, F, S, C), cdt)
            cache["temporal_enc"] = jnp.zeros((n, B, F, L, C), cdt)
        return cache

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        encoder_hidden_states: jax.Array,
        pooled_projections: jax.Array,
        timestep: jax.Array,
        pab_cache: Optional[PABCache] = None,
    ):
        cfg = self.config
        B, F, C_in, Hpx, Wpx = hidden_states.shape
        p = cfg.patch_size
        h_p, w_p = Hpx // p, Wpx // p
        S = h_p * w_p
        C = cfg.hidden_size

        # 1. patch embed + center-cropped max-size pos table (SD3 PatchEmbed)
        imgs = jnp.transpose(hidden_states, (0, 1, 3, 4, 2)).astype(cfg.dtype)
        xe = nn.Conv(C, (p, p), strides=(p, p), padding="VALID",
                     dtype=cfg.dtype, name="patch_proj")(
            imgs.reshape(B * F, Hpx, Wpx, C_in))
        xe = xe.reshape(B, F, S, C)
        maxs = cfg.pos_embed_max_size
        pos = pos_embed_2d(C, maxs, maxs, scale=1.0,
                           base_size=cfg.sample_size // p).reshape(maxs, maxs, C)
        top, left = (maxs - h_p) // 2, (maxs - w_p) // 2
        pos = pos[top:top + h_p, left:left + w_p].reshape(S, C)
        xe = xe + jnp.asarray(pos, cfg.dtype)[None, None]

        # 2. combined timestep + pooled-text embedding
        t_emb = TimestepEmbedder(C, freq_embed_size=256, dtype=cfg.dtype,
                                 name="time_embed")(timestep.astype(jnp.float32))
        pe = nn.Dense(C, dtype=cfg.dtype, name="pooled_in")(
            pooled_projections.astype(cfg.dtype))
        pe = nn.Dense(C, dtype=cfg.dtype, name="pooled_out")(nn.silu(pe))
        temb = t_emb + pe

        # 3. context embed, replicated per frame (the reference reaches the
        # same per-frame context rows through broadcasting, :128-133)
        enc = nn.Dense(C, dtype=cfg.dtype, name="context_embedder")(
            encoder_hidden_states.astype(cfg.dtype))
        enc = jnp.repeat(enc[:, None], F, axis=1)  # [B, F, L, C]

        xe = par.shard_temporal(xe)  # resident frame shard (:545-548)
        freqs = rope_freqs(cfg.head_dim, theta=cfg.rope_theta)

        cache = pab_cache if pab_cache is not None else {}
        block_cls = VchitectScannedBlock
        if self.remat:
            block_cls = nn.remat(block_cls, prevent_cse=False)
        Scan = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0, nn.broadcast, nn.broadcast),
            out_axes=0,
            length=cfg.num_layers - 1,
        )
        (xs, enc_s, new_cache), _ = Scan(config=cfg, plan=self.plan,
                                         cache_dtype=self._cache_dtype(),
                                         name="blocks")(
            (xe, enc, cache), (jnp.arange(cfg.num_layers - 1),), temb, freqs)
        # final block: context_pre_only (:302); always dense — its cache is
        # not carried (one block of the 18 forgoing PAB is <6% of the saving)
        xs, _, _ = VchitectBlock(cfg, plan=PABStepPlan(), context_pre_only=True,
                                 name="final_block")(xs, enc_s, temb, freqs, {})

        # 4. output head: AdaLayerNormContinuous + proj (:308-309)
        mods = nn.Dense(2 * C, dtype=cfg.dtype, name="norm_out_linear")(
            nn.silu(temb))
        scale, shift = jnp.split(mods[:, None, None], 2, axis=-1)
        xs = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                          dtype=jnp.float32, name="norm_out")(xs).astype(cfg.dtype)
        xs = xs * (1 + scale) + shift
        xs = nn.Dense(p * p * cfg.out_channels, dtype=cfg.dtype, name="proj_out")(xs)

        # 5. unpatchify (:566-578) -> [B, F, C_out, H, W]
        out = xs.reshape(B, F, h_p, w_p, p, p, cfg.out_channels)
        out = jnp.einsum("bfhwpqc->bfchpwq", out).reshape(
            B, F, cfg.out_channels, h_p * p, w_p * p)
        out = out.astype(jnp.float32)
        if pab_cache is not None:
            return out, new_cache
        return out
