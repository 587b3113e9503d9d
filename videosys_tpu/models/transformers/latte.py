"""LatteT2V — alternating spatial/temporal DiT (PixArt-style adaLN-single).

Behavioral reference: `videosys/models/transformers/latte_transformer_3d.py`
(BasicTransformerBlock :150-518 spatial, BasicTransformerBlock_ :521-843
temporal, AdaLayerNormSingle :846-878, LatteT2V :895-1482). TPU-native
re-design mirrors stdit3.py: [B, T, S, C] channel-last activations, nn.scan
over depth pairs, PAB cache pytrees with static per-step plans.

DSP note: Latte's resident sharding is on the FRAME axis (the model shards
`(b f)` rows via split_from_second_dim :1474-1478), the opposite of STDiT3 —
spatial attention and cross attention are frame-local, and only temporal
attention pays the all-to-all flip (dynamic_switch :826-843). Expressed here
as shard_temporal (resident) / shard_spatial (around temporal attention).
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
from videosys_tpu.models.modules.blocks import MultiHeadCrossAttention, SelfAttention
from videosys_tpu.models.modules.embeddings import (
    Mlp,
    TimestepEmbedder,
    apply_rope_multiaxis,
    pos_embed_2d,
    rope_axis_tables,
    timestep_embedding,
)
from videosys_tpu.models.modules.normalization import layer_norm

PABCache = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class LatteConfig:
    """Latte-1: 28 layers, 16 heads x 72, patch 2, T5-XXL captions, 16 frames
    at 512x512 (LatteT2V defaults :926-953 + checkpoint config)."""

    num_layers: int = 28
    num_heads: int = 16
    head_dim: int = 72
    in_channels: int = 4
    patch_size: int = 2
    caption_channels: int = 4096
    video_length: int = 16
    sample_size: int = 64
    norm_eps: float = 1e-5
    learned_sigma: bool = True
    use_rope: bool = False   # OSP v1.1 RoPE2D/1D variant (v110 :2256-2262)
    # maxin-cn/Latte-1 checkpoint value (PixArt lineage); the reference
    # class default is "geglu" but from_pretrained overrides it
    activation_fn: str = "gelu-approximate"
    dtype: Any = jnp.float32

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learned_sigma else self.in_channels

    # scan interface parity with STDiT3Config
    @property
    def depth(self) -> int:
        return self.num_layers


class GEGLUFeedForward(nn.Module):
    """diffusers FeedForward (latte :92-147). activation:
    * "geglu": proj C->2*4C, hidden * gelu(gate) [exact gelu]
    * "gelu-approximate": proj C->4C, gelu-tanh (the Latte-1 checkpoint)
    then 4C->C."""

    dim: int
    mult: int = 4
    activation: str = "gelu-approximate"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        if self.activation == "geglu":
            hg = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
            hidden, gate = jnp.split(hg, 2, axis=-1)
            h = hidden * nn.gelu(gate, approximate=False)
        elif self.activation == "gelu-approximate":
            h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
            h = nn.gelu(h, approximate=True)
        else:
            raise ValueError(self.activation)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


def _mods6(table, t_6c, B, dtype):
    mods = (table[None] + t_6c.reshape(B, 6, -1).astype(jnp.float32)).astype(dtype)
    mods = mods[:, :, None, None, :]
    return tuple(mods[:, i] for i in range(6))


class LatteSpatialBlock(nn.Module):
    """BasicTransformerBlock (:150-518): self-attn over patches per frame,
    cross-attn to text (no pre-norm under adaLN-single), GEGLU FF."""

    config: LatteConfig
    bcast_attn: bool = False
    bcast_cross: bool = False
    mlp_cached: bool = False
    rope: Any = None  # callable [B,H,N,D] -> rotated (RoPE2D, v110 :136-186)
    cache_dtype: Any = None  # storage dtype for written slots (fp8 support)

    @nn.compact
    def __call__(self, x, y, t_6c, kv_mask, cache, mlp_save, mlp_use):
        cfg = self.config
        B, T, S, C = x.shape
        cdt = self.cache_dtype or cfg.dtype
        new_cache: PABCache = {}
        table = self.param(
            "scale_shift_table",
            lambda key, shape: jax.random.normal(key, shape) / C**0.5, (6, C))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = _mods6(table, t_6c, B, x.dtype)

        if self.bcast_attn:
            attn_out = cache["attn"].astype(x.dtype)
        else:
            h = layer_norm(x, cfg.norm_eps) * (1 + scale_msa) + shift_msa
            # pin the resident frame shard on the 4D tensor before merging
            # rows: gives GSPMD a staging point so the norm/modulate stats
            # complete under T-sharding instead of hitting the involuntary
            # replication fallback (same fix as stdit3's temporal branch)
            h = par.shard_temporal(h)
            hr = h.reshape(B * T, S, C)
            hr = par.shard_merged_rows(hr)
            attn_out = SelfAttention(
                dim=C, num_heads=cfg.num_heads, qk_norm=False,
                dtype=cfg.dtype, rope=self.rope, name="attn1",
            )(hr).reshape(B, T, S, C)
            attn_out = gate_msa * attn_out
        if "attn" in cache:
            new_cache["attn"] = attn_out.astype(cdt)
        x = x + attn_out

        if self.bcast_cross:
            cross_out = cache["cross"].astype(x.dtype)
        else:
            # adaLN-single: no norm before cross attention (:446-449)
            xq = par.shard_cross_rows(x.reshape(B * T, S, C))
            cross_out = MultiHeadCrossAttention(
                dim=C, num_heads=cfg.num_heads, dtype=cfg.dtype, name="attn2",
            )(xq, y, kv_mask).reshape(B, T, S, C)
        if "cross" in cache:
            new_cache["cross"] = cross_out.astype(cdt)
        x = x + cross_out

        h = layer_norm(x, cfg.norm_eps) * (1 + scale_mlp) + shift_mlp
        ff = GEGLUFeedForward(dim=C, activation=cfg.activation_fn, dtype=cfg.dtype, name="ff")(h)
        ff = gate_mlp * ff
        if self.mlp_cached:
            ff = jnp.where(mlp_use, cache["mlp"].astype(x.dtype), ff)
            new_cache["mlp"] = jnp.where(
                mlp_save, ff.astype(cdt), cache["mlp"])
        x = x + ff
        return x, new_cache


class LatteTemporalBlock(nn.Module):
    """BasicTransformerBlock_ (:521-843): temporal self-attn only + FF."""

    config: LatteConfig
    bcast_attn: bool = False
    mlp_cached: bool = False
    rope: Any = None  # RoPE1D over frames (v110 :199-243)
    cache_dtype: Any = None

    @nn.compact
    def __call__(self, x, t_6c, cache, mlp_save, mlp_use):
        cfg = self.config
        B, T, S, C = x.shape
        cdt = self.cache_dtype or cfg.dtype
        new_cache: PABCache = {}
        table = self.param(
            "scale_shift_table",
            lambda key, shape: jax.random.normal(key, shape) / C**0.5, (6, C))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = _mods6(table, t_6c, B, x.dtype)

        if self.bcast_attn:
            attn_out = cache["attn"].astype(x.dtype)
        else:
            h = layer_norm(x, cfg.norm_eps) * (1 + scale_msa) + shift_msa
            # DSP flip: resident frame shard -> spatial shard (:735-745)
            h = par.shard_spatial(h)
            hr = jnp.swapaxes(h, 1, 2).reshape(B * S, T, C)
            hr = par.shard_merged_rows(hr)
            a = SelfAttention(
                dim=C, num_heads=cfg.num_heads, qk_norm=False,
                dtype=cfg.dtype, rope=self.rope, name="attn1",
            )(hr)
            a = jnp.swapaxes(a.reshape(B, S, T, C), 1, 2)
            attn_out = par.shard_temporal(a)  # flip back to frame shard
            attn_out = gate_msa * attn_out
        if "attn" in cache:
            new_cache["attn"] = attn_out.astype(cdt)
        x = x + attn_out

        h = layer_norm(x, cfg.norm_eps) * (1 + scale_mlp) + shift_mlp
        ff = GEGLUFeedForward(dim=C, activation=cfg.activation_fn, dtype=cfg.dtype, name="ff")(h)
        ff = gate_mlp * ff
        if self.mlp_cached:
            ff = jnp.where(mlp_use, cache["mlp"].astype(x.dtype), ff)
            new_cache["mlp"] = jnp.where(
                mlp_save, ff.astype(cdt), cache["mlp"])
        x = x + ff
        return x, new_cache


class LatteDepthPair(nn.Module):
    config: LatteConfig
    plan: PABStepPlan = PABStepPlan()
    cache_keys_spatial: Tuple[str, ...] = ()
    cache_keys_temporal: Tuple[str, ...] = ()
    first_pair_temp_pos: bool = False  # handled by caller via scanned flag
    rope_spatial: Any = None
    rope_temporal: Any = None
    cache_dtype: Any = None

    @nn.compact
    def __call__(self, carry, scanned, y, t_6c, kv_mask, temp_pos):
        # The full [depth, ...] cache slots ride the scan CARRY and update
        # in place via dynamic_update_index_in_dim — scan-STACKED cache
        # outputs defeat buffer donation (the stacked array can't alias the
        # donated input), which doubled the multi-GiB cache at Latte's
        # 512x512 default and OOM'd a 16 GiB v5e. Same design as STDiT3's
        # write_carries.
        x, caches = carry
        depth_idx, mlp_flags, is_first = scanned
        plan = self.plan

        def read_slots(branch):
            return {k: jax.lax.dynamic_index_in_dim(a, depth_idx, 0,
                                                    keepdims=False)
                    for k, a in caches.get(branch, {}).items()}

        new_caches = {b: dict(slots) for b, slots in caches.items()}

        def write_slots(branch, written):
            for k, v in written.items():
                new_caches[branch][k] = jax.lax.dynamic_update_index_in_dim(
                    caches[branch][k], v, depth_idx, 0)

        x, nc_s = LatteSpatialBlock(
            config=self.config, bcast_attn=plan.spatial, bcast_cross=plan.cross,
            mlp_cached="mlp" in self.cache_keys_spatial,
            rope=self.rope_spatial, cache_dtype=self.cache_dtype,
            name="spatial",
        )(x, y, t_6c, kv_mask, read_slots("spatial"),
          mlp_flags.get("spatial_save", False), mlp_flags.get("spatial_use", False))
        if nc_s:
            write_slots("spatial", nc_s)
        if x.shape[1] > 1 and temp_pos is not None:
            # temporal pos embed added before the FIRST temporal block only
            # (latte :1410-1411)
            x = x + jnp.where(is_first, 1.0, 0.0) * temp_pos
        x, nc_t = LatteTemporalBlock(
            config=self.config, bcast_attn=plan.temporal,
            mlp_cached="mlp" in self.cache_keys_temporal,
            rope=self.rope_temporal, cache_dtype=self.cache_dtype,
            name="temporal",
        )(x, t_6c, read_slots("temporal"),
          mlp_flags.get("temporal_save", False), mlp_flags.get("temporal_use", False))
        if nc_t:
            write_slots("temporal", nc_t)
        return (x, new_caches), ()


class LatteT2V(nn.Module):
    """Full Latte model (:895-1482). x: [B, C, T, H, W] -> [B, C_out, T, H, W]."""

    config: LatteConfig
    plan: PABStepPlan = PABStepPlan()
    pab_config: Optional[PABConfig] = None
    remat: bool = False

    def cache_keys(self, temporal: bool) -> Tuple[str, ...]:
        pc = self.pab_config
        if pc is None or not pc.enabled:
            return ()
        keys = []
        if temporal and pc.temporal_broadcast:
            keys.append("attn")
        if not temporal and pc.spatial_broadcast:
            keys.append("attn")
        if not temporal and pc.cross_broadcast:
            keys.append("cross")
        if pc.mlp_broadcast:
            keys.append("mlp")
        return tuple(keys)

    def _cache_dtype(self):
        if self.pab_config is not None and self.pab_config.cache_dtype:
            return getattr(jnp, self.pab_config.cache_dtype)
        return None

    def init_cache(self, B: int, T: int, S: int) -> Dict[str, PABCache]:
        cfg = self.config
        cdt = self._cache_dtype() or cfg.dtype
        shape = (cfg.num_layers, B, T, S, cfg.hidden_size)
        caches: Dict[str, PABCache] = {}
        for branch, temporal in (("spatial", False), ("temporal", True)):
            keys = self.cache_keys(temporal)
            if keys:
                caches[branch] = {k: jnp.zeros(shape, cdt) for k in keys}
        return caches

    def _mlp_flag_arrays(self) -> Dict[str, jax.Array]:
        plan, depth = self.plan, self.config.num_layers
        flags = {}
        if self.pab_config is not None and self.pab_config.mlp_broadcast:
            def arr(t):
                return jnp.asarray(t if t else (False,) * depth)
            flags["spatial_save"] = arr(plan.mlp_spatial_save)
            flags["spatial_use"] = arr(plan.mlp_spatial_use)
            flags["temporal_save"] = arr(plan.mlp_temporal_save)
            flags["temporal_use"] = arr(plan.mlp_temporal_use)
        return flags

    @nn.compact
    def __call__(
        self,
        x: jax.Array,               # [B, C, T, H, W]
        timestep: jax.Array,        # [B]
        y: jax.Array,               # [B, L, caption_channels]
        kv_mask: Optional[jax.Array] = None,
        pab_cache: Optional[Dict[str, PABCache]] = None,
    ):
        cfg = self.config
        B, _, T, H, W = x.shape
        p = cfg.patch_size
        h_p, w_p = H // p, W // p
        S = h_p * w_p

        # --- patch embed + 2D sincos pos (diffusers PatchEmbed; :1028-1039) --- #
        xe = jnp.transpose(x, (0, 2, 3, 4, 1)).astype(cfg.dtype)
        xe = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), padding="VALID",
                     dtype=cfg.dtype, name="pos_embed_proj")(
            xe.reshape(B * T, H, W, x.shape[1]))
        xe = xe.reshape(B, T, S, cfg.hidden_size)
        base = cfg.sample_size // p if cfg.sample_size else h_p
        pos = pos_embed_2d(cfg.hidden_size, h_p, w_p, scale=1.0, base_size=base)
        xe = xe + jnp.asarray(pos, cfg.dtype)[None, None]

        # --- adaLN-single timestep embedding (:846-878) -------------------- #
        t_emb = TimestepEmbedder(cfg.hidden_size, dtype=cfg.dtype,
                                 name="adaln_single_emb")(timestep.astype(cfg.dtype))
        t_6c = nn.Dense(6 * cfg.hidden_size, dtype=cfg.dtype,
                        name="adaln_single_linear")(nn.silu(t_emb))

        # --- caption projection (PixArtAlphaTextProjection; :1117-1119) ---- #
        y = Mlp(cfg.hidden_size, cfg.hidden_size, dtype=cfg.dtype,
                name="caption_projection")(y.astype(cfg.dtype))

        # --- temporal sincos pos embed (:1026-1029,1470-1472) -------------- #
        temp_pos = None
        if T > 1:
            pos_t = np.arange(T, dtype=np.float32)
            half = cfg.hidden_size // 2
            omega = 1.0 / 10000 ** (np.arange(half, dtype=np.float32) / half)
            ang = np.outer(pos_t, omega)
            tp = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
            temp_pos = jnp.asarray(tp, cfg.dtype)[None, :, None, :]  # [1,T,1,C]

        xe = par.shard_temporal(xe)  # resident: frame shard (:1474-1478)

        caches = pab_cache if pab_cache is not None else {}
        mlp_flags = self._mlp_flag_arrays()
        is_first = jnp.zeros((cfg.num_layers,), jnp.float32).at[0].set(1.0)
        depth_ids = jnp.arange(cfg.num_layers)
        scanned = (depth_ids, mlp_flags, is_first)

        pair_cls = LatteDepthPair
        if self.remat:
            pair_cls = nn.remat(pair_cls, prevent_cse=False)
        ScanPairs = nn.scan(
            pair_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0,) + (nn.broadcast,) * 4,
            out_axes=0,
            length=cfg.num_layers,
        )
        rope_s = rope_t = None
        if cfg.use_rope:
            # RoPE2D on spatial attention: head_dim halves over (y, x)
            # (v110 make_position :2381-2384, AttnProcessor :1125-1268);
            # linear scaling divides positions by the interpolation scale.
            scale_2d = max((cfg.sample_size // 64) if cfg.sample_size else 1, 1)
            vl = cfg.video_length
            scale_1d = max(((vl - 1) // 16) if vl % 2 == 1 else vl // 16, 1)
            D = cfg.head_dim
            cy, sy = rope_axis_tables(D // 2, h_p, float(scale_2d))
            cx, sx = rope_axis_tables(D // 2, w_p, float(scale_2d))
            cos2 = np.concatenate([
                np.broadcast_to(cy[:, None], (h_p, w_p, D // 2)),
                np.broadcast_to(cx[None, :], (h_p, w_p, D // 2)),
            ], axis=-1).reshape(S, D)
            sin2 = np.concatenate([
                np.broadcast_to(sy[:, None], (h_p, w_p, D // 2)),
                np.broadcast_to(sx[None, :], (h_p, w_p, D // 2)),
            ], axis=-1).reshape(S, D)
            ct, st = rope_axis_tables(D, T, float(scale_1d))
            rope_s = lambda q: apply_rope_multiaxis(
                q, cos2[None, None], sin2[None, None], 2)
            rope_t = lambda q: apply_rope_multiaxis(
                q, ct[None, None], st[None, None], 1)

        (xs, new_caches), _ = ScanPairs(
            config=cfg, plan=self.plan,
            cache_keys_spatial=self.cache_keys(False),
            cache_keys_temporal=self.cache_keys(True),
            rope_spatial=rope_s, rope_temporal=rope_t,
            cache_dtype=self._cache_dtype(),
            name="blocks",
        )((xe, caches), scanned, y, t_6c, kv_mask, temp_pos)

        # --- final layer (:1439-1446) --------------------------------------- #
        table = self.param(
            "final_scale_shift_table",
            lambda key, shape: jax.random.normal(key, shape) / cfg.hidden_size**0.5,
            (2, cfg.hidden_size))
        mods = (table[None] + t_emb[:, None].astype(jnp.float32)).astype(cfg.dtype)
        shift, scale = mods[:, 0, None, None, :], mods[:, 1, None, None, :]
        xo = layer_norm(xs, 1e-6) * (1 + scale) + shift
        xo = nn.Dense(p * p * cfg.out_channels, dtype=cfg.dtype, name="proj_out")(xo)

        # --- unpatchify (:1449-1458) ---------------------------------------- #
        xo = xo.reshape(B, T, h_p, w_p, p, p, cfg.out_channels)
        xo = jnp.einsum("bthwpqc->bcthpwq", xo).reshape(
            B, cfg.out_channels, T, h_p * p, w_p * p)
        out = xo.astype(jnp.float32)
        if pab_cache is not None:
            return out, new_caches
        return out
