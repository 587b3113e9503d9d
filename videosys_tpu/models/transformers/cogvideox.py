"""CogVideoX transformer — joint text+video token attention with 3D RoPE.

Behavioral reference: `videosys/models/transformers/cogvideox_transformer_3d.py`
(CogVideoXAttnProcessor2_0 :35-175, CogVideoXBlock :179-312,
CogVideoXTransformer3DModel :315-589) and
`videosys/models/modules/normalization.py` (CogVideoXLayerNormZero :36-58,
AdaLayerNorm :61-113), `videosys/models/modules/embeddings.py`
(CogVideoXPatchEmbed :14-51, get_3d_rotary_pos_embed :283-364).

TPU-native notes:
* Ulysses-style SP (head-scatter all_to_all + text-token replication,
  :45-86,112-165) becomes two sharding constraints: video tokens resident
  seq-sharded, q/k/v head-sharded around the joint attention — XLA emits the
  all-to-alls; no PAD/pad-registry bookkeeping is needed;
* latent layout is CogVideoX-native [B, F, C, H, W] (frame-first);
* PAB caches the joint attention outputs per block (:284-295).
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
from videosys_tpu.models.modules.embeddings import TimestepEmbedder, pos_embed_2d
from videosys_tpu.ops.attention import scaled_dot_product_attention

PABCache = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class CogVideoXConfig:
    """CogVideoX-2B defaults (:372-397); 5B uses rotary embeddings, 48 layers,
    head_dim 64 x 48 heads, norm_eps 1e-5."""

    num_layers: int = 30
    num_heads: int = 30
    head_dim: int = 64
    in_channels: int = 16
    out_channels: int = 16
    time_embed_dim: int = 512
    text_embed_dim: int = 4096
    patch_size: int = 2
    max_text_seq_length: int = 226
    sample_width: int = 90
    sample_height: int = 60
    sample_frames: int = 49
    temporal_compression_ratio: int = 4
    spatial_interpolation_scale: float = 1.875
    temporal_interpolation_scale: float = 1.0
    use_rotary_positional_embeddings: bool = False  # False=2B, True=5B
    norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def depth(self) -> int:
        return self.num_layers


def rope_3d(head_dim: int, t: int, h: int, w: int,
            theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """3D rotary frequencies (embeddings.py get_3d_rotary_pos_embed :283-364):
    dim_t = d/4 on frames, dim_h = dim_w = 3d/8 on rows/cols, pairs
    repeat-interleaved. Returns (cos, sin) [t*h*w, head_dim]."""
    dim_t = head_dim // 4
    dim_h = head_dim // 8 * 3
    dim_w = head_dim // 8 * 3

    def axis_freqs(n, dim):
        freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
        ang = np.outer(np.arange(n, dtype=np.float32), freqs)
        return np.repeat(ang, 2, axis=-1)  # interleaved pairs

    f_t = axis_freqs(t, dim_t)[:, None, None, :]
    f_h = axis_freqs(h, dim_h)[None, :, None, :]
    f_w = axis_freqs(w, dim_w)[None, None, :, :]
    freqs = np.concatenate([
        np.broadcast_to(f_t, (t, h, w, dim_t)),
        np.broadcast_to(f_h, (t, h, w, dim_h)),
        np.broadcast_to(f_w, (t, h, w, dim_w)),
    ], axis=-1).reshape(t * h * w, head_dim)
    return np.cos(freqs), np.sin(freqs)


def apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [..., N, D]; rotate interleaved pairs (apply_rotary_emb
    use_real_unbind_dim=-1, embeddings.py:367-406)."""
    from videosys_tpu.models.modules.embeddings import rotate_interleaved_pairs

    return rotate_interleaved_pairs(x, jnp.asarray(cos, jnp.float32),
                                    jnp.asarray(sin, jnp.float32))


def pos_embed_3d(embed_dim: int, t: int, h: int, w: int,
                 spatial_scale: float, temporal_scale: float) -> np.ndarray:
    """3D sincos table (diffusers get_3d_sincos_pos_embed, used at :412-421):
    first 1/4 channels temporal, rest 2D spatial. Returns [t*h*w, D]."""
    d_s = embed_dim * 3 // 4
    d_t = embed_dim // 4
    spatial = pos_embed_2d(d_s, h, w, scale=spatial_scale, base_size=None)  # [h*w, d_s]
    grid_t = np.arange(t, dtype=np.float32) / temporal_scale
    half = d_t // 2
    omega = 1.0 / 10000 ** (np.arange(half, dtype=np.float32) / half)
    ang = np.outer(grid_t, omega)
    temporal = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)  # [t, d_t]
    out = np.concatenate([
        np.broadcast_to(temporal[:, None, :], (t, h * w, d_t)),
        np.broadcast_to(spatial[None], (t, h * w, d_s)),
    ], axis=-1)
    return out.reshape(t * h * w, embed_dim)


class CogVideoXLayerNormZero(nn.Module):
    """normalization.py :36-58: affine LayerNorm + 6-way modulation of
    (video, text) from temb."""

    dim: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, enc, temb):
        mods = nn.Dense(6 * self.dim, dtype=self.dtype, name="linear")(nn.silu(temb))
        shift, scale, gate, e_shift, e_scale, e_gate = jnp.split(mods, 6, axis=-1)
        norm = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32, name="norm")
        x = norm(x).astype(self.dtype) * (1 + scale[:, None]) + shift[:, None]
        enc = norm(enc).astype(self.dtype) * (1 + e_scale[:, None]) + e_shift[:, None]
        return x, enc, gate[:, None], e_gate[:, None]


class CogVideoXJointAttention(nn.Module):
    """Joint [text; video] self-attention with per-head qk LayerNorm and
    video-only RoPE (CogVideoXAttnProcessor2_0 :88-175)."""

    config: CogVideoXConfig

    @nn.compact
    def __call__(self, x, enc, rope: Optional[Tuple[jax.Array, jax.Array]]):
        cfg = self.config
        B, N, C = x.shape
        L = enc.shape[1]
        H, D = cfg.num_heads, cfg.head_dim

        h = jnp.concatenate([enc, x], axis=1)  # [B, L+N, C]
        q = nn.Dense(C, dtype=cfg.dtype, name="to_q")(h).reshape(B, L + N, H, D)
        k = nn.Dense(C, dtype=cfg.dtype, name="to_k")(h).reshape(B, L + N, H, D)
        v = nn.Dense(C, dtype=cfg.dtype, name="to_v")(h).reshape(B, L + N, H, D)

        # qk LayerNorm over head channels, eps 1e-6, affine (:241-242)
        q = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm_q")(q).astype(cfg.dtype)
        k = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm_k")(k).astype(cfg.dtype)

        if rope is not None:
            cos, sin = rope
            q = q.at[:, L:].set(
                apply_rope_interleaved(q[:, L:], cos[:, None], sin[:, None]))
            k = k.at[:, L:].set(
                apply_rope_interleaved(k[:, L:], cos[:, None], sin[:, None]))

        # Ulysses: head-shard for the attention itself (all-to-all in, out)
        q, k, v = (par.ulysses_shard_heads(a) for a in (q, k, v))
        out = scaled_dot_product_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
            scale=D**-0.5)
        out = jnp.swapaxes(out, 1, 2)  # [B, L+N, H, D]
        out = par.ulysses_shard_seq(out)
        out = out.reshape(B, L + N, C)
        out = nn.Dense(C, dtype=cfg.dtype, name="to_out")(out)
        return out[:, L:], out[:, :L]


class CogVideoXBlock(nn.Module):
    """CogVideoXBlock (:179-312)."""

    config: CogVideoXConfig
    bcast_attn: bool = False
    cache_dtype: Any = None  # storage dtype for written slots (fp8 support)

    @nn.compact
    def __call__(self, x, enc, temb, rope, cache):
        cfg = self.config
        cdt = self.cache_dtype or cfg.dtype
        new_cache: PABCache = {}
        nx, nenc, gate, e_gate = CogVideoXLayerNormZero(
            cfg.hidden_size, cfg.norm_eps, cfg.dtype, name="norm1")(x, enc, temb)

        if self.bcast_attn:
            attn_x = cache["attn_x"].astype(x.dtype)
            attn_enc = cache["attn_enc"].astype(x.dtype)
        else:
            attn_x, attn_enc = CogVideoXJointAttention(cfg, name="attn1")(nx, nenc, rope)
        if "attn_x" in cache:
            new_cache["attn_x"] = attn_x.astype(cdt)
            new_cache["attn_enc"] = attn_enc.astype(cdt)

        x = x + gate * attn_x
        enc = enc + e_gate * attn_enc

        nx, nenc, gate_ff, e_gate_ff = CogVideoXLayerNormZero(
            cfg.hidden_size, cfg.norm_eps, cfg.dtype, name="norm2")(x, enc, temb)
        joint = jnp.concatenate([nenc, nx], axis=1)
        hmid = nn.Dense(4 * cfg.hidden_size, dtype=cfg.dtype, name="ff_in")(joint)
        hmid = nn.gelu(hmid, approximate=True)
        ff = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="ff_out")(hmid)
        L = enc.shape[1]
        x = x + gate_ff * ff[:, L:]
        enc = enc + e_gate_ff * ff[:, :L]
        return (x, enc), new_cache


class CogVideoXScannedBlock(nn.Module):
    config: CogVideoXConfig
    plan: PABStepPlan = PABStepPlan()
    cache_dtype: Any = None

    @nn.compact
    def __call__(self, carry, scanned, temb, rope):
        # full [depth, ...] cache slots ride the CARRY and update in place:
        # scan-stacked cache outputs defeat donation (no aliasing) and double
        # the cache HBM (same fix as STDiT3/Latte)
        x, enc, cache = carry
        (depth_idx,) = scanned
        read = {k: jax.lax.dynamic_index_in_dim(a, depth_idx, 0,
                                                keepdims=False)
                for k, a in cache.items()}
        (x, enc), written = CogVideoXBlock(
            config=self.config, bcast_attn=self.plan.spatial,
            cache_dtype=self.cache_dtype, name="block",
        )(x, enc, temb, rope, read)
        new_cache = dict(cache)
        for k, v in written.items():
            new_cache[k] = jax.lax.dynamic_update_index_in_dim(
                cache[k], v, depth_idx, 0)
        return (x, enc, new_cache), ()


class CogVideoXTransformer3D(nn.Module):
    """Full model (:315-589). hidden_states: [B, F, C, H, W] (frame-first,
    CogVideoX latent layout); encoder_hidden_states: [B, L, text_embed_dim]."""

    config: CogVideoXConfig
    plan: PABStepPlan = PABStepPlan()
    pab_config: Optional[PABConfig] = None
    remat: bool = False

    def _cache_dtype(self):
        if self.pab_config is not None and self.pab_config.cache_dtype:
            return getattr(jnp, self.pab_config.cache_dtype)
        return None

    def init_cache(self, B: int, N_video: int, L: int) -> Dict[str, PABCache]:
        cfg = self.config
        if self.pab_config is None or not self.pab_config.spatial_broadcast:
            return {}
        cdt = self._cache_dtype() or cfg.dtype
        return {
            "attn_x": jnp.zeros((cfg.num_layers, B, N_video, cfg.hidden_size), cdt),
            "attn_enc": jnp.zeros((cfg.num_layers, B, L, cfg.hidden_size), cdt),
        }

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,          # [B, F, C, H, W]
        encoder_hidden_states: jax.Array,  # [B, L, text_dim]
        timestep: jax.Array,               # [B]
        pab_cache: Optional[PABCache] = None,
    ):
        cfg = self.config
        B, F, C_in, H, W = hidden_states.shape
        p = cfg.patch_size
        h_p, w_p = H // p, W // p
        N = F * h_p * w_p
        L = encoder_hidden_states.shape[1]

        # 1. time embedding (:506-514): sinusoid(inner_dim) -> MLP(512)
        t_emb = TimestepEmbedder(cfg.time_embed_dim,
                                 freq_embed_size=cfg.hidden_size,
                                 dtype=cfg.dtype, name="time_embedding")(
            timestep.astype(jnp.float32))

        # 2. patch embedding (CogVideoXPatchEmbed :14-51)
        imgs = jnp.transpose(hidden_states, (0, 1, 3, 4, 2)).astype(cfg.dtype)
        imgs = imgs.reshape(B * F, H, W, C_in)
        xe = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), padding="VALID",
                     dtype=cfg.dtype, name="patch_proj")(imgs)
        xe = xe.reshape(B, N, cfg.hidden_size)
        enc = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="text_proj")(
            encoder_hidden_states.astype(cfg.dtype))

        # 3. position embedding (2B: 3D sincos on joint seq, :519-526)
        rope = None
        if cfg.use_rotary_positional_embeddings:
            cos, sin = rope_3d(cfg.head_dim, F, h_p, w_p)
            rope = (jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32))
        else:
            pos = pos_embed_3d(cfg.hidden_size, F, h_p, w_p,
                               cfg.spatial_interpolation_scale,
                               cfg.temporal_interpolation_scale)
            xe = xe + jnp.asarray(pos, cfg.dtype)[None]
            # text positions use the zero-initialized table rows (:420-421)

        xe = par.shard_tokens(xe)  # resident: video tokens seq-sharded (:531-533)

        cache = pab_cache if pab_cache is not None else {}
        pair_cls = CogVideoXScannedBlock
        if self.remat:
            pair_cls = nn.remat(pair_cls, prevent_cse=False)
        Scan = nn.scan(
            pair_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0, nn.broadcast, nn.broadcast),
            out_axes=0,
            length=cfg.num_layers,
        )
        (xs, enc_s, new_cache), _ = Scan(
            config=cfg, plan=self.plan,
            cache_dtype=self._cache_dtype(), name="blocks",
        )((xe, enc, cache), (jnp.arange(cfg.num_layers),), t_emb, rope)

        # 5. final norm + AdaLayerNorm out (:566-577)
        if cfg.use_rotary_positional_embeddings:  # 5B
            joint = jnp.concatenate([enc_s, xs], axis=1)
            joint = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=jnp.float32,
                                 name="norm_final")(joint).astype(cfg.dtype)
            xs = joint[:, L:]
        else:  # 2B
            xs = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=jnp.float32,
                              name="norm_final")(xs).astype(cfg.dtype)

        mods = nn.Dense(2 * cfg.hidden_size, dtype=cfg.dtype,
                        name="norm_out_linear")(nn.silu(t_emb))
        shift, scale = jnp.split(mods, 2, axis=-1)
        xs = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=jnp.float32,
                          name="norm_out_norm")(xs).astype(cfg.dtype)
        xs = xs * (1 + scale[:, None]) + shift[:, None]
        xs = nn.Dense(p * p * cfg.out_channels, dtype=cfg.dtype, name="proj_out")(xs)

        # 6. unpatchify (:579-582) -> [B, F, C_out, H, W]
        out = xs.reshape(B, F, h_p, w_p, cfg.out_channels, p, p)
        out = jnp.transpose(out, (0, 1, 4, 2, 5, 3, 6)).reshape(
            B, F, cfg.out_channels, h_p * p, w_p * p)
        out = out.astype(jnp.float32)
        if pab_cache is not None:
            return out, new_cache
        return out
