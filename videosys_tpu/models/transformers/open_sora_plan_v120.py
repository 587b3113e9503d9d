"""Open-Sora-Plan v1.2 transformer (OpenSoraT2V) — PixArt-style DiT with 3D RoPE.

Behavioral reference:
`videosys/models/transformers/open_sora_plan_v120_transformer_3d.py`
(RoPE3D :63-119, PatchEmbed2D :245-370, AttnProcessor2_0 :837-962,
BasicTransformerBlock :1092-1456, OpenSoraT2V :1464-2123). Single-stream
PixArt `ada_norm_single` architecture: shared AdaLayerNormSingle timestep
embedding, per-block `scale_shift_table`, self-attention with 3D RoPE
(head_dim split in thirds over t/h/w), cross-attention to mT5, approximate-
GELU FFN; 2D conv patch embed with optional 2D+1D sincos absolute positions.

TPU-native notes:
* tokens live as one [B, N=T*H*W, C] stream; the reference's Ulysses SP
  (head-scatter all_to_all around self-attention, :928-949) becomes two
  sharding constraints (`par.shard_tokens` resident, `par.ulysses_shard_heads`
  inside attention) — XLA emits the all-to-alls over the sp ICI axis;
* RoPE cos/sin tables are host-precomputed numpy (static shapes);
* PAB (spatial+cross, pipeline_open_sora_plan.py:103-121) gates via the
  static `PABStepPlan`, caches carried as explicit pytrees;
* blocks are stacked with `nn.scan` (single compiled block, XL depth 32).
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
    apply_rope_multiaxis,
    rope_axis_tables,
)
from videosys_tpu.ops.attention import scaled_dot_product_attention

PABCache = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class OpenSoraPlanV120Config:
    """Defaults follow the released 93-frame checkpoints
    (LanguageBind/Open-Sora-Plan-v1.2.0: 32 layers, 24 heads x 96,
    use_rope=True, mT5-xxl captions)."""

    num_layers: int = 32
    num_heads: int = 24
    head_dim: int = 96
    in_channels: int = 4
    out_channels: int = 4
    caption_channels: int = 4096
    patch_size: int = 2
    patch_size_t: int = 1
    sample_size: Tuple[int, int] = (60, 80)   # latent (h, w) the ckpt was trained at
    sample_size_t: int = 24                   # latent frames
    use_rope: bool = True
    activation_fn: str = "gelu-approximate"  # checkpoint config value
    norm_eps: float = 1e-6
    interpolation_scale_t: Optional[float] = None
    interpolation_scale_h: Optional[float] = None
    interpolation_scale_w: Optional[float] = None
    dtype: Any = jnp.float32

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def depth(self) -> int:
        return self.num_layers

    def interpolation_thw(self) -> Tuple[float, float, float]:
        """(:1600-1617): t-scale from sample_size_t/16 (odd: (t-1)//16+1);
        h,w scales from sample_size/30 and /40."""
        t = self.sample_size_t
        it = ((t - 1) // 16 + 1) if t % 2 == 1 else t / 16
        it = self.interpolation_scale_t if self.interpolation_scale_t is not None else it
        ih = (self.interpolation_scale_h if self.interpolation_scale_h is not None
              else self.sample_size[0] / 30)
        iw = (self.interpolation_scale_w if self.interpolation_scale_w is not None
              else self.sample_size[1] / 40)
        return (float(it), float(ih), float(iw))


# --------------------------------------------------------------------------- #
# 3D RoPE (reference RoPE3D :63-119): head_dim split in thirds over (t, h, w);
# each third rotated 1D with [freqs, freqs] duplicated halves (rotate_half).
# --------------------------------------------------------------------------- #
def rope_3d_tables(head_dim: int, t: int, h: int, w: int,
                   scales: Tuple[float, float, float]) -> Tuple[np.ndarray, np.ndarray]:
    """Per-token (cos, sin), each [t*h*w, head_dim], thirds = (t, y, x)."""
    assert head_dim % 3 == 0, "RoPE3D needs head_dim divisible by 3"
    D = head_dim // 3
    cos_t, sin_t = rope_axis_tables(D, t, scales[0])
    cos_y, sin_y = rope_axis_tables(D, h, scales[1])
    cos_x, sin_x = rope_axis_tables(D, w, scales[2])

    def expand(tab_t, tab_y, tab_x):
        a = np.broadcast_to(tab_t[:, None, None, :], (t, h, w, D))
        b = np.broadcast_to(tab_y[None, :, None, :], (t, h, w, D))
        c = np.broadcast_to(tab_x[None, None, :, :], (t, h, w, D))
        return np.concatenate([a, b, c], axis=-1).reshape(t * h * w, head_dim)

    return expand(cos_t, cos_y, cos_x), expand(sin_t, sin_y, sin_x)


def pos_embed_1d(dim: int, length: int, scale: float = 1.0) -> np.ndarray:
    """1D sincos table (get_1d_sincos_pos_embed :202-241), [length, dim]."""
    pos = np.arange(length, dtype=np.float32) / scale
    omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
    omega = 1.0 / 10000**omega
    ang = np.outer(pos, omega)
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)


# --------------------------------------------------------------------------- #
class AdaLayerNormSingle(nn.Module):
    """PixArt-Alpha shared adaLN (:1702-1709 via diffusers AdaLayerNormSingle):
    sinusoidal(256) -> MLP(dim) -> silu -> Dense(6*dim).
    Returns (mods [B, 6*dim], embedded [B, dim])."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, timestep: jax.Array):
        emb = TimestepEmbedder(self.dim, freq_embed_size=256, dtype=self.dtype,
                               name="emb")(timestep.astype(jnp.float32))
        mods = nn.Dense(6 * self.dim, dtype=self.dtype, name="linear")(nn.silu(emb))
        return mods, emb


class V120SelfAttention(nn.Module):
    """attn1 with 3D RoPE + Ulysses sharding (AttnProcessor2_0 :855-962)."""

    config: OpenSoraPlanV120Config

    @nn.compact
    def __call__(self, x, rope: Optional[Tuple[jax.Array, jax.Array]]):
        cfg = self.config
        B, N, C = x.shape
        H, D = cfg.num_heads, cfg.head_dim
        q = nn.Dense(C, dtype=cfg.dtype, name="to_q")(x).reshape(B, N, H, D)
        k = nn.Dense(C, dtype=cfg.dtype, name="to_k")(x).reshape(B, N, H, D)
        v = nn.Dense(C, dtype=cfg.dtype, name="to_v")(x).reshape(B, N, H, D)
        # Ulysses: scatter heads / gather sequence for the attention itself
        q, k, v = (par.ulysses_shard_heads(a) for a in (q, k, v))
        q = jnp.swapaxes(q, 1, 2)  # [B, H, N, D]
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        if rope is not None:
            cos, sin = rope  # [N, D]
            q = apply_rope_multiaxis(q, cos[None, None], sin[None, None], 3)
            k = apply_rope_multiaxis(k, cos[None, None], sin[None, None], 3)
        out = scaled_dot_product_attention(q, k, v, scale=D**-0.5)
        out = jnp.swapaxes(out, 1, 2)
        out = par.ulysses_shard_seq(out).reshape(B, N, C)
        return nn.Dense(C, dtype=cfg.dtype, name="to_out")(out)


class V120CrossAttention(nn.Module):
    """attn2: queries from video tokens, kv from mT5 captions; no RoPE."""

    config: OpenSoraPlanV120Config

    @nn.compact
    def __call__(self, x, enc, kv_mask: Optional[jax.Array]):
        cfg = self.config
        B, N, C = x.shape
        L = enc.shape[1]
        H, D = cfg.num_heads, cfg.head_dim
        q = nn.Dense(C, dtype=cfg.dtype, name="to_q")(x).reshape(B, N, H, D)
        k = nn.Dense(C, dtype=cfg.dtype, name="to_k")(enc).reshape(B, L, H, D)
        v = nn.Dense(C, dtype=cfg.dtype, name="to_v")(enc).reshape(B, L, H, D)
        out = scaled_dot_product_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
            scale=D**-0.5, kv_mask=kv_mask)
        out = jnp.swapaxes(out, 1, 2).reshape(B, N, C)
        return nn.Dense(C, dtype=cfg.dtype, name="to_out")(out)


class V120Block(nn.Module):
    """BasicTransformerBlock, ada_norm_single path (:1322-1456)."""

    config: OpenSoraPlanV120Config
    bcast_spatial: bool = False
    bcast_cross: bool = False
    cache_dtype: Any = None  # storage dtype for written slots (fp8 support)

    @nn.compact
    def __call__(self, x, enc, mods, kv_mask, rope, cache):
        cfg = self.config
        C = cfg.hidden_size
        cdt = self.cache_dtype or cfg.dtype
        new_cache: PABCache = {}
        table = self.param(
            "scale_shift_table",
            nn.initializers.normal(stddev=C**-0.5), (6, C), jnp.float32)
        B = x.shape[0]
        m = table[None].astype(cfg.dtype) + mods.reshape(B, 6, C)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            m[:, i][:, None] for i in range(6))  # each [B, 1, C]

        # 1. self-attention (PAB spatial gate :1353-1380)
        if self.bcast_spatial:
            attn = cache["spatial"].astype(x.dtype)
        else:
            nx = nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False, use_scale=False,
                              dtype=jnp.float32, name="norm1")(x).astype(cfg.dtype)
            nx = nx * (1 + scale_msa) + shift_msa
            attn = V120SelfAttention(cfg, name="attn1")(nx, rope)
        if "spatial" in cache:
            new_cache["spatial"] = attn.astype(cdt)
        x = x + gate_msa * attn

        # 2. cross-attention; ada_norm_single applies no norm here (:1402-1406)
        if self.bcast_cross:
            attn = cache["cross"].astype(x.dtype)
        else:
            attn = V120CrossAttention(cfg, name="attn2")(x, enc, kv_mask)
        if "cross" in cache:
            new_cache["cross"] = attn.astype(cdt)
        x = x + attn

        # 3. FFN: norm2 + mlp modulation (:1430-1436); activation follows the
        # checkpoint config (diffusers FeedForward semantics)
        nx = nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False, use_scale=False,
                          dtype=jnp.float32, name="norm2")(x).astype(cfg.dtype)
        nx = nx * (1 + scale_mlp) + shift_mlp
        if cfg.activation_fn == "geglu":
            hg = nn.Dense(8 * C, dtype=cfg.dtype, name="ff_in")(nx)
            hidden, gate = jnp.split(hg, 2, axis=-1)
            h = hidden * nn.gelu(gate, approximate=False)
        else:  # gelu-approximate
            h = nn.Dense(4 * C, dtype=cfg.dtype, name="ff_in")(nx)
            h = nn.gelu(h, approximate=True)
        ff = nn.Dense(C, dtype=cfg.dtype, name="ff_out")(h)
        x = x + gate_mlp * ff
        return x, new_cache


class V120ScannedBlock(nn.Module):
    config: OpenSoraPlanV120Config
    plan: PABStepPlan = PABStepPlan()
    cache_dtype: Any = None

    @nn.compact
    def __call__(self, carry, scanned, enc, mods, kv_mask, rope):
        # full [depth, ...] cache slots ride the CARRY and update in place:
        # scan-stacked cache outputs defeat donation (no aliasing) and double
        # the cache HBM (same fix as STDiT3/Latte/CogVideoX)
        x, cache = carry
        (depth_idx,) = scanned
        read = {k: jax.lax.dynamic_index_in_dim(a, depth_idx, 0,
                                                keepdims=False)
                for k, a in cache.items()}
        x, written = V120Block(
            config=self.config, bcast_spatial=self.plan.spatial,
            bcast_cross=self.plan.cross, cache_dtype=self.cache_dtype,
            name="block",
        )(x, enc, mods, kv_mask, rope, read)
        new_cache = dict(cache)
        for k, v in written.items():
            new_cache[k] = jax.lax.dynamic_update_index_in_dim(
                cache[k], v, depth_idx, 0)
        return (x, new_cache), ()


class OpenSoraPlanV120Transformer(nn.Module):
    """Full OpenSoraT2V (:1464-2123).

    __call__(hidden_states [B, C, T, H, W], encoder_hidden_states
    [B, L, caption_channels], timestep [B]) -> [B, C_out, T, H, W]."""

    config: OpenSoraPlanV120Config
    plan: PABStepPlan = PABStepPlan()
    pab_config: Optional[PABConfig] = None
    remat: bool = False

    def _cache_dtype(self):
        if self.pab_config is not None and self.pab_config.cache_dtype:
            return getattr(jnp, self.pab_config.cache_dtype)
        return None

    def init_cache(self, B: int, N: int) -> Dict[str, jax.Array]:
        cfg = self.config
        if self.pab_config is None:
            return {}
        cdt = self._cache_dtype() or cfg.dtype
        cache: Dict[str, jax.Array] = {}
        if self.pab_config.spatial_broadcast:
            cache["spatial"] = jnp.zeros((cfg.num_layers, B, N, cfg.hidden_size),
                                         cdt)
        if self.pab_config.cross_broadcast:
            cache["cross"] = jnp.zeros((cfg.num_layers, B, N, cfg.hidden_size),
                                       cdt)
        return cache

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        encoder_hidden_states: jax.Array,
        timestep: jax.Array,
        kv_mask: Optional[jax.Array] = None,
        pab_cache: Optional[PABCache] = None,
    ):
        cfg = self.config
        B, C_in, T, H, W = hidden_states.shape
        p, pt = cfg.patch_size, cfg.patch_size_t
        assert pt == 1, "patch_size_t>1 not used by released v1.2 checkpoints"
        t_p, h_p, w_p = T, H // p, W // p
        N = t_p * h_p * w_p

        # 1. patch embed: conv2d per frame (PatchEmbed2D :300-368)
        imgs = jnp.transpose(hidden_states, (0, 2, 3, 4, 1)).astype(cfg.dtype)
        imgs = imgs.reshape(B * T, H, W, C_in)
        xe = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), padding="VALID",
                     dtype=cfg.dtype, name="patch_proj")(imgs)
        xe = xe.reshape(B, t_p, h_p * w_p, cfg.hidden_size)
        rope = None
        if cfg.use_rope:
            cos, sin = rope_3d_tables(cfg.head_dim, t_p, h_p, w_p,
                                      cfg.interpolation_thw())
            rope = (jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32))
        else:
            it, ih, iw = cfg.interpolation_thw()
            # anisotropic 2D sincos (get_2d_sincos_pos_embed :163-200):
            # half channels each for h and w, per-axis interpolation scale
            bh, bw = cfg.sample_size[0] // p, cfg.sample_size[1] // p
            emb_h = pos_embed_1d(cfg.hidden_size // 2, h_p,
                                 scale=(h_p / bh) * ih)
            emb_w = pos_embed_1d(cfg.hidden_size // 2, w_p,
                                 scale=(w_p / bw) * iw)
            pos = np.concatenate([
                np.broadcast_to(emb_h[:, None], (h_p, w_p, cfg.hidden_size // 2)),
                np.broadcast_to(emb_w[None, :], (h_p, w_p, cfg.hidden_size // 2)),
            ], axis=-1).reshape(h_p * w_p, cfg.hidden_size)
            tpos = pos_embed_1d(cfg.hidden_size, t_p, scale=it)
            xe = xe + jnp.asarray(pos, cfg.dtype)[None, None]
            xe = xe + jnp.asarray(tpos, cfg.dtype)[None, :, None]
        xe = xe.reshape(B, N, cfg.hidden_size)
        xe = par.shard_tokens(xe)

        # 2. shared adaLN + caption projection (PixArtAlphaTextProjection)
        mods, embedded_t = AdaLayerNormSingle(cfg.hidden_size, cfg.dtype,
                                              name="adaln_single")(timestep)
        enc = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="caption_in")(
            encoder_hidden_states.astype(cfg.dtype))
        enc = nn.gelu(enc, approximate=True)
        enc = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="caption_out")(enc)

        # 3. blocks
        cache = pab_cache if pab_cache is not None else {}
        block_cls = V120ScannedBlock
        if self.remat:
            block_cls = nn.remat(block_cls, prevent_cse=False)
        Scan = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
            length=cfg.num_layers,
        )
        (xs, new_cache), _ = Scan(config=cfg, plan=self.plan,
                                  cache_dtype=self._cache_dtype(),
                                  name="blocks")(
            (xe, cache), (jnp.arange(cfg.num_layers),), enc, mods, kv_mask,
            rope)

        # 4. output head (:2067-2082, ada_norm_single branch)
        table = self.param(
            "scale_shift_table",
            nn.initializers.normal(stddev=cfg.hidden_size**-0.5),
            (2, cfg.hidden_size), jnp.float32)
        shift, scale = (
            (table[None].astype(cfg.dtype) + embedded_t[:, None])[:, i][:, None]
            for i in range(2))
        xs = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                          dtype=jnp.float32, name="norm_out")(xs).astype(cfg.dtype)
        xs = xs * (1 + scale) + shift
        xs = nn.Dense(pt * p * p * cfg.out_channels, dtype=cfg.dtype,
                      name="proj_out")(xs)

        # 5. unpatchify (:2085-2106) -> [B, C_out, T, H, W]
        out = xs.reshape(B, t_p, h_p, w_p, pt, p, p, cfg.out_channels)
        out = jnp.einsum("nthwopqc->nctohpwq", out).reshape(
            B, cfg.out_channels, t_p * pt, h_p * p, w_p * p)
        out = out.astype(jnp.float32)
        if pab_cache is not None:
            return out, new_cache
        return out
