"""STDiT3 (Open-Sora v1.2) — spatio-temporal DiT, TPU-native.

Behavioral reference: `videosys/models/transformers/open_sora_transformer_3d.py`
(STDiT3Block :99-315, STDiT3 :364-658, STDiT3_XL_2 :661). Re-designed for
XLA/TPU rather than translated:

* activations live as [B, T, S, C] channel-last; DSP's `dynamic_switch`
  all-to-alls (:288-315) become sharding-constraint flips (XLA emits the
  collectives over the sp ICI axis);
* the 28 (spatial, temporal) block pairs run under `nn.scan` — one trace,
  stacked params, fast compiles, remat-friendly;
* PAB block hooks (:186-284) become explicit cache pytrees + static per-step
  plans (see `videosys_tpu.core.pab`): skipped attention is dead-code
  eliminated per plan specialization; the per-depth MLP skip is
  compute-and-select (output-exact);
* cross attention runs per-frame ([B*T, S, C] vs text kv broadcast across
  frames) so it is local under the resident spatial sharding;
* x_mask frame conditioning (t0-select, :181-284) is jnp.where on [B, T].
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from videosys_tpu.core import parallel as par
from videosys_tpu.core.pab import PABConfig, PABStepPlan, mlp_config_blocks
from videosys_tpu.models.modules.blocks import MultiHeadCrossAttention, SelfAttention
from videosys_tpu.models.modules.embeddings import (
    CaptionEmbedder,
    Mlp,
    PatchEmbed3D,
    SizeEmbedder,
    TimestepEmbedder,
    pos_embed_2d,
    rope_channel_tables,
    rope_freqs,
)
from videosys_tpu.models.modules.normalization import layer_norm, t2i_modulate

PABCache = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class STDiT3Config:
    """Mirror of STDiT3Config (open_sora_transformer_3d.py:318-361).
    STDiT3_XL_2 = depth 28, hidden 1152, patch (1,2,2), heads 16 (:661-667)."""

    input_sq_size: int = 512
    in_channels: int = 4
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    caption_channels: int = 4096
    model_max_length: int = 300
    qk_norm: bool = True
    pred_sigma: bool = True
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.pred_sigma else self.in_channels


def t_mask_select(x_mask, x, masked_x):
    """Frame-conditioning select on [B, T, S, C] (reference t_mask_select
    :152-160; x_mask [B, T], True = use the normal-timestep branch)."""
    return jnp.where(x_mask[:, :, None, None], x, masked_x)


class STDiT3Block(nn.Module):
    """One DiT block (spatial or temporal attention + cross attention + MLP)
    with adaLN modulation. Operates on x: [B, T, S, C].

    PAB cache slots have a STATIC per-step mode ("absent"/"read"/"write",
    core/pab.py slot_mode): a read step consumes ``cache`` and never writes;
    a write step computes normally and emits the value into ``written``;
    most steps are absent for most slots and pay zero cache traffic. The MLP
    skip is a real skip: `nn.cond` on the per-depth ``mlp_use`` flag executes
    either the full MLP or a negligible 1-token call (identical param
    creation) + cache-row readout — unlike the reference this preserves the
    exact save/use semantics of pab_mgr.py:93-174 without a Python-side
    registry."""

    config: STDiT3Config
    temporal: bool = False
    # static PAB modes for this jit specialization
    attn_mode: str = "absent"    # absent | read | write
    cross_mode: str = "absent"
    # full-depth range-mode MLP slot (PABConfig.mlp_range extension):
    # read steps skip fc1/fc2 entirely (statically DCE'd), write steps emit
    # the gated MLP output into the cache like the attention slots
    mlp_mode: str = "absent"     # absent | read | write
    mlp_cached: bool = False     # a dict-mode MLP cache row is threaded
    cache_dtype: Any = None      # storage dtype for written slots

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                  # [B, T, S, C]
        y: jax.Array,                  # [B, L, C]
        t_mlp: jax.Array,              # [B, 6C]
        t0_mlp: Optional[jax.Array],   # [B, 6C] (x_mask branch)
        x_mask: Optional[jax.Array],   # [B, T] bool
        kv_mask: Optional[jax.Array],  # [B, L] bool
        cache: PABCache,               # readable slots for this step
        mlp_row,                       # [B, T, S, C] cache row (or None)
        mlp_save,                      # [] bool (traced) — write MLP row
        mlp_use,                       # [] bool (traced) — read MLP row
        s_pad_mask=None,               # [S] bool: mesh-divisibility pad on S
        t_pad_mask=None,               # [T] bool: mesh-divisibility pad on T
    ) -> Tuple[jax.Array, PABCache]:
        cfg = self.config
        B, T, S, C = x.shape
        cdt = self.cache_dtype or cfg.dtype
        written: PABCache = {}

        table = self.param(
            "scale_shift_table",
            lambda key, shape: jax.random.normal(key, shape) / cfg.hidden_size**0.5,
            (6, cfg.hidden_size),
        )
        mods = (table[None] + t_mlp.reshape(B, 6, -1).astype(jnp.float32))
        mods = mods.astype(x.dtype)[:, :, None, None, :]  # [B, 6, 1, 1, C]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            mods[:, i] for i in range(6)
        )
        if x_mask is not None:
            mods0 = (table[None] + t0_mlp.reshape(B, 6, -1).astype(jnp.float32))
            mods0 = mods0.astype(x.dtype)[:, :, None, None, :]
            (shift_msa0, scale_msa0, gate_msa0,
             shift_mlp0, scale_mlp0, gate_mlp0) = (mods0[:, i] for i in range(6))

        # ---- attention (spatial or temporal) --------------------------- #
        if self.attn_mode == "read":
            x_m_s = cache["attn"].astype(x.dtype)
        else:
            normed1 = layer_norm(x)
            x_m = t2i_modulate(normed1, shift_msa, scale_msa)
            if x_mask is not None:
                x_m = t_mask_select(
                    x_mask, x_m, t2i_modulate(normed1, shift_msa0, scale_msa0)
                )

            if self.temporal:
                # temporal attention: local under the resident S sharding.
                # Pin the resident shard on the 4D tensor BEFORE merging
                # rows: it gives GSPMD a staging point so the norm/modulate
                # producers (incl. their [B,T,S,1] stats) complete under
                # S-sharding and only the [B,T,S,C] product is resharded to
                # the merged-row (B x S-slice) decomposition — without it
                # the partitioner hits "Involuntary full rematerialization"
                # on the LayerNorm stat (observed in dryrun sp=8 logs).
                x_m = par.shard_spatial(x_m)
                xa = rearrange(x_m, "b t s c -> (b s) t c")
                xa = par.shard_merged_rows(xa)
                rope_ch = rope_channel_tables(
                    np.arange(T, dtype=np.float32),
                    rope_freqs(cfg.hidden_size // cfg.num_heads),
                    cfg.num_heads)
                t_kv = None if t_pad_mask is None else jnp.broadcast_to(
                    t_pad_mask[None], (B * S, T))  # pad frames: mask as KV
                xa = SelfAttention(
                    dim=cfg.hidden_size, num_heads=cfg.num_heads,
                    qk_norm=cfg.qk_norm, dtype=cfg.dtype,
                    rope_channel=rope_ch, name="attn",
                )(xa, kv_mask=t_kv)
                x_m = rearrange(xa, "(b s) t c -> b t s c", b=B)
            else:
                # spatial attention: DSP flip S-shard -> T-shard (all-to-all)
                is_image = T == 1
                x_m = par.shard_batch_over_all(x_m) if is_image else par.shard_temporal(x_m)
                xa = x_m.reshape(B * T, S, C)
                xa = par.shard_merged_rows(xa)
                s_kv = None if s_pad_mask is None else jnp.broadcast_to(
                    s_pad_mask[None], (B * T, S))  # pad tokens: mask as KV
                xa = SelfAttention(
                    dim=cfg.hidden_size, num_heads=cfg.num_heads,
                    qk_norm=cfg.qk_norm, dtype=cfg.dtype, name="attn",
                )(xa, kv_mask=s_kv)
                x_m = xa.reshape(B, T, S, C)
                # flip back to the resident S shard (all-to-all)
                x_m = par.shard_spatial(x_m)

            x_m_s = gate_msa * x_m
            if x_mask is not None:
                x_m_s = t_mask_select(x_mask, x_m_s, gate_msa0 * x_m)

        if self.attn_mode == "write":
            written["attn"] = x_m_s.astype(cdt)

        x = x + x_m_s

        # ---- cross attention ------------------------------------------- #
        if self.cross_mode == "read":
            x_cross = cache["cross"].astype(x.dtype)
        else:
            # per-frame rows keep cross attention local under the resident S
            # shard; merging frames into [B, T*S] rows on a single chip
            # measured SLOWER (1.352 vs 1.330 s step) — don't retry
            xq = x.reshape(B * T, S, C)
            xq = par.shard_cross_rows(xq)
            x_cross = MultiHeadCrossAttention(
                dim=cfg.hidden_size, num_heads=cfg.num_heads,
                dtype=cfg.dtype, name="cross_attn",
            )(xq, y, kv_mask)
            x_cross = x_cross.reshape(B, T, S, C)
        if self.cross_mode == "write":
            written["cross"] = x_cross.astype(cdt)

        x = x + x_cross

        # ---- MLP -------------------------------------------------------- #
        if self.mlp_mode == "read":
            # range-mode broadcast: reuse the cached gated MLP output; the
            # whole MLP (incl. layer_norm/modulate producers) is dead code
            x = x + cache["mlp"].astype(x.dtype)
            return x, written

        normed2 = layer_norm(x)

        def _mlp_compute(mdl, normed2):
            x_m = t2i_modulate(normed2, shift_mlp, scale_mlp)
            if x_mask is not None:
                x_m = t_mask_select(
                    x_mask, x_m, t2i_modulate(normed2, shift_mlp0, scale_mlp0)
                )
            x_m = Mlp(
                hidden_features=int(cfg.hidden_size * cfg.mlp_ratio),
                out_features=cfg.hidden_size, dtype=cfg.dtype, name="mlp",
            )(x_m)
            # keep the gate/residual epilogue OUT of the fc2 matmul fusion:
            # the kOutput fusion drops the fc2 emitter to ~45% MFU
            # (measured step 1.381 -> 1.356 s at 2s/480p on v5e)
            x_m = jax.lax.optimization_barrier(x_m)
            x_m_s = gate_mlp * x_m
            if x_mask is not None:
                x_m_s = t_mask_select(x_mask, x_m_s, gate_mlp0 * x_m)
            return x_m_s

        if self.mlp_cached:
            def _mlp_skip(mdl, normed2):
                # same param creation as the compute branch at ~1/(T*S) cost
                _ = Mlp(
                    hidden_features=int(cfg.hidden_size * cfg.mlp_ratio),
                    out_features=cfg.hidden_size, dtype=cfg.dtype, name="mlp",
                )(normed2[:, :1, :1])
                return jnp.broadcast_to(
                    mlp_row.astype(normed2.dtype), normed2.shape)

            x_m_s = nn.cond(mlp_use, _mlp_skip, _mlp_compute, self, normed2)
            written["mlp"] = x_m_s.astype(cdt)
        else:
            x_m_s = _mlp_compute(self, normed2)
            if self.mlp_mode == "write":  # range-mode save
                written["mlp"] = x_m_s.astype(cdt)

        x = x + x_m_s
        return x, written


class STDiT3DepthPair(nn.Module):
    """One (spatial, temporal) block pair — the scanned unit
    (STDiT3.forward :609-613 iterates these pairs).

    carry = (x, mlp_carries, write_carries):
    * mlp_carries: slim per-branch MLP cache [n_cfg_blocks, B, T, S, C] (only
      the depths that ever cache MLP); row access is gated by `lax.cond` on
      the per-depth flags so untouched iterations pay no HBM traffic;
    * write_carries: full-depth slots this step WRITES, updated in place at
      the current depth — carrying them (instead of emitting scan-stacked
      outputs) lets XLA alias the donated input buffers, so a write step
      allocates no second copy of a multi-GiB slot (the stacked-output form
      peaked +6.4 GiB at 2s/480p and OOM'd a 16 GiB v5e).
    scanned = (readable attn/cross slots, depth index, per-depth MLP row
    index, per-depth mlp save/use flags)."""

    config: STDiT3Config
    plan: PABStepPlan = PABStepPlan()
    cache_dtype: Any = None

    @nn.compact
    def __call__(self, carry, scanned, y, t_mlp, t0_mlp, x_mask, kv_mask,
                 s_pad_mask=None, t_pad_mask=None):
        x, mlp_carries, write_carries = carry
        read_caches, depth_idx, row_idx, mlp_flags = scanned
        plan = self.plan
        new_mlp_carries = {}
        new_write_carries = {b: dict(slots)
                             for b, slots in write_carries.items()}

        if plan.pair:
            # pair-delta broadcast (PABConfig.pair_broadcast extension): the
            # ENTIRE depth pair is statically replaced by its cached residual
            # — no block params are touched, the read is the whole cost
            x = x + read_caches["pair"]["delta"].astype(x.dtype)
            return (x, new_mlp_carries, new_write_carries), ()
        x_pair_in = x  # pair-delta save point

        def run_branch(branch, temporal, x):
            cached = branch in mlp_carries
            if cached:
                c = mlp_carries[branch]
                use = mlp_flags[f"{branch}_use"]
                save = mlp_flags[f"{branch}_save"]
                row = jax.lax.cond(
                    use,
                    lambda c: jax.lax.dynamic_index_in_dim(
                        c, row_idx, 0, keepdims=False),
                    lambda c: jnp.zeros(c.shape[1:], c.dtype),
                    c)
            else:
                c, row, use, save = None, None, False, False

            attn_mode = plan.slot_mode(branch, "attn")
            cross_mode = plan.slot_mode(branch, "cross")
            mode = plan.slot_mode(branch, "mlp")
            # "readwrite" = dict-mode slim rows (mlp_carries machinery);
            # "read"/"write" = range-mode full-depth slot
            mlp_mode = mode if mode in ("read", "write") else "absent"
            x, w = STDiT3Block(
                config=self.config, temporal=temporal,
                attn_mode=attn_mode, cross_mode=cross_mode,
                mlp_mode=mlp_mode,
                mlp_cached=cached, cache_dtype=self.cache_dtype,
                name=branch,
            )(x, y, t_mlp, t0_mlp, x_mask, kv_mask,
              read_caches.get(branch, {}), row, save, use,
              s_pad_mask=s_pad_mask, t_pad_mask=t_pad_mask)

            if cached:
                new_row = w.pop("mlp")
                new_mlp_carries[branch] = jax.lax.cond(
                    save,
                    lambda c: jax.lax.dynamic_update_index_in_dim(
                        c, new_row, row_idx, 0),
                    lambda c: c,
                    c)
            for slot, val in w.items():
                new_write_carries[branch][slot] = \
                    jax.lax.dynamic_update_index_in_dim(
                        write_carries[branch][slot], val, depth_idx, 0)
            return x

        x = run_branch("spatial", False, x)
        x = run_branch("temporal", True, x)
        if plan.save_pair:
            cdt = self.cache_dtype or self.config.dtype
            new_write_carries["pair"]["delta"] = \
                jax.lax.dynamic_update_index_in_dim(
                    write_carries["pair"]["delta"],
                    (x - x_pair_in).astype(cdt), depth_idx, 0)
        return (x, new_mlp_carries, new_write_carries), ()


class STDiT3(nn.Module):
    """Full STDiT3 transformer (STDiT3 :364-658)."""

    config: STDiT3Config
    plan: PABStepPlan = PABStepPlan()
    pab_config: Optional[PABConfig] = None
    remat: bool = False  # gradient checkpointing over block pairs
    # TPU-native analog of the reference's dynamic recompute (the knapsack
    # over per-submodule recompute counts, core/dcp/profiler.py:584-622):
    # instead of choosing WHICH torch submodules to checkpoint, choose the
    # XLA remat policy for the scanned pair — "full" recomputes everything,
    # "dots" saves matmul outputs (less recompute, more memory), "none"
    # disables remat. The DCP profiler escalates across policies per bucket.
    remat_policy: str = "full"  # full | dots | none

    def cache_keys(self, temporal: bool) -> Tuple[str, ...]:
        pc = self.pab_config
        if pc is None or not pc.enabled:
            return ()
        if pc.pair_broadcast:  # pair-delta subsumes the component slots
            return ()
        keys = []
        if temporal and pc.temporal_broadcast:
            keys.append("attn")
        if not temporal and pc.spatial_broadcast:
            keys.append("attn")
        if pc.cross_broadcast:
            keys.append("cross")
        if pc.mlp_broadcast and (pc.mlp_range_mode or mlp_config_blocks(pc)):
            keys.append("mlp")
        return tuple(keys)

    def _cache_dtype(self):
        if self.pab_config is not None and self.pab_config.cache_dtype:
            return getattr(jnp, self.pab_config.cache_dtype)
        return self.config.dtype

    def init_cache(self, B: int, T: int, S: int) -> Dict[str, PABCache]:
        """Zero-initialized PAB cache pytree. attn/cross slots are
        [depth, B, T, S, C]; the MLP slot is the slim
        [len(mlp_config_blocks), B, T, S, C] — only depths that ever cache
        (the reference deletes cache entries at range end, pab_mgr.py:162-168;
        here the resident footprint is bounded up front)."""
        cfg = self.config
        cdt = self._cache_dtype()
        # cache shapes carry the same mesh-divisibility padding the forward
        # applies (call under the same par.use_mesh context as the step fns)
        m = par.token_pad_multiple()
        if m > 1:
            S = -(-S // m) * m
            T = T if T == 1 else -(-T // m) * m
        shape = (cfg.depth, B, T, S, cfg.hidden_size)
        pc = self.pab_config
        if pc is not None and pc.pair_broadcast:
            # one full-depth residual slot for the whole model — ~6x less
            # HBM than the per-component slots (PABConfig.pair_broadcast)
            return {"pair": {"delta": jnp.zeros(shape, cdt)}}
        # range-mode MLP caches at full depth; dict mode only the slim
        # configured rows (the reference deletes entries at range end)
        if pc is not None and pc.mlp_range_mode:
            mlp_shape = shape
        else:
            n_mlp = len(mlp_config_blocks(pc))
            mlp_shape = (n_mlp, B, T, S, cfg.hidden_size)
        caches: Dict[str, PABCache] = {}
        for branch, temporal in (("spatial", False), ("temporal", True)):
            keys = self.cache_keys(temporal)
            if keys:
                caches[branch] = {
                    k: jnp.zeros(mlp_shape if k == "mlp" else shape, cdt)
                    for k in keys}
        return caches

    def _mlp_scan_arrays(self) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """(per-depth row index into the slim MLP slot, per-depth save/use
        flag arrays) for this step's plan."""
        plan, depth = self.plan, self.config.depth
        blocks = mlp_config_blocks(self.pab_config)
        idx = np.zeros((depth,), np.int32)
        for r, b in enumerate(blocks):
            if b < depth:
                idx[b] = r
        def arr(t):
            return jnp.asarray(t if t else (False,) * depth)
        flags = {
            "spatial_save": arr(plan.mlp_spatial_save),
            "spatial_use": arr(plan.mlp_spatial_use),
            "temporal_save": arr(plan.mlp_temporal_save),
            "temporal_use": arr(plan.mlp_temporal_use),
        }
        return jnp.asarray(idx), flags

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                   # [B, C_in, T, H, W] (reference layout)
        timestep: jax.Array,            # [B] float
        y: jax.Array,                   # [B, L, caption_channels]
        kv_mask: Optional[jax.Array] = None,   # [B, L] bool text mask
        x_mask: Optional[jax.Array] = None,    # [B, T_latent] bool frame mask
        fps: Optional[jax.Array] = None,       # [B] or [1]
        height: float = 0.0,            # static: pixel height
        width: float = 0.0,             # static: pixel width
        pab_cache: Optional[Dict[str, PABCache]] = None,
    ):
        cfg = self.config
        B = x.shape[0]
        Rt, Rh, Rw = x.shape[2], x.shape[3], x.shape[4]
        x = jnp.transpose(x, (0, 2, 3, 4, 1)).astype(cfg.dtype)  # -> [B,T,H,W,C]

        pt, ph, pw = cfg.patch_size
        T, H, W = -(-Rt // pt), -(-Rh // ph), -(-Rw // pw)
        S = H * W

        # --- position embedding (trace-time constant; :565-570) ---------- #
        base_size = round(S**0.5)
        resolution_sq = (float(height) * float(width)) ** 0.5
        scale = resolution_sq / cfg.input_sq_size if resolution_sq > 0 else 1.0
        pos = pos_embed_2d(cfg.hidden_size, H, W, scale=scale, base_size=base_size)
        pos = jnp.asarray(pos, dtype=cfg.dtype)  # [S, C]

        # --- timestep / fps embedding (:572-582) ------------------------- #
        timestep = timestep.astype(cfg.dtype)
        t_embedder = TimestepEmbedder(cfg.hidden_size, dtype=cfg.dtype, name="t_embedder")
        t_block0 = nn.Dense(6 * cfg.hidden_size, dtype=cfg.dtype, name="t_block")
        t = t_embedder(timestep)
        if fps is None:
            fps = jnp.full((B,), 24.0, dtype=cfg.dtype)
        fps_emb = SizeEmbedder(cfg.hidden_size, dtype=cfg.dtype, name="fps_embedder")(
            fps.astype(cfg.dtype), B
        )
        t = t + fps_emb
        t_mlp = t_block0(nn.silu(t))
        t0 = t0_mlp = None
        if x_mask is not None:
            t0 = t_embedder(jnp.zeros_like(timestep)) + fps_emb
            t0_mlp = t_block0(nn.silu(t0))

        # --- caption embedding (:584-590) --------------------------------- #
        y_embedder = CaptionEmbedder(
            in_channels=cfg.caption_channels, hidden_size=cfg.hidden_size,
            token_num=cfg.model_max_length, dtype=cfg.dtype, name="y_embedder",
        )
        y = y_embedder(y.astype(cfg.dtype))  # [B, L, C]

        # --- patchify + pos (:592-595) ------------------------------------ #
        xe = PatchEmbed3D(cfg.patch_size, cfg.hidden_size, dtype=cfg.dtype,
                          name="x_embedder")(x)
        xe = xe.reshape(B, T, S, cfg.hidden_size) + pos[None, None]

        # --- mesh-divisibility padding (pad registry analog) -------------- #
        # Pad T/S up to the sp multiple so the DSP flips reshard evenly (see
        # parallel.token_pad_multiple). Padded S tokens are masked as KV in
        # spatial attention, padded T frames in temporal attention; in every
        # other op they are inert extra rows, sliced off before unpatchify.
        T0, S0 = T, S
        s_pad_mask = t_pad_mask = None
        m = par.token_pad_multiple()
        if m > 1:
            Sp = -(-S // m) * m
            Tp = T if T == 1 else -(-T // m) * m  # image path never T-shards
            if Sp != S:
                s_pad_mask = jnp.arange(Sp) < S
            if Tp != T:
                t_pad_mask = jnp.arange(Tp) < T
                if x_mask is not None:
                    x_mask = jnp.pad(x_mask, ((0, 0), (0, Tp - T)),
                                     constant_values=True)
            if (Tp, Sp) != (T, S):
                xe = jnp.pad(xe, ((0, 0), (0, Tp - T), (0, Sp - S), (0, 0)))
                T, S = Tp, Sp

        xe = par.shard_spatial(xe)  # resident DSP layout (:598-603)

        # --- scanned depth pairs (:607-613) -------------------------------- #
        # Assemble the static per-slot cache modes for this step's plan:
        # read slots enter the scan as per-depth inputs; written slots leave
        # as per-depth outputs; everything else passes through untouched
        # (aliased by donation — zero HBM traffic).
        caches = pab_cache if pab_cache is not None else {}
        # without a cache pytree no PAB behavior is possible (e.g. init)
        plan = self.plan if pab_cache is not None else PABStepPlan()
        read_in: Dict[str, PABCache] = {}
        write_carries: Dict[str, PABCache] = {}
        # "mlp" here is the full-depth range-mode slot ("read"/"write");
        # dict-mode slim rows report "readwrite" and ride mlp_carries below
        slot_names = ("attn", "cross", "mlp", "delta")
        for branch in caches:
            read_in[branch] = {
                sl: caches[branch][sl] for sl in slot_names
                if sl in caches[branch]
                and plan.slot_mode(branch, sl) == "read"}
            wr = {sl: caches[branch][sl] for sl in slot_names
                  if sl in caches[branch]
                  and plan.slot_mode(branch, sl) == "write"}
            if wr:
                write_carries[branch] = wr
        mlp_active = plan.any_mlp
        mlp_carries = {}
        if mlp_active:
            for branch in caches:
                if "mlp" in caches[branch]:
                    mlp_carries[branch] = caches[branch]["mlp"]
        row_idx, mlp_flags = self._mlp_scan_arrays()
        depth_idx = jnp.arange(cfg.depth, dtype=jnp.int32)
        scanned = (read_in, depth_idx, row_idx, mlp_flags)

        pair_cls = STDiT3DepthPair
        if self.remat and self.remat_policy != "none":
            policy = (jax.checkpoint_policies.checkpoint_dots
                      if self.remat_policy == "dots" else None)
            pair_cls = nn.remat(
                pair_cls,
                static_argnums=(),
                prevent_cse=False,
                policy=policy,
            )
        ScanPairs = nn.scan(
            pair_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0,) + (nn.broadcast,) * 7,
            out_axes=0,
            length=cfg.depth,
            unroll=2,
        )
        (xs, mlp_carries_out, write_carries_out), _ = ScanPairs(
            config=cfg, plan=plan, cache_dtype=self._cache_dtype(),
            name="blocks",
        )((xe, mlp_carries, write_carries), scanned,
          y, t_mlp, t0_mlp, x_mask, kv_mask, s_pad_mask, t_pad_mask)

        # merge: write carries and MLP carries re-enter their slots,
        # untouched slots pass through (aliased by donation)
        new_caches = {b: dict(slots) for b, slots in caches.items()}
        for branch, w in write_carries_out.items():
            new_caches[branch].update(w)
        for branch, arr in mlp_carries_out.items():
            new_caches[branch]["mlp"] = arr

        # --- final layer (:621-623, T2IFinalLayer :51-87) ------------------- #
        table = self.param(
            "final_scale_shift_table",
            lambda key, shape: jax.random.normal(key, shape) / cfg.hidden_size**0.5,
            (2, cfg.hidden_size),
        )
        mods = (table[None] + t[:, None].astype(jnp.float32)).astype(cfg.dtype)
        shift, scale_f = mods[:, 0, None, None, :], mods[:, 1, None, None, :]
        normed = layer_norm(xs)
        xo = t2i_modulate(normed, shift, scale_f)
        if x_mask is not None:
            mods0 = (table[None] + t0[:, None].astype(jnp.float32)).astype(cfg.dtype)
            # reference quirk (T2IFinalLayer.forward :81-85): the t0 branch
            # modulates norm_final(x) where x is ALREADY modulated — kept
            # bit-for-bit for checkpoint parity (test_torch_parity.py)
            xo0 = t2i_modulate(layer_norm(xo), mods0[:, 0, None, None, :],
                               mods0[:, 1, None, None, :])
            xo = t_mask_select(x_mask, xo, xo0)
        xo = nn.Dense(pt * ph * pw * cfg.out_channels, dtype=cfg.dtype,
                      name="final_linear")(xo)
        if (T, S) != (T0, S0):
            xo = xo[:, :T0, :S0]  # drop mesh-divisibility padding

        # --- unpatchify (:634-658) ---------------------------------------- #
        out = rearrange(
            xo, "b t (h w) (pt ph pw c) -> b c (t pt) (h ph) (w pw)",
            h=H, w=W, pt=pt, ph=ph, pw=pw, c=cfg.out_channels,
        )
        out = out[:, :, :Rt, :Rh, :Rw].astype(jnp.float32)
        if pab_cache is not None:
            return out, new_caches
        return out
