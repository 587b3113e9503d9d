"""Pyramid Attention Broadcast (PAB) — host-side planning, trace-compatible caching.

Behavioral reference: `videosys/core/pab/pab_mgr.py` (PABManager counters
:54-139, MLP save/fetch :141-174) and the block hooks in
`open_sora_transformer_3d.py:186-284`.

TPU-native redesign (SURVEY.md §2.4 plan): the reference mutates a global
singleton at runtime; under jit that is impossible and unnecessary — every
broadcast decision is a pure function of the (static) timestep ladder. So:

* `build_plans` replays the reference's counter logic over the ladder ONCE on
  the host and emits a static `PABStepPlan` per sampling step;
* spatial/temporal/cross flags are Python bools -> each distinct flag combo
  specializes the jitted denoise step (bounded, typically <= 6 variants;
  XLA dead-code-eliminates the skipped attention entirely);
* per-block caches live in an explicit `PABCache` pytree carried through the
  sampling loop (donated buffers, sp-sharded like the activations);
* MLP skip (5 blocks x 3 timesteps in the reference config) is per-depth and
  therefore traced: the block computes-and-selects via the cache, preserving
  outputs exactly; the compute saving it forgoes is <2% of step FLOPs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np


@dataclasses.dataclass
class PABConfig:
    """Mirror of pab_mgr.PABConfig (:6-40)."""

    spatial_broadcast: bool = False
    spatial_threshold: tuple[int, int] = (0, 0)
    spatial_range: int = 1
    temporal_broadcast: bool = False
    temporal_threshold: tuple[int, int] = (0, 0)
    temporal_range: int = 1
    cross_broadcast: bool = False
    cross_threshold: tuple[int, int] = (0, 0)
    cross_range: int = 1
    mlp_broadcast: bool = False
    # {timestep:int -> {"block": [idx...], "skip_count": int}}
    mlp_spatial_broadcast_config: Optional[dict] = None
    mlp_temporal_broadcast_config: Optional[dict] = None
    # --- TPU-first extensions beyond the reference ladder ----------------- #
    # Range-based FULL-DEPTH MLP broadcast: when ``mlp_range > 1`` (and
    # mlp_broadcast), every block's MLP output is cached/broadcast under its
    # own (threshold, range) ladder exactly like the attention branches.
    # The reference's dict config (pab_mgr.py:93-174) covers only 5/28 blocks
    # at 3 timesteps, which leaves the MLP — ~52% of STDiT3 step FLOPs at
    # 2s/480p — uncached on read steps and caps the denoise speedup near
    # 1.4x. Takes precedence over the dict configs (they are ignored).
    # Quality evidence: docs/pab_quality.json (trained-weights protocol).
    mlp_threshold: tuple[int, int] = (450, 930)
    mlp_range: int = 1
    # Pair-delta residual cache: cache the residual of a whole (spatial,
    # temporal) depth-pair — x_out - x_in — in ONE [depth, B, T, S, C] slot
    # and skip the ENTIRE pair on read steps. ~6x less cache HBM than the
    # per-component slots (which is what lets PAB fit 720p/4s workloads on a
    # 16 GiB chip) and a read step is pure cache traffic + embeddings.
    # Subsumes the component ladders at equal range: when enabled, the
    # component/MLP flags are ignored by build_plans.
    pair_broadcast: bool = False
    pair_threshold: tuple[int, int] = (450, 930)
    pair_range: int = 1
    # cache storage dtype (None = model dtype). "float8_e4m3" halves the
    # cache HBM footprint — the 28-layer 2s/480p cache is multi-GiB and PAB
    # is already an approximation; see docs/pab.md.
    cache_dtype: Optional[str] = None

    @property
    def enabled(self) -> bool:
        return (self.spatial_broadcast or self.temporal_broadcast
                or self.cross_broadcast or self.mlp_broadcast
                or self.pair_broadcast)

    @property
    def mlp_range_mode(self) -> bool:
        """Full-depth range-based MLP broadcast active (extension)."""
        return bool(self.mlp_broadcast and self.mlp_range > 1)


@dataclasses.dataclass(frozen=True)
class PABStepPlan:
    """Static per-step broadcast decisions. Hashable -> usable as a jit
    specialization key. MLP flags are per-depth numpy bool tuples.

    ``spatial/temporal/cross`` mean READ the cache this step (broadcast);
    ``save_*`` mean WRITE the freshly computed value into the cache because
    the NEXT step broadcasts it. Since the whole ladder is host-static, every
    cache slot has a static per-step mode in {absent, read, write} — steps
    that neither read nor write a slot pay zero HBM traffic for it (the
    reference pays a Python-side dict lookup; a jitted program would
    otherwise pay a full copy)."""

    spatial: bool = False
    temporal: bool = False
    cross: bool = False
    save_spatial: bool = False
    save_temporal: bool = False
    save_cross: bool = False
    # range-mode MLP broadcast (extension; all depths at once)
    mlp: bool = False
    save_mlp: bool = False
    # pair-delta residual broadcast (extension; skips whole depth pairs)
    pair: bool = False
    save_pair: bool = False
    # per-depth tuples (static): save into / read from the MLP cache slot
    # (the reference's dict-driven mechanism, pab_mgr.py:93-174)
    mlp_spatial_save: tuple[bool, ...] = ()
    mlp_spatial_use: tuple[bool, ...] = ()
    mlp_temporal_save: tuple[bool, ...] = ()
    mlp_temporal_use: tuple[bool, ...] = ()

    @property
    def key(self):
        return self

    @property
    def any_mlp(self) -> bool:
        return any(self.mlp_spatial_save) or any(self.mlp_spatial_use) or \
            any(self.mlp_temporal_save) or any(self.mlp_temporal_use)

    def slot_mode(self, branch: str, slot: str) -> str:
        """Static cache-slot mode for this step: absent | read | write
        (| readwrite for the dict-driven slim MLP rows)."""
        if slot == "attn":
            read = self.spatial if branch == "spatial" else self.temporal
            write = self.save_spatial if branch == "spatial" else self.save_temporal
        elif slot == "cross":
            read, write = self.cross, self.save_cross
        elif slot == "delta":  # pair-delta residual slot
            read, write = self.pair, self.save_pair
        else:  # mlp
            if self.mlp or self.save_mlp:  # range mode: full-depth slot
                read, write = self.mlp, self.save_mlp
            else:  # dict mode: active (read+write rows) iff any flag set
                return "readwrite" if self.any_mlp else "absent"
        return "read" if read else ("write" if write else "absent")


def _broadcast_flags(
    enabled: bool, threshold: tuple[int, int], rng: int, timesteps: Sequence[int]
) -> list[bool]:
    """Replay of PABManager.if_broadcast_* (:54-91): per-step counter starts
    at 0 and increments once per step; broadcast when count % range != 0 and
    t inside the open interval."""
    flags = []
    for count, t in enumerate(timesteps):
        flags.append(
            bool(enabled and (count % rng != 0) and threshold[0] < t < threshold[1])
        )
    return flags


def _mlp_flags(
    cfg: Optional[dict], timesteps: Sequence[int], depth: int
) -> tuple[list[tuple[bool, ...]], list[tuple[bool, ...]]]:
    """Replay of if_skip_mlp / _is_t_in_skip_config (:93-139). Returns
    (save_flags, use_flags), each a per-step list of per-depth tuples."""
    n = len(timesteps)
    save = [[False] * depth for _ in range(n)]
    use = [[False] * depth for _ in range(n)]
    if cfg:
        for key_t, spec in cfg.items():
            if key_t not in timesteps:
                continue
            i = timesteps.index(key_t)
            blocks = spec["block"]
            skip_count = int(spec["skip_count"])
            for b in blocks:
                if b < depth:
                    save[i][b] = True
            for j in range(i + 1, min(i + 1 + skip_count, n)):
                for b in blocks:
                    if b < depth:
                        use[j][b] = True
    return [tuple(s) for s in save], [tuple(u) for u in use]


def quantize_timesteps(timesteps: np.ndarray, dtype=None) -> list[int]:
    """The reference keys PAB decisions on int(t.to(model_dtype).item())
    (scheduling_rflow_open_sora.py:222) — replicate the dtype rounding."""
    ts = np.asarray(timesteps)
    if dtype is not None:
        import jax.numpy as jnp
        import numpy as _np

        ts = _np.asarray(jnp.asarray(ts).astype(dtype).astype(jnp.float32))
    return [int(t) for t in ts]


def build_plans(
    config: Optional[PABConfig],
    timesteps: np.ndarray,
    depth: int,
    model_dtype=None,
) -> list[PABStepPlan]:
    """One static plan per sampling step."""
    n = len(timesteps)
    if config is None or not config.enabled:
        return [PABStepPlan()] * n
    ts_int = quantize_timesteps(timesteps, model_dtype)

    def nxt(flags, i):
        # write needed iff this step computes and the next step broadcasts
        return (not flags[i]) and (i + 1 < n) and flags[i + 1]

    if config.pair_broadcast:
        # pair-delta mode subsumes the component ladders (PABConfig note):
        # a pair-read step skips the whole block pair, so component save
        # flags could silently go stale — keep the semantics sound by using
        # ONLY the pair ladder.
        pr = _broadcast_flags(True, tuple(config.pair_threshold),
                              config.pair_range, ts_int)
        return [PABStepPlan(pair=pr[i], save_pair=nxt(pr, i))
                for i in range(n)]

    sp = _broadcast_flags(config.spatial_broadcast, tuple(config.spatial_threshold),
                          config.spatial_range, ts_int)
    tp = _broadcast_flags(config.temporal_broadcast, tuple(config.temporal_threshold),
                          config.temporal_range, ts_int)
    cr = _broadcast_flags(config.cross_broadcast, tuple(config.cross_threshold),
                          config.cross_range, ts_int)
    empty = [()] * n
    ms_save = ms_use = mt_save = mt_use = empty
    ml = [False] * n
    if config.mlp_range_mode:
        ml = _broadcast_flags(True, tuple(config.mlp_threshold),
                              config.mlp_range, ts_int)
    elif config.mlp_broadcast:
        ms_save, ms_use = _mlp_flags(config.mlp_spatial_broadcast_config, ts_int, depth)
        mt_save, mt_use = _mlp_flags(config.mlp_temporal_broadcast_config, ts_int, depth)

    return [
        PABStepPlan(
            spatial=sp[i], temporal=tp[i], cross=cr[i],
            save_spatial=nxt(sp, i), save_temporal=nxt(tp, i),
            save_cross=nxt(cr, i),
            mlp=ml[i], save_mlp=nxt(ml, i),
            mlp_spatial_save=ms_save[i], mlp_spatial_use=ms_use[i],
            mlp_temporal_save=mt_save[i], mlp_temporal_use=mt_use[i],
        )
        for i in range(n)
    ]


def mlp_config_blocks(config: Optional[PABConfig]) -> tuple[int, ...]:
    """Union of block indices appearing in the MLP broadcast configs — the
    only depths that ever need an MLP cache row (the reference stores cache
    entries keyed (timestep, block) and deletes them at range end,
    pab_mgr.py:141-174; here the slim per-block rows are resident)."""
    if config is None or not config.mlp_broadcast:
        return ()
    blocks = set()
    for cfg in (config.mlp_spatial_broadcast_config,
                config.mlp_temporal_broadcast_config):
        for spec in (cfg or {}).values():
            blocks.update(int(b) for b in spec["block"])
    return tuple(sorted(blocks))


def num_step_variants(plans: Sequence[PABStepPlan]) -> int:
    """Distinct jit specializations a plan list will create."""
    return len(set(plans))
