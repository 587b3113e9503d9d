"""Device-mesh construction and sharding helpers.

TPU-native re-design of the reference's process-group machinery
(`videosys/core/distributed/parallel_mgr.py` — ParallelManager/DynamicParallelManager
over NCCL groups, and `videosys/core/distributed/comm.py` — autograd collectives +
PAD_DICT).  On TPU none of that machinery survives:

* one process per host, SPMD over a `jax.sharding.Mesh` with named axes
  ``("dp", "cp", "sp")`` — data parallel, CFG-batch ("context") parallel, and
  sequence parallel, mirroring the reference's three mesh axes
  (parallel_mgr.py:14-39);
* the reference's `all_to_all_with_pad` / `split_sequence` / `gather_sequence`
  (comm.py:139,256,260) become sharding *constraints*: flipping the sharded axis
  of an activation between two `with_sharding_constraint` calls makes XLA emit
  the all-to-all over ICI (this is exactly DSP's "dynamic switch");
* the global PAD_DICT (comm.py:268-304) is unnecessary — GSPMD handles
  non-divisible dimension shardings with implicit padding;
* gradient semantics of the collectives come free from JAX AD.

`ParallelConfig` is the static description; `build_mesh` realises it over the
available devices.  A `DynamicParallelManager`-style per-batch sp resize maps to
a bounded set of pre-built meshes (power-of-two sp sizes, parallel_mgr.py:68-81)
— see `MeshPool`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Canonical axis names.
DP_AXIS = "dp"   # data parallel (batch)
CP_AXIS = "cp"   # CFG-batch parallel (cond/uncond split, inference only)
SP_AXIS = "sp"   # sequence parallel (DSP / Ulysses)
MESH_AXES = (DP_AXIS, CP_AXIS, SP_AXIS)

# Batch dim of activations is sharded over both dp and cp.
BATCH_AXES = (DP_AXIS, CP_AXIS)


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Static parallelism layout, mirroring ParallelManager(dp, cp, sp).

    Reference: `videosys/core/distributed/parallel_mgr.py:14-39`.
    """

    dp_size: int = 1
    cp_size: int = 1
    sp_size: int = 1

    @property
    def world_size(self) -> int:
        return self.dp_size * self.cp_size * self.sp_size

    @classmethod
    def from_world_size(cls, world_size: int, enable_cp: bool = False) -> "ParallelConfig":
        """Mimic `STDiT3.enable_parallel` (open_sora_transformer_3d.py:466-477):
        all devices go to sp; if cp is enabled and sp is even, split off cp=2."""
        sp = world_size
        cp = 1
        if enable_cp and sp % 2 == 0:
            sp //= 2
            cp = 2
        return cls(dp_size=1, cp_size=cp, sp_size=sp)


def build_mesh(config: ParallelConfig, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (dp, cp, sp) mesh. sp is placed innermost so sequence-parallel
    all-to-alls ride the fastest ICI links."""
    if devices is None:
        devices = jax.devices()
    n = config.world_size
    if len(devices) < n:
        raise ValueError(f"need {n} devices for {config}, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(config.dp_size, config.cp_size, config.sp_size)
    return Mesh(arr, MESH_AXES)


def single_device_mesh(device: Optional[jax.Device] = None) -> Mesh:
    devices = [device] if device is not None else jax.devices()[:1]
    return build_mesh(ParallelConfig(), devices)


# ---------------------------------------------------------------------------
# Canonical activation shardings for the DiT hot path.
#
# Activations inside the spatio-temporal transformer are kept as
# [B, T, S, C] (batch, latent frames, spatial patches, channels).
# DSP (docs/dsp.md, open_sora_transformer_3d.py:288-315):
#   resident layout  : sharded on S  ("spatial shard")  -> temporal attn local
#   spatial attention: sharded on T  ("temporal shard") -> spatial attn local
# The flip between the two is one all-to-all over the sp axis in each
# direction; XLA emits it from the sharding constraints below.
# ---------------------------------------------------------------------------

SPEC_SPATIAL_SHARD = P(BATCH_AXES, None, SP_AXIS, None)   # [B, T, S, C], S sharded
SPEC_TEMPORAL_SHARD = P(BATCH_AXES, SP_AXIS, None, None)  # [B, T, S, C], T sharded
SPEC_BATCH_SHARD = P((DP_AXIS, CP_AXIS, SP_AXIS), None, None, None)  # image case
SPEC_REPLICATED = P()

# --- active mesh context ---------------------------------------------------
# The mesh is selected on the host (engine/pipeline) before tracing; sharding
# constraints inside models resolve it at trace time. With no active mesh the
# helpers are identity, so single-device code pays nothing.

_ACTIVE_MESH: list[Optional[Mesh]] = [None]


class use_mesh:
    """Context manager installing the active mesh for sharding constraints."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def __enter__(self):
        _ACTIVE_MESH.append(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        _ACTIVE_MESH.pop()
        return False


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH[-1]


def _constrain(x, spec: P):
    mesh = active_mesh()
    if mesh is None or mesh.devices.size == 1:
        return x
    # NamedSharding keeps GSPMD's auto mode: uneven dims are padded
    # transparently (replaces the reference's PAD_DICT, comm.py:268-304).
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def shard_spatial(x):
    """Resident DSP layout: shard the spatial patch dim over sp."""
    return _constrain(x, SPEC_SPATIAL_SHARD)


def shard_temporal(x):
    """Pre-spatial-attention layout: shard latent frames over sp (the DSP
    dynamic_switch, open_sora_transformer_3d.py:288-315, as one resharding)."""
    return _constrain(x, SPEC_TEMPORAL_SHARD)


def shard_batch_over_all(x):
    """Image special case (T==1): scatter the batch dim over every axis
    (reference scatters batch over sp, open_sora_transformer_3d.py:293-302)."""
    return _constrain(x, SPEC_BATCH_SHARD)


def shard_merged_rows(x):
    """Attention-merged 3D layouts ([B*S, T, C] for temporal attention,
    [B*T, S, C] for spatial attention after the DSP flip): the merged leading
    dim is B-major / sharded-dim-minor, so it shards over (dp, cp, sp)."""
    return _constrain(x, P((DP_AXIS, CP_AXIS, SP_AXIS), None, None))


def shard_cross_rows(x):
    """Cross-attention layout [B*T, S, C] in the resident (S-sharded) state:
    rows over (dp, cp) (T unsharded), S over sp."""
    return _constrain(x, P(BATCH_AXES, SP_AXIS, None))


def shard_tokens(x):
    """Generic [B, N, C] token-sequence shard over sp (Ulysses resident
    layout for joint-attention models, cogvideox_transformer_3d.py:531-533)."""
    return _constrain(x, P(BATCH_AXES, SP_AXIS, None))


def ulysses_shard_heads(x):
    """Ulysses-style SP for joint-attention models (cogvideox_transformer_3d.py:112-165):
    [B, N, H, D] with heads sharded over sp, sequence gathered."""
    return _constrain(x, P(BATCH_AXES, None, SP_AXIS, None))


def ulysses_shard_seq(x):
    """Inverse Ulysses layout: sequence sharded, heads gathered ([B, N, H, D])."""
    return _constrain(x, P(BATCH_AXES, SP_AXIS, None, None))


def shard_frames(x):
    """Per-frame data-parallel layout for the spatial VAE ([N, H, W, C]
    merged B*T frames): frames over EVERY mesh axis. 2D convs are
    frame-local, so a multi-chip decode splits the frame loop with zero
    communication — the next e2e lever after denoise (at sp=8 the
    replicated VAE is ~half the non-denoise tail, docs/pab.md stack
    estimate). The reference never parallelizes its VAE (vae loops run
    replicated on every rank, pipeline_open_sora.py:239-268)."""
    return _constrain(x, P((DP_AXIS, CP_AXIS, SP_AXIS), None, None, None))


def shard_vae_rows(x):
    """Temporal-VAE layout [B, T, h, w, C]: latent rows (h) over (cp, sp),
    batch over dp only. The 3D causal convs are spatially local — GSPMD
    inserts halo exchanges (kernel 3 -> 1-row halos) instead of replicating.

    cp rides the ROW axis, not batch: the VAE always runs post-CFG-combine
    (B=1 at inference) and cp=1 in training, so putting cp on a size-1
    batch dim is degenerate — under cp2xsp4 GSPMD's propagation then moved
    the idle cp onto T, and the mixed {T:cp, h:sp} layout cannot reshard
    efficiently into the spatial stage's frames-over-all-axes layout
    (involuntary-full-rematerialization warning in the dryrun cp2xsp4
    leg). Rows over (cp, sp) -> the seam is a clean single cross-dim
    all-to-all."""
    return _constrain(x, P(DP_AXIS, None, (CP_AXIS, SP_AXIS), None, None))


def mesh_world_size() -> int:
    """Device count of the active mesh (1 when none)."""
    mesh = active_mesh()
    return 1 if mesh is None else int(mesh.devices.size)


def token_pad_multiple() -> int:
    """Divisibility requirement for token dims (T, S) under the active mesh.

    GSPMD handles uneven shards *correctly* (implicit padding), but at real
    shapes the reshape+reshard combos of the DSP flips hit the partitioner's
    "involuntary full rematerialization" fallback when the flipped dim is not
    divisible by sp — replicating multi-GiB activations (observed at
    2s/480p: S=1590, T=15 with sp=4). Models therefore pad T/S up to this
    multiple at patchify time and mask the pad in attention — the TPU analog
    of the reference's pad registry + all_to_all_with_pad
    (comm.py:268-304). Returns 1 when no mesh is active (single chip pays
    nothing)."""
    mesh = active_mesh()
    if mesh is None or mesh.devices.size == 1:
        return 1
    return mesh_axis_size(mesh, SP_AXIS)


def io_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for pipeline inputs/outputs [B, C, T, H, W]: batch over dp+cp."""
    return NamedSharding(mesh, P(BATCH_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


@functools.lru_cache(maxsize=None)
def _axis_sizes(mesh: Mesh):
    return dict(zip(mesh.axis_names, mesh.devices.shape))


def mesh_axis_size(mesh: Mesh, axis: str) -> int:
    return _axis_sizes(mesh)[axis]


class MeshPool:
    """Bounded set of meshes for DCP-style dynamic sequence parallelism.

    The reference pre-builds power-of-two NCCL sp groups and re-points the
    active group per batch (`DynamicParallelManager`, parallel_mgr.py:42-100).
    On TPU each distinct sp size is a distinct sharding -> a distinct compiled
    executable, so we pre-build the bounded family of meshes once and select
    per batch on the host; XLA's compile cache holds one executable per mesh.
    """

    def __init__(self, devices: Optional[Sequence[jax.Device]] = None, enable_cp: bool = False):
        if devices is None:
            devices = jax.devices()
        self._devices = list(devices)
        self._enable_cp = enable_cp
        self._meshes: dict[int, Mesh] = {}
        n = len(self._devices)
        sp = 1
        while sp <= n:
            dp = n // sp
            self._meshes[sp] = build_mesh(
                ParallelConfig(dp_size=dp, cp_size=1, sp_size=sp), self._devices
            )
            sp *= 2

    @property
    def sp_sizes(self) -> list[int]:
        return sorted(self._meshes)

    def mesh_for_sp(self, sp_size: int) -> Mesh:
        if sp_size not in self._meshes:
            raise KeyError(f"sp_size {sp_size} not in pool {self.sp_sizes}")
        return self._meshes[sp_size]


def set_distributed_state(distributed_profile: bool = False):
    """Environment bootstrap mirroring the reference `set_distributed_state`
    (parallel_mgr.py:120-148): RANK/WORLD_SIZE (torchrun-style) or
    OMPI_COMM_WORLD_* (OpenMPI) envs resolve (rank, world_size, node_rank,
    node_size); ``distributed_profile`` rewrites a multi-node launch into
    independent single-node instances for the fast DCP profile phase.

    On TPU pods jax.distributed.initialize() auto-detects the topology, so
    this is only needed when launching through a generic scheduler that
    exports the torch-style variables. Returns the parsed tuple and, when a
    coordinator is resolvable (MASTER_ADDR[:MASTER_PORT]) and world_size > 1,
    initializes the JAX distributed runtime."""
    import os

    rank = int(os.getenv("RANK", os.getenv("OMPI_COMM_WORLD_RANK", "-1")))
    world_size = int(os.getenv("WORLD_SIZE",
                               os.getenv("OMPI_COMM_WORLD_SIZE", "-1")))
    node_rank = int(os.getenv("NODE_RANK",
                              os.getenv("OMPI_COMM_WORLD_NODE_RANK", "0")))
    node_size = int(os.getenv("NNODES", "1"))

    if distributed_profile and world_size > 0:
        # one independent instance per node (fast profile, :128-146); each
        # node profiles the bucket space locally with its own device count
        device_count = max(1, len(jax.devices()))
        node_rank = rank // device_count if device_count else 0
        node_size = max(1, world_size // device_count)
        rank, world_size = rank % device_count, device_count
        os.environ.update(NNODES="1", NODE_RANK="0", RANK=str(rank),
                          WORLD_SIZE=str(world_size), MASTER_ADDR="localhost")

    master = os.getenv("MASTER_ADDR")
    if world_size > 1 and master and not distributed_profile:
        if rank < 0:
            raise RuntimeError(
                "set_distributed_state: WORLD_SIZE/MASTER_ADDR are set but no "
                "rank env var was found — export RANK (torchrun-style) or "
                "OMPI_COMM_WORLD_RANK (OpenMPI) so the JAX distributed "
                "runtime gets a valid process_id")
        port = os.getenv("MASTER_PORT", "8476")
        jax.distributed.initialize(coordinator_address=f"{master}:{port}",
                                   num_processes=world_size, process_id=rank)
    return rank, world_size, node_rank, node_size


def initialize(rank: int = 0, world_size: int = 1,
               coordinator_address: str | None = None, seed: int | None = None):
    """Public-API parity with `videosys.initialize`
    (core/distributed/parallel_mgr.py:103-117). On TPU there is no NCCL
    process group to create: single-host SPMD needs nothing, and multi-host
    pods initialize the JAX distributed runtime instead. Optionally seeds
    numpy for host-side randomness (the reference's set_seed analog)."""
    if world_size > 1 and coordinator_address:
        import jax

        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=world_size, process_id=rank)
    if seed is not None:
        # host-side RNGs only: device-side randomness flows through explicit
        # jax.random keys derived from each generate()/training seed argument
        # (pipelines fold the seed; this does NOT set those)
        import random as _random

        import numpy as _np

        _np.random.seed(seed)
        _random.seed(seed)
