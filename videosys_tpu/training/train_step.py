"""Training step: rflow loss + AdamW, mesh-sharded.

Behavioral reference: `examples/training/open_sora/train.py:38-446` (loss at
:356 via RFlowScheduler.training_losses, ZeRO-1 via DeepSpeed :227-246,
grad checkpointing via auto_recompute). TPU-native redesign:

* optax AdamW; ZeRO-1 == sharding the optimizer state over the dp axis
  (a sharding rule, not a runtime system);
* gradient checkpointing == `remat=True` on the scanned STDiT3 block pairs;
* dp gradient reduction comes from jit + batch sharding (XLA inserts the
  reduce-scatter/all-reduce over the dp axis).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from videosys_tpu.core import parallel as par
from videosys_tpu.models.transformers.stdit3 import STDiT3, STDiT3Config
from videosys_tpu.schedulers.rflow import RFlowConfig, RFlowScheduler


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda aux, c: TrainState(*c),
)


def _pin_grads_replicated(grads):
    """Pin weight gradients to REPLICATED at the AD boundary.

    Without this, the ZeRO-1 moment sharding (e.g. a kernel's C dim split
    over all devices, `zero1_shardings`) propagates backward from
    `tx.update` through the dW matmuls into the activation cotangents —
    GSPMD then wants [B,T,S,C] activations resharded from their forward
    (dp/sp) layout to C-sharded, hits the reshape it cannot repartition, and
    falls back to "involuntary full rematerialization" (full replication of
    the activation; the MULTICHIP_r02 warnings). Pinning dW replicated means
    the backward produces partial row-shard sums + one all-reduce (the
    natural dp/sp gradient reduction) and the moment update takes a free
    local slice of the replicated grad. Cost vs ideal reduce-scatter: one
    extra all-gather of param bytes per step; benefit: no replication cliff
    in the model backward."""
    mesh = par.active_mesh()
    if mesh is None or mesh.devices.size == 1:
        return grads
    repl = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda g: jax.lax.with_sharding_constraint(g, repl), grads)


def _shard_grads_zero1(grads):
    """Constrain weight gradients to the ZeRO-1 moment layout at the AD
    boundary — toward the reference's ``reduce_scatter: true`` DeepSpeed
    config (examples/training/open_sora/train.py:231-239).

    Measured A/B on the dp2xsp4 fake 8-device mesh (XL-width depth-4
    2s/480p train-step compile) vs the round-3 replicated pin:

    * compiles CLEAN — no "Involuntary full rematerialization" partitioner
      fallback at either tiny or XL-width shapes (the r2 cliff that forced
      the replicated pin does not reproduce with a direct tiled constraint
      on current XLA; regression-gated by tests/test_parallel.py);
    * temp memory 9.15 -> 8.59 GiB; all-reduce bytes 814.7 -> 772.1 MB;
      grads land already sliced into the moment layout, so the AdamW update
      reads local shards with no resharding copy.

    Honest limit (measured, not assumed): a FULL all-reduce ->
    reduce-scatter conversion of the dW reduction does NOT materialize.
    The transformer grads are per-layer stacked outputs of the backward
    `nn.scan`, so their dp/sp reduction is emitted inside the scan body
    where a boundary constraint cannot reach; XLA does not rewrite those
    body all-reduces into reduce-scatters against an outside slice. The
    remaining gap vs DeepSpeed's reduce-scatter is ~grad-bytes x (1-1/N)
    of link traffic on the dp axis; closing it requires sharding the dW
    scan outputs themselves (ZeRO-3-style param partitioning), which
    trades a forward param all-gather for it — documented in
    docs/performance.md (Training)."""
    mesh = par.active_mesh()
    if mesh is None or mesh.devices.size == 1:
        return grads
    shard_of = zero1_leaf_sharding(mesh)
    return jax.tree.map(
        lambda g: jax.lax.with_sharding_constraint(g, shard_of(g)), grads)


def _pin_params_zero3(params):
    """Pin updated params to the thresholded ZeRO-3 layout
    (`zero3_shardings`): kernels stay 1/N-sliced, small leaves replicated."""
    mesh = par.active_mesh()
    if mesh is None or mesh.devices.size == 1:
        return params
    shard_of = _zero3_param_leaf_sharding(mesh)
    return jax.tree.map(
        lambda p: jax.lax.with_sharding_constraint(p, shard_of(p)), params)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.0,
                   warmup_steps: int = 1000, grad_clip: Optional[float] = None,
                   decay_steps: Optional[int] = None,
                   lr_min_ratio: float = 0.1):
    """AdamW with linear warmup (training/lr_schedulers/linear_warmup_open_sora.py:4
    + train.py AdamW betas/eps defaults). With ``decay_steps`` the post-warmup
    LR follows a cosine from ``lr`` down to ``lr * lr_min_ratio`` — an
    extension past the reference's warmup-only scheduler inventory for runs
    that must converge tightly (e.g. the PAB quality-protocol fits)."""
    if decay_steps:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, max(decay_steps, warmup_steps + 1),
            end_value=lr * lr_min_ratio)
    else:
        sched = optax.linear_schedule(0.0, lr, warmup_steps)
    tx = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=weight_decay)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def create_train_state(params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def _make_loss_fn(model: STDiT3, scheduler: RFlowScheduler,
                  height: float, width: float, num_frames,
                  class_dropout_prob: float):
    """rflow loss with caption dropout: with prob `class_dropout_prob` a
    sample's caption rows are replaced by the learned null embedding
    (reference token_drop, embeddings.py:210-226 via class_dropout_prob=0.1,
    open_sora_transformer_3d.py:331,403) — this trains `y_embedder.
    y_embedding`, which CFG inference uses as the uncond branch."""

    def loss_fn(params, rng, batch):
        y = batch["y"]
        if class_dropout_prob > 0:
            rng, dkey = jax.random.split(rng)
            drop = jax.random.bernoulli(dkey, class_dropout_prob,
                                        (y.shape[0],))
            y_null = params["params"]["y_embedder"]["y_embedding"]
            y = jnp.where(drop[:, None, None],
                          y_null[None, : y.shape[1]].astype(y.dtype), y)

        def model_fn(x_t, t, **kw):
            return model.apply(params, x_t, t, y,
                               kv_mask=batch.get("kv_mask"),
                               x_mask=batch.get("mask"),
                               fps=batch["fps"], height=height, width=width)

        losses = scheduler.training_losses(
            model_fn, rng, batch["x"], mask=batch.get("mask"),
            height=height, width=width, num_frames=num_frames)
        return losses.mean()

    return loss_fn


def make_train_step(model: STDiT3, scheduler: RFlowScheduler, tx,
                    height: float, width: float,
                    num_frames: Optional[int] = None, gas: int = 1,
                    class_dropout_prob: float = 0.1, zero3: bool = False):
    """Returns a jittable (state, rng, batch) -> (state, metrics) function.

    batch: dict(x [B,C,T,H,W] latents, y [B,L,Dc], kv_mask [B,L], fps [B],
    optional mask [B,T]). With ``gas > 1`` every batch array instead carries a
    leading gradient-accumulation axis [gas, B, ...]; grads are averaged over
    the micro-batches inside one jitted call and the optimizer steps ONCE —
    matching the reference's DeepSpeed accumulation boundary
    (core/dcp/profiler.py:824-834, boundary at gas == total_gas-1).

    ``num_frames`` is the bucket's *pixel* frame count, required when the
    scheduler warps training timesteps (use_timestep_transform).

    ``zero3=True`` keeps the PARAMS device-sharded in the ZeRO-1 moment
    layout too (pass `zero3_shardings` as the state sharding): the forward
    all-gathers each stacked scan-layer's weights inside the scan body, and
    the transposed op in the backward is a reduce-scatter of dW into the
    sharded layout — the scan-body all-reduce that a boundary constraint
    cannot reach under ZeRO-1 (see `_shard_grads_zero1`'s honest-limit note)
    becomes a reduce-scatter by construction, matching the reference's
    DeepSpeed `reduce_scatter: true` (train.py:231-239) at ZeRO-3 semantics
    (param partitioning + forward all-gather)."""

    loss_fn = _make_loss_fn(model, scheduler, height, width, num_frames,
                            class_dropout_prob)
    grad_fn = jax.value_and_grad(loss_fn)
    pin_params = _pin_params_zero3 if zero3 else _pin_grads_replicated

    def train_step(state: TrainState, rng, batch):
        if gas == 1:
            loss, grads = grad_fn(state.params, rng, batch)
            grads = _shard_grads_zero1(grads)
        else:
            def micro(carry, inp):
                acc = carry
                key, mb = inp
                l, g = grad_fn(state.params, key, mb)
                # accumulate in the sharded layout: each micro-batch's grads
                # reduce-scatter once and the running sum stays 1/N-sized
                return jax.tree.map(jnp.add, acc, _shard_grads_zero1(g)), l

            keys = jax.random.split(rng, gas)
            zeros = jax.tree.map(jnp.zeros_like, state.params)
            zeros = _shard_grads_zero1(zeros)
            acc, losses = jax.lax.scan(micro, zeros, (keys, batch))
            grads = jax.tree.map(lambda g: g / gas, acc)
            loss = losses.mean()
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # ZeRO-1: params stay replicated (shard only optimizer state) — this
        # constraint is the one param-bytes all-gather DeepSpeed also pays.
        # ZeRO-3: params stay sliced in the moment layout; the elementwise
        # update runs fully local and the forward re-gathers lazily per layer.
        new_params = pin_params(new_params)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(new_params, new_opt, state.step + 1),
            {"loss": loss, "grad_norm": gnorm},
        )

    return train_step


def make_grad_step(model: STDiT3, scheduler: RFlowScheduler,
                   height: float, width: float, num_frames: int,
                   class_dropout_prob: float = 0.1):
    """(params, rng, batch) -> (loss, grads): the gradient half of a step,
    used by sp-balance mode (training/train.py) where the plans packed into
    one GlobalStep accumulate grads before a single optimizer update —
    numerically identical to the reference's concurrent packed step whose
    DeepSpeed all-reduce spans every rank group (sampler.py:576-871 +
    train.py:362-364)."""

    loss_fn = _make_loss_fn(model, scheduler, height, width, num_frames,
                            class_dropout_prob)
    vg = jax.value_and_grad(loss_fn)

    def grad_step(params, rng, batch):
        loss, grads = vg(params, rng, batch)
        # sp-balance accumulates these grads ACROSS plans compiled under
        # different MeshPool meshes; replicated is the one layout trivially
        # identical across them (sharded accumulation across distinct Mesh
        # objects is an untested resharding surface — keep the pin here)
        return loss, _pin_grads_replicated(grads)

    return grad_step


def make_apply_step(tx):
    """(state, grads, n_plans) -> (state, metrics): averaged-grad optimizer
    update closing one GlobalStep."""

    def apply_step(state: TrainState, grads, n_plans):
        grads = jax.tree.map(lambda g: g / n_plans, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (TrainState(new_params, new_opt, state.step + 1),
                {"grad_norm": optax.global_norm(grads)})

    return apply_step


def zero1_shardings(mesh, state: TrainState):
    """ZeRO-1: shard the AdamW moments on each tensor's largest divisible
    dimension; params stay replicated (matches DeepSpeed stage-1 semantics,
    train.py:231-239).

    Moments are sharded over the COMBINED (dp, cp, sp) axes — i.e. over all
    devices — rather than dp alone: more shards means less HBM per chip, the
    update math is elementwise so any partition is valid, and because every
    mesh in a `MeshPool` flattens the same device list in the same order,
    this sharding is physically identical across pool meshes — dynamic-sp
    mesh switches move zero optimizer bytes. Tensors with no dim divisible
    by the full device count fall back to the largest divisible axis-name
    prefix (dp*cp, then dp); only then replicate."""

    opt_shard = zero1_leaf_sharding(mesh)
    replicated = NamedSharding(mesh, P())
    param_sh = jax.tree.map(lambda _: replicated, state.params)
    opt_sh = jax.tree.map(opt_shard, state.opt_state)
    return TrainState(param_sh, opt_sh, replicated)


# Only param leaves at least this large are sharded under ZeRO-3. The big
# matmul kernels hold ~all param bytes; sharding the small leaves too
# (biases, norms, [6,C] modulation tables) buys nothing and trips GSPMD's
# "involuntary full rematerialization" fallback on their stat-sized uses
# inside the scan body (observed on the dp2xsp4 fake mesh).
ZERO3_MIN_SHARD_BYTES = 1 << 16


def _zero3_param_leaf_sharding(mesh, min_shard_bytes=ZERO3_MIN_SHARD_BYTES):
    shard_of = zero1_leaf_sharding(mesh)
    replicated = NamedSharding(mesh, P())

    def param_shard(x):
        # bytes from shape/dtype, not .nbytes: ShapeDtypeStruct leaves (the
        # AOT-compile path) must classify identically to concrete arrays
        if not hasattr(x, "shape") or not hasattr(x, "dtype"):
            return replicated
        nbytes = int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize
        if nbytes < min_shard_bytes:
            return replicated
        return shard_of(x)

    return param_shard


def zero3_shardings(mesh, state: TrainState,
                    min_shard_bytes=ZERO3_MIN_SHARD_BYTES):
    """ZeRO-3: shard PARAMS (leaves >= min_shard_bytes — the matmul kernels,
    which hold ~all the bytes) in the `zero1_leaf_sharding` layout, moments
    as under ZeRO-1 (reference semantics: DeepSpeed stage-3 param
    partitioning; behavior target is its stage-1 `reduce_scatter: true`,
    train.py:231-239, which ZeRO-1 + boundary constraints cannot express for
    scan-body dW — see `make_train_step(zero3=True)`).

    Per-chip cost model vs `zero1_shardings` on an N-device mesh:
    param HBM P -> ~P/N (frees ~(1-1/N)P); dp grad traffic: the scan-body dW
    all-reduce (2(1-1/N)P per step) becomes a reduce-scatter ((1-1/N)P) plus
    per-layer weight all-gathers in forward/backward ((1-1/N)P each, emitted
    inside the scan body where they overlap that layer's compute). Measured
    A/B: tests/test_parallel.py::test_zero3_param_partitioning and
    the MULTICHIP dryrun artifact's zero3 leg."""
    param_shard = _zero3_param_leaf_sharding(mesh, min_shard_bytes)
    opt_shard = zero1_leaf_sharding(mesh)
    return TrainState(jax.tree.map(param_shard, state.params),
                      jax.tree.map(opt_shard, state.opt_state),
                      NamedSharding(mesh, P()))


def zero1_leaf_sharding(mesh):
    """leaf -> NamedSharding chooser behind `zero1_shardings`, shared with
    the gradient reduce-scatter (`_shard_grads_zero1`) so grads land in
    EXACTLY the moment layout (any mismatch would cost a resharding copy)."""
    axes = tuple(mesh.axis_names)
    replicated = NamedSharding(mesh, P())

    # axis-name prefixes with their device-count products, largest first:
    # (dp,cp,sp)=all devices, then (dp,cp), then (dp,). A tensor that cannot
    # shard over the full device count still sheds 1/prefix of its bytes.
    prefixes = []
    prod = 1
    for ax, size in zip(axes, mesh.devices.shape):
        prod *= size
        prefixes.append((prod, tuple(axes[: len(prefixes) + 1])))
    prefixes = [(p, names) for p, names in reversed(prefixes) if p > 1]

    def opt_shard(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return replicated
        # prefer the largest dim divisible by the full device count; fall
        # back to any dim divisible by a prefix product of mesh axes
        dims = sorted(range(x.ndim), key=lambda a: -x.shape[a])
        for p, names in prefixes:
            for axis in dims:
                if x.shape[axis] % p == 0 and x.shape[axis] >= p:
                    spec = [None] * x.ndim
                    spec[axis] = names
                    return NamedSharding(mesh, P(*spec))
        return replicated

    return opt_shard


def zero1_sharded_fraction(mesh, state: TrainState) -> float:
    """Fraction of optimizer-state bytes that `zero1_shardings` actually
    shards (vs replicates) — observability for the ZeRO-1 coverage claim
    (a "some moment is sharded" test is not an accounting)."""
    sh = zero1_shardings(mesh, state).opt_state
    total = sharded = 0
    for leaf, s in zip(jax.tree.leaves(state.opt_state),
                       jax.tree.leaves(sh, is_leaf=lambda x: isinstance(x, NamedSharding))):
        if not hasattr(leaf, "nbytes") or getattr(leaf, "ndim", 0) == 0:
            continue
        total += leaf.nbytes
        if s.spec != P():
            sharded += leaf.nbytes
    return sharded / total if total else 0.0
