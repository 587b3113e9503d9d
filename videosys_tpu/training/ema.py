"""Distributed-friendly EMA.

Behavioral reference: `videosys/training/ema_distributed.py:8-64` — the
reference stores EMA as per-rank fp32 ZeRO fragments and gathers only at
checkpoint time. Under JAX the same behavior is a sharding rule: keep the EMA
pytree device_put with a dp-sharded layout; `update_ema` is a pure pytree op
that jit compiles to a fully local (no-communication) update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def update_ema(ema_params, params, decay: float = 0.9999):
    """ema <- decay*ema + (1-decay)*params, elementwise in fp32
    (ema_distributed.py:8-33)."""
    return jax.tree.map(
        lambda e, p: (decay * e + (1.0 - decay) * p.astype(e.dtype)).astype(e.dtype),
        ema_params, params,
    )


def init_ema(params):
    """fp32 copy of params (train.py:118-121 deepcopy + fp32 fragments).

    Must be a real copy: the train step donates its state argument, so an
    aliased buffer here would be deleted after the first step."""
    return jax.tree.map(lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params)


def shard_ema(mesh, ema_params):
    """ZeRO-style dp-sharding of the EMA pytree (ema_sharding :35-49):
    each tensor's largest dp-divisible axis is sharded over dp."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from videosys_tpu.core import parallel as par

    dp = par.mesh_axis_size(mesh, par.DP_AXIS)
    replicated = NamedSharding(mesh, P())

    def rule(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return replicated
        for axis, size in enumerate(x.shape):
            if size % dp == 0 and size >= dp:
                spec = [None] * x.ndim
                spec[axis] = par.DP_AXIS
                return NamedSharding(mesh, P(*spec))
        return replicated

    shardings = jax.tree.map(rule, ema_params)
    return jax.device_put(ema_params, shardings)


def gather_ema(ema_params):
    """Fully replicate for checkpointing (ema_gathering :51-64)."""
    return jax.tree.map(lambda x: jax.device_get(x), ema_params)
