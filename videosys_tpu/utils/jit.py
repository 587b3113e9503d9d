"""Cached jax.jit wrappers for bound methods (used by the VAE wrappers whose
codecs would otherwise dispatch op-by-op from the host loop)."""

from __future__ import annotations

import jax


def jit_init(init_fn, *args, **kwargs):
    """Run a flax `.init` (or any pure param builder) as ONE jitted program.

    Eager `.init` dispatches op-by-op: hundreds of sub-second XLA compiles
    per model, re-paid on every process start because each is below the
    persistent-cache time threshold. Under jit the whole init is a single
    program that the persistent compilation cache carries across runs —
    measured ~20s -> ~1s per engine build on the CPU test backend.
    """
    return jax.jit(lambda: init_fn(*args, **kwargs))()


def jit_method(obj, name: str, static_argnums=()):
    """jit `getattr(obj, name)` once per (name, static_argnums, active mesh),
    cached on the instance. jax's own shape cache handles per-shape
    specialization. The ACTIVE MESH is part of the key because sharding
    constraints (e.g. the VAE's par.shard_frames) read it at trace time —
    without it, a traced no-mesh program would be silently reused when the
    same shapes are later run under a mesh (and vice versa)."""
    from videosys_tpu.core import parallel as par

    cache = getattr(obj, "_jit_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(obj, "_jit_cache", cache)
    key = (name, tuple(static_argnums), par.active_mesh())
    if key not in cache:
        cache[key] = jax.jit(getattr(obj, name), static_argnums=static_argnums)
    return cache[key]
