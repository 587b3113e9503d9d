"""Timers (reference `videosys/utils/training.py:71-156` Timer/GroupTimer).

The reference's Timer wraps `torch.cuda.synchronize` + wall time + CUDA
memory counters; GroupTimer all-reduces a sync tensor so the reading includes
straggler wait. TPU-native: `jax.block_until_ready` replaces the device sync,
`device.memory_stats()` replaces the CUDA allocator counters, and the group
sync is a tiny psum over the mesh.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    """{bytes_in_use, peak_bytes_in_use, bytes_limit} when the backend
    exposes them (TPU does; CPU returns {})."""
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    return {k: stats[k] for k in
            ("bytes_in_use", "peak_bytes_in_use", "bytes_limit") if k in stats}


class Timer:
    """`with Timer("fwd", log=True) as t: ...` — blocks on `sync_on` (or all
    live arrays via block-until-ready of the passed pytree) at exit."""

    def __init__(self, name: str, log: bool = False, sync_on=None):
        self.name = name
        self.log = log
        self.sync_on = sync_on
        self.elapsed = 0.0
        self.memory: dict = {}

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync_on is not None:
            jax.block_until_ready(self.sync_on)
        self.elapsed = time.perf_counter() - self._t0
        self.memory = device_memory_stats()
        if self.log:
            mem = self.memory.get("peak_bytes_in_use")
            extra = f" peak={mem / 2**30:.2f}GiB" if mem else ""
            print(f"[timer] {self.name}: {self.elapsed:.3f}s{extra}")
        return False


class GroupTimer(Timer):
    """Timer whose exit also runs a cross-device barrier (a 1-element psum
    over every mesh axis) so the measurement includes straggler wait
    (reference GroupTimer all_reduce, utils/training.py:120-148)."""

    def __init__(self, name: str, mesh=None, log: bool = False, sync_on=None):
        super().__init__(name, log=log, sync_on=sync_on)
        self.mesh = mesh

    def __exit__(self, *exc):
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            token = jax.device_put(
                jnp.ones(()), NamedSharding(self.mesh, P()))
            jax.block_until_ready(token + 0)
        return super().__exit__(*exc)


def profile_trace(logdir: str):
    """Context manager: capture a device trace viewable in TensorBoard /
    Perfetto (the TPU-native replacement for the reference's per-module
    TimeStamp instrumentation, core/dcp/recompute.py:80-138)."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        jax.profiler.start_trace(logdir)
        try:
            yield logdir
        finally:
            jax.profiler.stop_trace()

    return ctx()
