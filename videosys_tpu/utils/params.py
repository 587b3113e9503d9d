"""Parameter-tree dtype utilities shared by the inference pipelines."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_float_params(params, dtype, consume: bool = True):
    """Cast fp32 leaves of a param tree to `dtype` (no-op for fp32).

    The reference holds inference weights in half precision (e.g.
    pipeline_open_sora.py:213-229 / pipeline_open_sora_plan.py loading
    torch_dtype=fp16); Flax random-init leaves them fp32. Keeping fp32
    params under a bf16 compute dtype costs double the param HBM *and* a
    full param-bytes cast read every step — on OSP v1.2 (2.7B params) the
    fp32 arguments alone are 10.3 GiB, which compile-OOMs a 16 GiB v5e
    (measured: "arguments 10.33G" in the XLA HBM report). The MXU
    accumulates in fp32 regardless, so bf16 weights are the TPU-native
    inference layout.

    ``consume=True`` (default) deletes each source device buffer as soon
    as its half-precision copy exists, bounding peak HBM at
    fp32-bytes + one leaf instead of fp32-bytes + bf16-bytes — without it
    the cast itself runtime-OOMs on the same 2.7B model (measured)."""
    if dtype == jnp.float32:
        return params
    leaves, treedef = jax.tree.flatten(params)
    out = []
    for x in leaves:
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            y = x.astype(dtype)
            if consume and isinstance(x, jax.Array) and not x.is_deleted():
                jax.block_until_ready(y)
                x.delete()
            x = y
        out.append(x)
    return jax.tree.unflatten(treedef, out)
