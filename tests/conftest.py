"""Test configuration: force an 8-device CPU backend before JAX initializes.

Mirrors SURVEY.md §4's implication: unlike the reference (whose distributed
tests require real GPUs), every sharding/collective path here is unit-testable
on a fake multi-device CPU backend.

Note: the sandbox's sitecustomize pre-imports jax._src, so environment
variables are too late — use jax.config.update instead (still before any
backend is initialized because no test has run yet).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent XLA compilation cache: the suite's wall time is dominated by
# compiles (depth-shaped scans, per-plan PAB variants); caching them across
# runs makes repeat/CI invocations several times faster.
_cache_dir = os.environ.get(
    "VIDEOSYS_TEST_CACHE", os.path.join(os.path.dirname(__file__),
                                        ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
