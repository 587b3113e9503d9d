"""DCP (Data-Centric Parallel) profiler — TPU-native.

Behavioral reference: `videosys/core/dcp/profiler.py` (Profiler :157-903 —
two-phase profile run with bs-doubling until OOM :498-764, sp escalation
:651-708, extrapolation from 2 layers :785-797, dynamics selection :799-822)
and `core/dcp/recompute.py` (timing hooks).

TPU redesign (SURVEY.md §2.5 plan): the reference inserts autograd timing
hooks and extrapolates from a truncated model because a CUDA profile run is
expensive and OOM-fragile. Under XLA we get both costs WITHOUT running:
`jit(...).lower(...).compile()` exposes a memory analysis (exact HBM plan)
and a cost analysis (FLOPs); OOM is a static memory check against the chip
budget, and wall time can additionally be measured by running the compiled
executable on synthetic data. `optimize_dynamics` then picks, per bucket:
* the smallest sp whose memory plan fits (doubling like :651-708);
* the bs ladder (doubling like the reference's plan) and gas for balance.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)

from videosys_tpu.training.buckets import Bucket, BucketId
from videosys_tpu.training.sampler import DCPPlanner


def _sync(out) -> None:
    """Completion barrier for wall-time measurement. On tunneled backends
    (axon) `jax.block_until_ready` returns immediately (docs/performance.md
    "Method"); fetching an output leaf to the host is the reliable barrier —
    the smallest leaf, so the D2H itself stays negligible."""
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "size")]
    if leaves:
        jax.device_get(min(leaves, key=lambda l: l.size))


@dataclasses.dataclass
class BucketProfile:
    bucket_id: BucketId
    bs: int
    sp: int
    time: float            # seconds per step (measured or estimated)
    memory_bytes: int      # compiled HBM plan
    flops: float
    fits: bool
    remat_policy: str = "full"


class Profiler:
    """Per-bucket profiling of a compiled train step.

    `step_builder(thw, bs, sp) -> (jitted_fn, example_args)` must return the
    train step specialized to one bucket shape (the caller owns model/mesh
    construction so dynamic-sp uses a MeshPool on real hardware). The fn
    should be jitted with the SAME donation as the production loop
    (donate_argnums=(0,)): the memory analysis then reflects the
    input/output aliasing the real training step gets — without it the
    plan double-counts the train state (in + out resident at once) and the
    profiler escalates sp/remat far too early. Wall-time measurement
    rebuilds fresh example args via the builder for each executed call, so
    donation is safe.
    """

    def __init__(
        self,
        bucket: Bucket,
        step_builder: Callable,
        memory_budget_bytes: Optional[int] = None,
        sp_candidates: Tuple[int, ...] = (1,),
        measure_wall_time: bool = True,
        alloc_memory_fraction: float = 0.92,
        remat_candidates: Tuple[str, ...] = ("full",),
        bs_escalate: bool = True,
        max_bs: int = 128,
    ):
        self.bucket = bucket
        self.step_builder = step_builder
        if memory_budget_bytes is None:
            try:
                stats = jax.devices()[0].memory_stats() or {}
                memory_budget_bytes = int(stats.get("bytes_limit", 16 << 30))
            except Exception:
                memory_budget_bytes = 16 << 30
        # The reference caps at 0.70 to avoid a CUDA-allocator OOM <->
        # collective deadlock class (profiler.py:500-503 / train.py:500-504).
        # That class does not exist here: the compiled XLA memory plan is
        # EXACT (no fragmentation, no trial allocation), so the margin only
        # needs to cover runtime scratch — 8% measured-safe on v5e. The old
        # 0.70 left a 1.2B-param model unable to escalate bs at all
        # (13.8 GiB args+opt vs an 11.2 GiB budget on a 16 GiB chip).
        self.memory_budget = int(memory_budget_bytes * alloc_memory_fraction)
        self.sp_candidates = tuple(sorted(sp_candidates))
        # recompute escalation (reference dynamic_recompute analog): listed
        # least-recompute-first; only consulted if step_builder accepts a
        # `policy` kwarg
        import inspect

        self.remat_candidates = tuple(remat_candidates)
        try:
            self._builder_takes_policy = (
                "policy" in inspect.signature(step_builder).parameters)
        except (TypeError, ValueError):
            self._builder_takes_policy = False
        self.measure_wall_time = measure_wall_time
        # bs ladder: after a (sp, policy) fit is found, keep DOUBLING bs
        # while the compiled memory plan still fits (reference bs-doubling
        # until OOM, profiler.py:498-764) — per-bucket max-batch discovery
        # is half of DCP's training win
        self.bs_escalate = bs_escalate
        self.max_bs = max_bs
        self.results: Dict[BucketId, BucketProfile] = {}
        self.failures: list[dict] = []

    # ------------------------------------------------------------------ #
    def _analyze(self, thw, bs: int, sp: int,
                 policy: str = "full") -> Tuple[int, float, object, tuple]:
        if self._builder_takes_policy:
            fn, args = self.step_builder(thw, bs, sp, policy=policy)
        else:
            fn, args = self.step_builder(thw, bs, sp)
        lowered = jax.jit(fn) if not hasattr(fn, "lower") else fn
        compiled = lowered.lower(*args).compile()
        mem = compiled.memory_analysis()
        mem_bytes = 0
        if mem is not None:
            # resident = args + outputs + temps + code MINUS the
            # donation-aliased bytes (a donated output reuses its input
            # buffer; without the subtraction a donated train step
            # double-counts the whole train state)
            mem_bytes = int(
                getattr(mem, "temp_size_in_bytes", 0)
                + getattr(mem, "argument_size_in_bytes", 0)
                + getattr(mem, "output_size_in_bytes", 0)
                + getattr(mem, "generated_code_size_in_bytes", 0)
                - getattr(mem, "alias_size_in_bytes", 0)
            )
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        flops = float((cost or {}).get("flops", 0.0))
        return mem_bytes, flops, compiled, args

    def _measure(self, compiled, args, thw, bs, sp, policy) -> float:
        """One warmed wall-time measurement. The warmup call may CONSUME
        `args` (donation), so fresh example args are rebuilt through the
        step_builder for the timed call; outputs are dropped immediately so
        at most one train state is resident per phase."""
        _sync(compiled(*args))  # warmup (donates args)
        if self._builder_takes_policy:
            _, args = self.step_builder(thw, bs, sp, policy=policy)
        else:
            _, args = self.step_builder(thw, bs, sp)
        t0 = time.perf_counter()
        _sync(compiled(*args))
        return time.perf_counter() - t0

    def profile_bucket(self, bucket_id: BucketId, bs: int) -> BucketProfile:
        """Escalate sp (x2, :651-708) until the compiled memory plan fits.
        A candidate whose step fails to BUILD/COMPILE is reported (not
        silently swallowed — advisor r1 finding) in `self.failures` and the
        log, then skipped."""
        thw = self.bucket.get_thw(bucket_id)
        policies = (self.remat_candidates
                    if self._builder_takes_policy else ("full",))
        last = None
        for sp in self.sp_candidates:
            for policy in policies:
                try:
                    mem_bytes, flops, compiled, args = self._analyze(
                        thw, bs, sp, policy)
                except Exception as e:
                    self.failures.append(
                        {"bucket": bucket_id, "bs": bs, "sp": sp,
                         "policy": policy,
                         "error": f"{type(e).__name__}: {e}"})
                    logger.warning(
                        "DCP profile failed for bucket=%s bs=%d sp=%d "
                        "policy=%s: %s", bucket_id, bs, sp, policy, e)
                    continue
                fits = mem_bytes <= self.memory_budget
                t = flops / 1e12  # crude prior, refined below
                if fits and self.measure_wall_time:
                    try:
                        t = self._measure(compiled, args, thw, bs, sp,
                                          policy)
                    except Exception as e:
                        # static plan fit but execution exhausted the chip
                        # (runtime scratch beyond the margin): treat as a
                        # non-fit, like the reference's CUDA OOM catch
                        fits = False
                        self.failures.append(
                            {"bucket": bucket_id, "bs": bs, "sp": sp,
                             "policy": policy, "phase": "execute",
                             "error": f"{type(e).__name__}: {e}"})
                compiled = args = None  # free this candidate's HBM
                last = BucketProfile(bucket_id, bs, sp, t, mem_bytes, flops,
                                     fits, policy)
                if fits:
                    break
            if last is not None and last.fits:
                break
        if last is None:
            last = BucketProfile(bucket_id, bs, self.sp_candidates[0],
                                 float("inf"), 0, 0.0, False,
                                 policies[-1])
        if last.fits and self.bs_escalate:
            last = self._escalate_bs(thw, last)
        self.results[bucket_id] = last
        return last

    def _escalate_bs(self, thw, prof: BucketProfile) -> BucketProfile:
        """Double bs at the fitting (sp, policy) while the compiled plan
        fits the budget. The fit decision is the static memory plan (exact,
        unlike the reference's CUDA OOM-catch ladder); execution happens
        only to measure wall time, and a runtime failure there keeps the
        last rung that ran."""
        best = prof
        bs = prof.bs * 2
        while bs <= self.max_bs:
            try:
                mem_bytes, flops, compiled, args = self._analyze(
                    thw, bs, prof.sp, prof.remat_policy)
            except Exception as e:
                self.failures.append(
                    {"bucket": prof.bucket_id, "bs": bs, "sp": prof.sp,
                     "policy": prof.remat_policy,
                     "error": f"{type(e).__name__}: {e}"})
                break
            if mem_bytes > self.memory_budget:
                break
            t = flops / 1e12
            if self.measure_wall_time:
                try:
                    t = self._measure(compiled, args, thw, bs,
                                      prof.sp, prof.remat_policy)
                except Exception as e:
                    self.failures.append(
                        {"bucket": prof.bucket_id, "bs": bs, "sp": prof.sp,
                         "policy": prof.remat_policy, "phase": "execute",
                         "error": f"{type(e).__name__}: {e}"})
                    break  # keep the last rung that actually ran
            compiled = args = None  # free before the next ladder rung
            best = BucketProfile(prof.bucket_id, bs, prof.sp, t, mem_bytes,
                                 flops, True, prof.remat_policy)
            bs *= 2
        if best.bs != prof.bs:
            logger.info("DCP bs ladder: bucket=%s bs %d -> %d (mem %.2f GiB)",
                        prof.bucket_id, prof.bs, best.bs,
                        best.memory_bytes / 2**30)
        return best

    def profile_all(self) -> Dict[BucketId, BucketProfile]:
        for hw_id, t_probs in self.bucket.bucket_probs.items():
            for t_id in t_probs:
                ar_id = next(iter(self.bucket.ar_criteria[hw_id]))
                bid = (hw_id, t_id, ar_id)
                bs = max(1, self.bucket.get_batch_size(bid))
                self.profile_bucket(bid, bs)
        return self.results

    # ------------------------------------------------------------------ #
    def make_planner(self) -> DCPPlanner:
        """Convert profiles into the sampler's (sp, gas) planner
        (optimize_dynamics :799-822: balance every step to the slowest
        bucket's step time)."""
        profile = {
            bid: {"time": p.time, "sp": p.sp, "remat_policy": p.remat_policy,
                  "bs": p.bs}
            for bid, p in self.results.items() if p.fits
        }
        target = max((p["time"] for p in profile.values()), default=None)
        return DCPPlanner(profile=profile, target_time=target)

    def dump(self) -> dict:
        out = {
            str(bid): dataclasses.asdict(p) for bid, p in self.results.items()
        }
        if self.failures:
            out["_failures"] = [dict(f, bucket=str(f["bucket"]))
                                for f in self.failures]
        return out
