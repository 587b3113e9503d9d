"""Bisect the scan-L>=8 TPU runtime fault (VERDICT r4 Next #7).

The fault: jax.lax.scan over the CFG denoise step at B=2/480p with scan
length >= 8 reproducibly kills the TPU runtime ("TPU worker process
crashed", no OOM). Single steps, the attention kernels at the same shapes,
scan L=2, and 240p B=2 L=30 are all fine (docs/performance.md "Batched
multi-prompt serving"). The pipeline works around it with per-step dispatch
for B>1 and a >64k-token fallback (pipeline_open_sora.py).

This driver runs experiments/scan_fault_repro.py as a SUBPROCESS per config
(a crash kills the child, not the sweep) over the bisection axes:

  * scan length: 2 / 4 / 6 / 8 — where exactly is the threshold?
  * attention path: Pallas flash kernel vs XLA reference attention
    (VIDEOSYS_FORCE_FLASH=0) — is the fault in the kernel-under-scan?
  * XLA knobs: latency-hiding scheduler off, smaller scoped VMEM.

Writes a ledger to docs/scan_fault_bisect.json. Run LAST in a TPU session:
a reproduced crash can leave the tunneled worker restarting for minutes.

Run:  python experiments/scan_fault_bisect.py [--out docs/scan_fault_bisect.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # (label, scan_len, extra_env)
    ("L2_flash", 2, {}),
    ("L4_flash", 4, {}),
    ("L6_flash", 6, {}),
    ("L8_flash", 8, {}),
    ("L8_xla_attn", 8, {"VIDEOSYS_FORCE_FLASH": "0"}),
    ("L8_flash_no_lhs", 8,
     {"XLA_FLAGS": "--xla_tpu_enable_latency_hiding_scheduler=false"}),
    ("L8_flash_vmem32m", 8,
     {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=32768"}),
]


def run_one(label: str, scan_len: int, env_extra: dict, timeout_s: int):
    env = dict(os.environ)
    env.update(env_extra)
    cmd = [sys.executable, os.path.join(REPO, "experiments",
                                        "scan_fault_repro.py"),
           "--scan-len", str(scan_len)]
    t0 = time.time()
    try:
        p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=timeout_s, cwd=REPO)
        ok = p.returncode == 0 and "SCAN OK" in p.stdout
        tail = (p.stdout + p.stderr)[-400:]
        status = "ok" if ok else "crash"
    except subprocess.TimeoutExpired:
        status, tail = "timeout", ""
    dt = time.time() - t0
    print(f"# {label}: {status} ({dt:.0f}s)", flush=True)
    return {"status": status, "seconds": round(dt, 1),
            "env": env_extra, "scan_len": scan_len,
            **({} if status == "ok" else {"tail": tail})}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/scan_fault_bisect.json")
    ap.add_argument("--timeout", type=int, default=1500,
                    help="per-config wall limit (compile ~5-10 min through "
                         "the tunnel; a wedged post-crash worker can hang)")
    ap.add_argument("--only", default=None,
                    help="comma-separated config labels to run")
    args = ap.parse_args()

    only = set(args.only.split(",")) if args.only else None
    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    for label, n, env_extra in CONFIGS:
        if only and label not in only:
            continue
        results[label] = run_one(label, n, env_extra, args.timeout)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))
    print("BISECT DONE")


if __name__ == "__main__":
    main()
