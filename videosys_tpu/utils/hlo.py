"""Collective-traffic accounting from compiled HLO text.

The DSP design moves activations via exactly two all-to-alls per spatial
attention (docs/dsp.md); everything else should be scalar/stat-sized. This
module turns that claim into a measurable quantity: parse
``jit(f).lower(...).compile().as_text()`` and bucket the bytes each
collective produces. Used by ``tests/test_parallel.py`` as a regression
gate and available for profiling multi-chip builds.

(The reference instruments comm volume ad hoc around its NCCL calls; under
GSPMD the compiled program is the single source of truth, so we read it.)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "f8e4m3fn": 1, "f8e5m2": 1, "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"\b([a-z0-9]+)\[([0-9,]*)\]")

# result shapes sit between "= " and the op name on an HLO instruction line
_COLLECTIVES = ("all-to-all", "all-gather", "all-reduce",
                "collective-permute", "reduce-scatter")


def _shape_bytes(text: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


@dataclass
class CollectiveAccount:
    """Per-op-kind byte/count totals for one compiled HLO module."""

    bytes_by_kind: Dict[str, int] = field(default_factory=dict)
    count_by_kind: Dict[str, int] = field(default_factory=dict)
    lines_by_kind: Dict[str, List[str]] = field(default_factory=dict)

    def bytes(self, kind: str) -> int:
        return self.bytes_by_kind.get(kind, 0)

    def count(self, kind: str) -> int:
        return self.count_by_kind.get(kind, 0)


def collective_account(hlo_text: str) -> CollectiveAccount:
    """Bucket every collective instruction's RESULT bytes by op kind.

    Counts instruction lines of the form ``%name = <shape(s)> <op>(...)``;
    the result shape (possibly a tuple) is what lands in memory on each
    device, which is the right proxy for link traffic per device.
    ``-start``/``-done`` async pairs are collapsed onto the ``-start`` op
    (the ``-done`` carries the same shape and would double count).
    """
    acct = CollectiveAccount()
    for line in hlo_text.splitlines():
        s = line.strip()
        if not s.startswith("%") and " = " not in s:
            continue
        for kind in _COLLECTIVES:
            # match the opcode token, not substrings of e.g. metadata
            m = re.search(rf"\s{re.escape(kind)}(-start)?\(", s)
            if m is None:
                continue
            if re.search(rf"\s{re.escape(kind)}-done\(", s):
                continue
            lhs = s.split(f" {kind}", 1)[0]
            rhs = lhs.split(" = ", 1)[-1]
            acct.bytes_by_kind[kind] = (
                acct.bytes_by_kind.get(kind, 0) + _shape_bytes(rhs))
            acct.count_by_kind[kind] = acct.count_by_kind.get(kind, 0) + 1
            acct.lines_by_kind.setdefault(kind, []).append(s[:200])
            break
    return acct
