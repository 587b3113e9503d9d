"""Checkpoint / resume for training.

Behavioral reference: `videosys/training/ckpt_io.py:20-89` — a checkpoint dir
`epoch{E}-global_step{S}/` holding model+EMA+optimizer, sampler state, and
`running_states.json`. Re-landed on orbax: one StandardCheckpointer save of
the whole train-state pytree plus a JSON sidecar.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple


def save(
    path: str,
    train_state: Any,
    ema_params: Any,
    epoch: int,
    step: int,
    sampler_state: Optional[dict] = None,
    extra: Optional[dict] = None,
) -> str:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(
        os.path.join(path, f"epoch{epoch}-global_step{step}"))
    os.makedirs(ckpt_dir, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(ckpt_dir, "state"),
              {"train_state": train_state, "ema": ema_params})
    ckpt.wait_until_finished()
    running = {"epoch": epoch, "step": step,
               "sampler": sampler_state, **(extra or {})}
    with open(os.path.join(ckpt_dir, "running_states.json"), "w") as f:
        json.dump(running, f)
    return ckpt_dir


def load(path: str, abstract_state: Any) -> Tuple[Any, Any, int, int, Optional[dict]]:
    """Restore (train_state, ema, epoch, step, sampler_state)
    (ckpt_io.py:61-84)."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.join(os.path.abspath(path), "state"),
                            abstract_state)
    with open(os.path.join(path, "running_states.json")) as f:
        running = json.load(f)
    return (restored["train_state"], restored["ema"],
            running["epoch"], running["step"], running.get("sampler"))
