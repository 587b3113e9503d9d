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


def _load_safetensors_dir(path: str) -> Optional[dict]:
    """Read every *.safetensors shard in an HF checkpoint dir into one flat
    numpy state dict (the reference's from_pretrained source format)."""
    import glob

    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        return None
    from safetensors.numpy import load_file

    sd: dict = {}
    for f in files:
        sd.update(load_file(f))
    return sd


def load_stdit3_torch_checkpoint(path: str, depth: int = 28) -> Optional[dict]:
    """Convert a local HF torch checkpoint dir (hpcai-tech/OpenSora-STDiT-v3
    layout) into STDiT3 Flax params."""
    return load_torch_checkpoint(path, "stdit3", depth)


def load_torch_checkpoint(path: str, family: str, depth: int) -> Optional[dict]:
    """Convert a local HF torch checkpoint dir into Flax params for the given
    model family ("stdit3" | "latte" | "cogvideox")."""
    sd = _load_safetensors_dir(path)
    if sd is None:
        return None
    from videosys_tpu.utils import convert as C

    fn = {"stdit3": C.convert_stdit3, "latte": C.convert_latte,
          "cogvideox": C.convert_cogvideox,
          "osp_v120": C.convert_osp_v120,
          "vchitect": C.convert_vchitect}[family]
    return fn(sd, depth=depth)


def try_load_params(config, family: str = "stdit3",
                    default_depth: int = 28) -> Optional[dict]:
    """Load {transformer, vae} params from a local path: an orbax dir saved by
    this framework, or a reference torch safetensors checkpoint (converted).
    Pipelines pass their model family; the path comes from
    `config.transformer` (Open-Sora/OSP) or `config.model_path`
    (Latte/CogVideoX/Vchitect)."""
    path = getattr(config, "transformer", None) or getattr(
        config, "model_path", None)
    if not path or not os.path.isdir(str(path)):
        return None
    if os.path.isdir(os.path.join(str(path), "orbax")):
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(os.path.join(path, "orbax"))
    tcfg = getattr(config, "transformer_config", None)
    depth = (getattr(tcfg, "depth", default_depth) if tcfg is not None
             else default_depth)
    p_t = load_torch_checkpoint(str(path), family, depth)
    if p_t is not None:
        return {"transformer": p_t}
    return None


def require_weights(loaded: dict, config) -> None:
    """Raise when a configured model path did not resolve to weights and no
    explicit random-init test hook (transformer_config) was set — mirroring
    the reference, which fails inside from_pretrained rather than silently
    generating noise (advisor finding, pipeline_open_sora.py:161)."""
    path = getattr(config, "transformer", None) or getattr(
        config, "model_path", None)
    if "transformer" not in loaded and path and \
            getattr(config, "transformer_config", None) is None:
        raise FileNotFoundError(
            f"model weights not found at {path!r} (need a local orbax dir "
            f"or HF safetensors snapshot); set the path to None together "
            f"with transformer_config=... for random-init testing")


def save_params(params: dict, path: str):
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(os.path.abspath(path), "orbax"), params)
    ckpt.wait_until_finished()
