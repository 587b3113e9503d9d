"""Pipeline base classes.

Behavioral reference: `videosys/core/pipeline/pipeline.py` (VideoSysPipeline
:10-53, VideoSysPipelineOutput :51). The diffusers module-registration /
device-placement machinery is unnecessary under JAX (params are explicit
pytrees, placement comes from shardings), so the base is a thin interface.
"""

from __future__ import annotations

import dataclasses
from typing import Any


@dataclasses.dataclass
class VideoSysPipelineOutput:
    """`.video`: uint8 array [B, T, H, W, C] (reference pipeline.py:51-53)."""

    video: Any


class VideoSysPipeline:
    """Interface: subclasses implement generate(...) -> VideoSysPipelineOutput."""

    def generate(self, *args, **kwargs) -> VideoSysPipelineOutput:
        raise NotImplementedError

    # --- low-memory mode (reference cpu_offload) ----------------------- #
    def _offload_params_to_host(self):
        """Commit ``self.params`` to host memory; phases stream modules onto
        the device via `_exec_put` (reference low-mem mode:
        pipeline_open_sora.py:239-242, pipeline_cogvideox.py:547-549)."""
        import jax

        cpu = jax.devices("cpu")[0]
        self.params = jax.tree.map(
            lambda x: jax.device_put(x, cpu) if hasattr(x, "dtype") else x,
            self.params)

    def _exec_put(self, tree):
        """Fetch a host-resident param subtree onto the execution device(s)
        for one phase (no-op unless the config enables cpu_offload)."""
        if not getattr(self._config, "cpu_offload", False):
            return tree
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = getattr(self, "mesh", None)
        target = (NamedSharding(mesh, P()) if mesh is not None
                  else jax.devices()[0])
        return jax.device_put(tree, target)

    def __call__(self, *args, **kwargs) -> VideoSysPipelineOutput:
        return self.generate(*args, **kwargs)

    def save_video(self, video, output_path: str, fps: int = 24):
        from videosys_tpu.utils.video import save_video

        return save_video(video, output_path, fps=fps)
