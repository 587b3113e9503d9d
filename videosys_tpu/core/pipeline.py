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

    def __call__(self, *args, **kwargs) -> VideoSysPipelineOutput:
        return self.generate(*args, **kwargs)

    def save_video(self, video, output_path: str, fps: int = 24):
        from videosys_tpu.utils.video import save_video

        return save_video(video, output_path, fps=fps)
