"""VideoSysEngine — the public entry point.

Behavioral reference: `videosys/core/engine/engine.py` (VideoSysEngine :13-128)
and `core/engine/mp_utils.py`. The reference spawns one worker process per GPU
and mirrors every `generate` call to all ranks over queues; under JAX SPMD one
process drives all devices, so the engine reduces to: build the mesh, build
the pipeline, delegate. The worker-monitor / result-handler machinery
(mp_utils.py:91-270) has no equivalent failure domain here — XLA collectives
are issued from a single program.
"""

from __future__ import annotations

from typing import Any

from videosys_tpu.utils.video import save_video as _save_video


class VideoSysEngine:
    """`VideoSysEngine(config).generate(prompt)` (engine.py:13-119)."""

    def __init__(self, config: Any, **pipeline_kwargs):
        self.config = config
        pipeline_cls = config.pipeline_cls
        self.driver_worker = pipeline_cls(config, **pipeline_kwargs)

    def generate(self, *args, **kwargs):
        return self.driver_worker.generate(*args, **kwargs)

    def save_video(self, video, output_path: str, fps: int = 24):
        return _save_video(video, output_path, fps=fps)

    def shutdown(self):
        """No worker processes to reap (engine.py:122-128); kept for API parity."""

    def __del__(self):
        self.shutdown()
