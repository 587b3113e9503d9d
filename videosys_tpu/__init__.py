"""videosys_tpu — TPU-native video generation framework.

Same capabilities as NUS-HPC-AI-Lab/VideoSys (see SURVEY.md), re-designed for
JAX/XLA/Pallas on TPU. Public API mirrors `videosys/__init__.py:1-22`:
`VideoSysEngine(config).generate(prompt)`.
"""

from videosys_tpu.core.engine import VideoSysEngine
from videosys_tpu.core.pab import PABConfig
from videosys_tpu.core.parallel import ParallelConfig, build_mesh, initialize
from videosys_tpu.pipelines.cogvideox.pipeline_cogvideox import (
    CogVideoXConfig,
    CogVideoXPABConfig,
    CogVideoXPipeline,
)
from videosys_tpu.pipelines.latte.pipeline_latte import (
    LatteConfig,
    LattePABConfig,
    LattePipeline,
)
from videosys_tpu.pipelines.open_sora.pipeline_open_sora import (
    OpenSoraConfig,
    OpenSoraPABConfig,
    OpenSoraPipeline,
)
from videosys_tpu.pipelines.open_sora_plan.pipeline_open_sora_plan import (
    OpenSoraPlanConfig,
    OpenSoraPlanPipeline,
    OpenSoraPlanV110PABConfig,
    OpenSoraPlanV120PABConfig,
)
from videosys_tpu.pipelines.vchitect.pipeline_vchitect import (
    VchitectConfig,
    VchitectPABConfig,
    VchitectXLPipeline,
)

__all__ = [
    "VideoSysEngine",
    "CogVideoXConfig",
    "CogVideoXPABConfig",
    "CogVideoXPipeline",
    "LatteConfig",
    "LattePABConfig",
    "LattePipeline",
    "PABConfig",
    "initialize",
    "ParallelConfig",
    "build_mesh",
    "OpenSoraConfig",
    "OpenSoraPABConfig",
    "OpenSoraPipeline",
    "OpenSoraPlanConfig",
    "OpenSoraPlanPipeline",
    "OpenSoraPlanV110PABConfig",
    "OpenSoraPlanV120PABConfig",
    "VchitectConfig",
    "VchitectPABConfig",
    "VchitectXLPipeline",
]
