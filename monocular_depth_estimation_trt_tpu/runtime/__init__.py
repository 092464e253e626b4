from monocular_depth_estimation_trt_tpu.runtime.engine import Engine, EngineRegistry
from monocular_depth_estimation_trt_tpu.runtime.benchmark import (
    BenchmarkReport,
    benchmark,
)
from monocular_depth_estimation_trt_tpu.runtime.buffers import DeviceBuffer, IOBinding

__all__ = [
    "Engine",
    "EngineRegistry",
    "BenchmarkReport",
    "benchmark",
    "DeviceBuffer",
    "IOBinding",
]
