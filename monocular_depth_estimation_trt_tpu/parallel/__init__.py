from monocular_depth_estimation_trt_tpu.parallel.mesh import (
    get_mesh,
    single_device_mesh,
    virtual_cpu_devices,
)
from monocular_depth_estimation_trt_tpu.parallel.sharding import (
    replicate,
    shard_batch,
    ShardingRules,
)

__all__ = [
    "get_mesh",
    "single_device_mesh",
    "virtual_cpu_devices",
    "replicate",
    "shard_batch",
    "ShardingRules",
]
