from monocular_depth_estimation_trt_tpu.parallel.mesh import (
    get_mesh,
    single_device_mesh,
    virtual_cpu_devices,
)
from monocular_depth_estimation_trt_tpu.parallel.sharding import (
    geometric_tp_rules,
    metric3d_tp_rules,
    replicate,
    rules_for_family,
    shard_batch,
    ShardingRules,
    vit_tp_rules,
)

__all__ = [
    "get_mesh",
    "single_device_mesh",
    "virtual_cpu_devices",
    "replicate",
    "shard_batch",
    "ShardingRules",
    "vit_tp_rules",
    "geometric_tp_rules",
    "metric3d_tp_rules",
    "rules_for_family",
]
