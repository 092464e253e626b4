from monocular_depth_estimation_trt_tpu.weights.store import (
    load_params,
    save_params,
    init_random_params,
)

__all__ = ["load_params", "save_params", "init_random_params"]
