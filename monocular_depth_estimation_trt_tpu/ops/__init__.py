from monocular_depth_estimation_trt_tpu.ops.resize import (
    resize,
    resample_matrix,
    constrain_to_multiple_of,
    lower_bound_size,
)
from monocular_depth_estimation_trt_tpu.ops.preprocess import (
    normalize,
    preprocess_lower_bound,
    preprocess_resize,
    preprocess_pad_square,
)
from monocular_depth_estimation_trt_tpu.ops.postprocess import (
    upsample_depth,
    normalize_depth_for_viz,
    inverse_depth_normalize,
)
from monocular_depth_estimation_trt_tpu.ops.colormap import turbo_colormap, turbo_lut

__all__ = [
    "resize",
    "resample_matrix",
    "constrain_to_multiple_of",
    "lower_bound_size",
    "normalize",
    "preprocess_lower_bound",
    "preprocess_resize",
    "preprocess_pad_square",
    "upsample_depth",
    "normalize_depth_for_viz",
    "inverse_depth_normalize",
    "turbo_colormap",
    "turbo_lut",
]
