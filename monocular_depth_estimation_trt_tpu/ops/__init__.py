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
from monocular_depth_estimation_trt_tpu.ops.camera import (
    canonical_to_metric_depth,
    fov_to_focal,
    recover_focal_shift,
    unproject_depth,
    unproject_intrinsics,
)
from monocular_depth_estimation_trt_tpu.ops.flow_sampler import (
    build_corr_pyramid,
    corr_lookup,
    corr_lookup_separable,
)
from monocular_depth_estimation_trt_tpu.ops.flow_viz import flow_to_color

__all__ = [
    "canonical_to_metric_depth",
    "fov_to_focal",
    "recover_focal_shift",
    "unproject_depth",
    "unproject_intrinsics",
    "build_corr_pyramid",
    "corr_lookup",
    "corr_lookup_separable",
    "flow_to_color",
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
