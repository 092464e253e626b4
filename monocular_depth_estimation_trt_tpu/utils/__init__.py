from monocular_depth_estimation_trt_tpu.utils.logging import get_logger, log

__all__ = ["get_logger", "log"]
