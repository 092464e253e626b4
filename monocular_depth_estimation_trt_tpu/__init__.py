"""TPU-native monocular depth / 3D-geometry / optical-flow inference framework.

A ground-up JAX / XLA / Pallas rebuild of the capabilities of
``yester31/Monocular_Depth_Estimation_TRT`` (see ``SURVEY.md``): instead of the
reference's per-model ``onnx_export.py`` -> TensorRT engine-build path
(reference ``Depth_Anything_V2/onnx2trt.py:24-85``), models are Flax modules
compiled ahead-of-time by XLA with a persistent compilation cache; instead of
pinned CUDA host buffers and ``cudaMemcpyAsync`` (reference
``common_runtime.py:43-89,164-176``), device-resident ``jax.Array`` buffers with
async dispatch; and the host-side numpy pre/post-processing of the reference
(resize, normalize, bilinear upsample, colormap, unprojection) runs on device
as fused XLA/Pallas ops.

Typical use::

    import monocular_depth_estimation_trt_tpu as mdet
    pipe = mdet.build_pipeline("depth_anything_v2", encoder="vits")
    out = pipe(image_bgr_uint8)            # depth map at original resolution
"""

from monocular_depth_estimation_trt_tpu.version import __version__

__all__ = [
    "__version__",
    "build_pipeline",
    "list_models",
    "ModelSpec",
]


def __getattr__(name):
    # Lazy imports keep `import monocular_depth_estimation_trt_tpu` fast and
    # avoid importing jax at module import time (tests set platform env first).
    if name == "build_pipeline":
        from monocular_depth_estimation_trt_tpu.registry import build_pipeline

        return build_pipeline
    if name == "list_models":
        from monocular_depth_estimation_trt_tpu.registry import list_models

        return list_models
    if name == "ModelSpec":
        from monocular_depth_estimation_trt_tpu.config import ModelSpec

        return ModelSpec
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
