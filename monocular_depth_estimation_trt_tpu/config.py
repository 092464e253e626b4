"""Typed model/run configuration.

The reference has no config system — each script hard-codes inline constants
(``encoder = 'vits'``, ``precision = "fp16"`` ... reference
``Depth_Anything_V2/onnx2trt.py:153-159``) and derives a name-mangled artifact
key that doubles as the engine-cache key::

    depth_anything_v2_{enc}_{H}x{W}[_metric_{ds}][_dynamic][_dynamo][_sim]_{precision}

(reference ``Depth_Anything_V2/onnx2trt.py:160-166``). Here that becomes a
frozen dataclass whose :meth:`ModelSpec.artifact_name` reproduces the same
naming convention, so cache entries and result files line up with the
reference's on-disk layout.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Optional, Tuple

# Precision names: the reference builds fp16 TRT engines; on TPU the native
# fast dtype is bfloat16. "fp16" is accepted as an alias that maps to bf16
# compute unless the user explicitly forces float16.
_PRECISIONS = ("fp32", "bf16", "fp16", "int8")  # int8 = w8a8 encoder serving


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Immutable description of one compiled model configuration.

    This is the cache key for AOT-compiled engines — the TPU analogue of the
    reference's ``.engine`` filename convention.
    """

    model: str  # e.g. "depth_anything_v2"
    encoder: str = ""  # e.g. "vits" / "vitb" / "vitl" / "vitg"
    input_hw: Tuple[int, int] = (518, 518)
    precision: str = "bf16"
    batch: int = 1
    metric: bool = False
    dataset: str = ""  # metric checkpoint domain, e.g. "hypersim" / "vkitti"
    variant: str = ""  # free-form extra tag (e.g. "normal" for MoGe-2)
    extra: Tuple[Tuple[str, Any], ...] = ()

    def __post_init__(self):
        if self.precision not in _PRECISIONS:
            raise ValueError(
                f"precision must be one of {_PRECISIONS}, got {self.precision!r}"
            )

    @property
    def height(self) -> int:
        return self.input_hw[0]

    @property
    def width(self) -> int:
        return self.input_hw[1]

    def artifact_name(self) -> str:
        """Reference-compatible name mangling (``onnx2trt.py:160-166``)."""
        name = self.model
        if self.encoder:
            name += f"_{self.encoder}"
        if self.variant:
            name += f"_{self.variant}"
        name += f"_{self.height}x{self.width}"
        if self.metric:
            name += "_metric"
            if self.dataset:
                name += f"_{self.dataset}"
        if self.batch != 1:
            name += f"_b{self.batch}"
        for k, v in self.extra:
            name += f"_{k}{v}"
        name += f"_{self.precision}"
        return name

    def with_(self, **kw) -> "ModelSpec":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> Mapping[str, Any]:
        return dataclasses.asdict(self)


def compute_dtype(precision: str):
    """Map a precision name to the jnp compute dtype (TPU-first: fp16->bf16)."""
    import jax.numpy as jnp

    if precision == "int8":
        # int8 is a serving mode (w8a8, ops/quant.py), not a compute dtype:
        # families that support it map int8 -> bf16 graph + quantized Dense
        # themselves. Reaching here means the family has no int8 path yet.
        raise ValueError(
            "this model family has no int8 serving path (supported: the "
            "Depth-Anything family, depth_anything_v3, depth_pro, "
            "unidepth_v2/unik3d, metric3d_v2, moge2/metric_anything, "
            "vggt/streamvggt, map_anything); use bf16/fp16/fp32 here"
        )
    return {
        "fp32": jnp.float32,
        "bf16": jnp.bfloat16,
        # float16 is slow on the TPU MXU; honor the reference's fp16 configs
        # with bf16 (same exponent range as fp32, no loss-scale needed).
        "fp16": jnp.bfloat16,
    }[precision]


# ImageNet statistics used by most pipelines
# (reference Depth_Anything_V2/onnx2trt.py:121).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# Depth Pro normalizes with 0.5/0.5 (reference Depth_Pro/onnx2trt.py:96-114).
HALF_MEAN = (0.5, 0.5, 0.5)
HALF_STD = (0.5, 0.5, 0.5)


@dataclasses.dataclass(frozen=True)
class BenchmarkConfig:
    """Warmup + timed-loop protocol shared by every reference script
    (reference ``Depth_Anything_V2/infer.py:21-44``, ``onnx2trt.py:194-217``)."""

    warmup: int = 10
    iterations: int = 100
    include_transfers: bool = True  # reference times H2D+exec+D2H per iter
    # Measured sync-per-iteration latency pass run after pipelined-throughput
    # timing (real p50/p99 — the reference's per-iter protocol).
    latency_iterations: int = 10


DEFAULT_CACHE_DIR_ENV = "MDET_CACHE_DIR"


def cache_dir() -> str:
    import os

    root = os.environ.get(
        DEFAULT_CACHE_DIR_ENV,
        os.path.join(os.path.expanduser("~"), ".cache", "mdet_tpu"),
    )
    os.makedirs(root, exist_ok=True)
    return root
