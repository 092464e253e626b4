"""Model registry: name -> pipeline factory.

Replaces the reference's one-directory-per-model constellation of scripts
(SURVEY.md §2.2) with a single entry point::

    pipe = build_pipeline("depth_anything_v2", encoder="vits")
    out = pipe(image_rgb_u8)

Each factory wires the model's preprocess variant, Flax module, weight
converter, and postprocess into a :class:`~pipelines.DepthPipeline`.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.config import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    ModelSpec,
)
from monocular_depth_estimation_trt_tpu.pipelines import (
    DepthPipeline,
    depth_forward_factory,
)
from monocular_depth_estimation_trt_tpu.utils.logging import log

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def list_models():
    return sorted(_REGISTRY)


def build_pipeline(name: str, **kwargs) -> DepthPipeline:
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {list_models()}")
    return _REGISTRY[name](**kwargs)


# ---------------------------------------------------------------------------
# Depth Anything family (DA-V2 / Distill / AC share the architecture —
# reference Depth_Anything_V2/, Distill_Any_Depth/, Depth_Anything_AC/)
# ---------------------------------------------------------------------------


def _build_da_family(
    model_name: str,
    encoder: str,
    *,
    input_size: int = 518,
    metric: bool = False,
    dataset: str = "hypersim",
    max_depth: Optional[float] = None,
    precision: str = "bf16",
    attn_impl: str = "auto",
    checkpoint: Optional[str] = None,
    params: Any = None,
    viz: Optional[str] = None,
) -> DepthPipeline:
    import jax

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
        DepthAnythingV2,
    )
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        normalize,
        to_float_rgb,
    )
    from monocular_depth_estimation_trt_tpu.ops.resize import resize
    from monocular_depth_estimation_trt_tpu.weights.convert import (
        convert_depth_anything_v2,
    )
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    if max_depth is None:
        # hypersim (indoor) 20 m, vkitti (outdoor) 80 m
        # (reference Depth_Anything_V2/infer_metric.py:54-58)
        max_depth = 20.0 if dataset == "hypersim" else 80.0

    spec = ModelSpec(
        model=model_name,
        encoder=encoder,
        input_hw=(input_size, input_size),
        precision=precision,
        metric=metric,
        dataset=dataset if metric else "",
    )
    model = DepthAnythingV2(
        encoder=encoder,
        metric=metric,
        max_depth=max_depth,
        dtype=compute_dtype(precision),
        attn_impl=attn_impl,
    )

    def preprocess(img_u8):
        # Reference path: host resize raw->(518,518) (onnx2trt.py:146), then
        # lower-bound x14 resize (identity at 518^2) + ImageNet normalize
        # (onnx2trt.py:98-130). Fused on device here.
        x = to_float_rgb(img_u8)
        x = resize(x, spec.input_hw, method="linear")
        x = normalize(x, IMAGENET_MEAN, IMAGENET_STD)
        return x[None]

    example = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    if params is None:
        params = get_or_convert_params(
            spec.artifact_name(),
            model,
            example,
            torch_ckpt=checkpoint,
            converter=functools.partial(convert_depth_anything_v2, encoder=encoder),
        )

    forward = depth_forward_factory(
        lambda p, x: model.apply({"params": p}, x), preprocess
    )
    return DepthPipeline(
        spec, forward, params, viz=viz or ("metric" if metric else "relative")
    )


@register("depth_anything_v2")
def depth_anything_v2(encoder: str = "vits", **kw) -> DepthPipeline:
    return _build_da_family("depth_anything_v2", encoder, **kw)


@register("distill_any_depth")
def distill_any_depth(encoder: str = "vits", **kw) -> DepthPipeline:
    """Distilled DA-V2 (reference ``Distill_Any_Depth/``): same architecture,
    safetensors checkpoints, keep_aspect_ratio=False preprocessing — which our
    square-resize preprocess already matches."""
    return _build_da_family("distill_any_depth", encoder, **kw)


@register("depth_anything_ac")
def depth_anything_ac(encoder: str = "vits", **kw) -> DepthPipeline:
    """DA-V2 variant robust to adverse conditions (reference
    ``Depth_Anything_AC/``); identical serving graph."""
    return _build_da_family("depth_anything_ac", encoder, **kw)


@register("depth_anything_v3")
def depth_anything_v3(
    encoder: str = "vitl",
    input_size: int = 518,
    precision: str = "bf16",
    attn_impl: str = "auto",
    params: Any = None,
    **kw,
) -> DepthPipeline:
    """DA3METRIC-LARGE contract: metric depth + sky mask
    (reference ``Depth_Anything_V3/``)."""
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.depth_anything_v3 import (
        DepthAnythingV3,
    )
    from monocular_depth_estimation_trt_tpu.ops.postprocess import upsample_depth
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        normalize,
        to_float_rgb,
    )
    from monocular_depth_estimation_trt_tpu.ops.resize import resize, resize_hw
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    spec = ModelSpec(
        model="da3metric",
        encoder=encoder,
        input_hw=(input_size, input_size),
        precision=precision,
        metric=True,
    )
    model = DepthAnythingV3(
        encoder=encoder, dtype=compute_dtype(precision), attn_impl=attn_impl
    )

    def forward(p, img_u8, out_hw):
        x = to_float_rgb(img_u8)
        x = resize(x, spec.input_hw, method="linear")
        x = normalize(x, IMAGENET_MEAN, IMAGENET_STD)[None]
        depth, sky = model.apply({"params": p}, x)
        depth = upsample_depth(depth, out_hw)[0]
        sky = resize_hw(sky, out_hw, "linear", align_corners=True)[0]
        return {"depth": depth, "sky": sky}

    example = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    if params is None:
        params = get_or_convert_params(spec.artifact_name(), model, example)
    return DepthPipeline(spec, forward, params, viz="metric")


@register("depth_pro")
def depth_pro(
    precision: str = "bf16",
    attn_impl: str = "auto",
    params: Any = None,
    f_px: Optional[float] = None,
    **kw,
) -> DepthPipeline:
    """Apple Depth Pro serving contract (reference ``Depth_Pro/onnx2trt.py``):
    1536^2 input, canonical inverse depth + predicted FoV -> metric depth at
    the original resolution, plus the focal estimate."""
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.config import (
        HALF_MEAN,
        HALF_STD,
        compute_dtype,
    )
    from monocular_depth_estimation_trt_tpu.models.depth_pro import DepthPro
    from monocular_depth_estimation_trt_tpu.ops.camera import fov_to_focal
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        normalize,
        to_float_rgb,
    )
    from monocular_depth_estimation_trt_tpu.ops.resize import resize, resize_hw
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    size = 1536
    spec = ModelSpec(model="depth_pro", input_hw=(size, size), precision=precision)
    model = DepthPro(dtype=compute_dtype(precision), attn_impl=attn_impl)

    def forward(p, img_u8, out_hw):
        # reference: ToTensor + Normalize(0.5) + bilinear resize to 1536
        # (Depth_Pro/onnx2trt.py:96-114), all fused on device
        x = to_float_rgb(img_u8)
        x = normalize(x, HALF_MEAN, HALF_STD)
        x = resize(x[None], (size, size), method="linear")
        cid, fov_deg = model.apply({"params": p}, x)
        # postprocess (reference :152-165): W is the ORIGINAL width
        W = out_hw[1]
        focal = fov_to_focal(fov_deg[0], W) if f_px is None else jnp.float32(f_px)
        inverse_depth = cid[0] * (W / focal)
        inverse_depth = resize_hw(
            inverse_depth, out_hw, "linear", align_corners=False
        )
        depth = 1.0 / jnp.clip(inverse_depth, 1e-4, 1e4)
        return {"depth": depth, "f_px": focal}

    example = jnp.zeros((1, size, size, 3), jnp.float32)
    if params is None:
        params = get_or_convert_params(spec.artifact_name(), model, example)
    return DepthPipeline(spec, forward, params, viz="metric")
