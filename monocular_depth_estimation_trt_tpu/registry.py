"""Model registry: name -> pipeline factory.

Replaces the reference's one-directory-per-model constellation of scripts
(SURVEY.md §2.2) with a single entry point::

    pipe = build_pipeline("depth_anything_v2", encoder="vits")
    out = pipe(image_rgb_u8)

Each factory wires the model's preprocess variant, Flax module, weight
converter, and postprocess into a :class:`~pipelines.DepthPipeline`.
"""

from __future__ import annotations

import dataclasses
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

_REGISTRY: Dict[str, Callable] = {}

# Fidelity tiers (honest labeling for benchmark/parity tables):
#   converter-verified  — torch->flax weight converter exists and a
#                         torch-mirror parity test gates the architecture;
#   architecture-matched — layer topology matches upstream (a real checkpoint
#                         would load via an existing converter pattern) but no
#                         end-to-end torch-mirror parity test yet;
#   approximated        — contract-faithful stand-in (same I/O + pre/post),
#                         internal architecture simplified; speedups vs the
#                         reference TRT baseline partly reflect the slimmer
#                         network.
_FIDELITY: Dict[str, str] = {}


def register(name: str, fidelity: str = "approximated"):
    assert fidelity in ("converter-verified", "architecture-matched",
                        "approximated")

    def deco(fn):
        _REGISTRY[name] = fn
        _FIDELITY[name] = fidelity
        return fn

    return deco


def get_fidelity(name: str) -> str:
    return _FIDELITY.get(name, "approximated")


# Families with an int8 w8a8 serving path (docs/QUANT.md): ViT backbones
# routed through _params_for -> ops/quant.quantize_model_bundle
INT8_FAMILIES = frozenset({
    "depth_anything_v2", "distill_any_depth", "depth_anything_ac",
    "depth_anything_v3", "depth_pro", "unidepth_v2", "unik3d",
    "metric3d_v2", "moge2", "metric_anything", "vggt", "streamvggt",
    "map_anything",
})

# Encoders below the measured M-starvation / memory-bound threshold where
# int8 w8a8 is a measured REGRESSION at batch-1 (docs/QUANT.md round-4
# table: DA-V2 vits @518² = 0.90x its bf16 twin — int8 adds quantize work
# without cutting the activation bytes that bound a small encoder; the
# int8 MXU's 2x only pays once the matmuls are d_model-bound, vitb+).
INT8_MEMORY_BOUND_ENCODERS = frozenset({"vits", "vits16", "small"})


def resolve_int8_precision(model_name: str, encoder: str,
                           precision: str) -> str:
    """Build-time int8 routing guard (round-4 verdict item 7).

    For encoders in :data:`INT8_MEMORY_BOUND_ENCODERS`, ``int8`` is
    auto-routed to ``bf16`` with a loud warning — the measured physics
    (docs/QUANT.md) says int8 cannot pay there at batch 1. Set
    ``MDET_FORCE_INT8=1`` to override (e.g. for batched offline serving
    where M-starvation lifts, or to re-measure the regression).
    """
    import os as _os

    from monocular_depth_estimation_trt_tpu.utils.logging import log

    if precision != "int8" or encoder not in INT8_MEMORY_BOUND_ENCODERS:
        return precision
    if _os.environ.get("MDET_FORCE_INT8", "") == "1":
        log(f"{model_name} {encoder}: int8 on a memory-bound encoder is a "
            "measured regression at batch-1 (docs/QUANT.md: vits int8 = "
            "0.90x bf16); forced by MDET_FORCE_INT8=1", tag="WARN")
        return precision
    log(f"{model_name} {encoder}: auto-routing int8 -> bf16 — int8 is a "
        "measured regression for memory-bound small encoders at batch-1 "
        "(docs/QUANT.md M-starvation ceiling). Set MDET_FORCE_INT8=1 to "
        "override.", tag="WARN")
    return "bf16"


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


def _calibration_images(input_hw, n_synthetic: int = 2):
    """Images for int8 activation-scale calibration: the bundled example
    photo when present, padded with deterministic synthetic textures (so a
    bare checkout still calibrates; real deployments should calibrate on
    domain images via ``build_pipeline(..., calib_images=[...])``).

    ``input_hw``: (H, W) target resolution, or a single int for square."""
    import os

    import cv2
    import numpy as np

    if isinstance(input_hw, int):
        input_hw = (input_hw, input_hw)
    h, w = input_hw
    imgs = []
    # repo-root copy first: CWD-relative data/ may be a foreign directory
    cand = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "example.jpg")
    if not os.path.exists(cand):
        cand = os.path.join("data", "example.jpg")
    if os.path.exists(cand):
        img = cv2.imread(cand)  # None on unreadable/corrupt files
        if img is not None:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            imgs.append(cv2.resize(img, (w, h)))
    rng = np.random.default_rng(0)
    for _ in range(max(n_synthetic - len(imgs), 1)):
        base = rng.integers(0, 255, (h // 7, w // 7, 3), dtype=np.uint8)
        imgs.append(cv2.resize(base, (w, h), interpolation=cv2.INTER_LINEAR))
    return imgs


def _int8_bundle(model, params, spec, params_name, make_sample, *,
                 calib_images=None, explicit_params=False, input_size=518):
    """Family-generic int8 serving bundle: calibrate (or load cached scales)
    and prune quantized kernels. ``make_sample``: jittable uint8 image ->
    model input batch (the family's preprocess, minus any aux returns).
    Scales cache beside the params, only when the params themselves came
    from the store (cache dir exists) and calibration used the default
    deterministic image set."""
    import os

    import jax

    from monocular_depth_estimation_trt_tpu.ops.quant import (
        quantize_model_bundle,
    )
    from monocular_depth_estimation_trt_tpu.weights.store import _params_dir

    from monocular_depth_estimation_trt_tpu.weights.store import save_params

    cacheable = (calib_images is None and not explicit_params
                 and os.path.isdir(_params_dir(params_name)))

    def samples():
        prep = jax.jit(make_sample)
        return tuple(
            prep(jnp.asarray(img))
            for img in (calib_images
                        if calib_images is not None
                        else _calibration_images(input_size))
        )

    bundle = quantize_model_bundle(model, params, samples)
    if cacheable:
        # persist the WHOLE pruned serving bundle: an int8 cold start then
        # loads pruned-params + q8 directly and never touches the
        # full-precision kernels (for VGGT-1B that halves the load I/O).
        # Versioned name (SmoothQuant scheme v2) so a scheme change can
        # never structurally collide with stale artifacts.
        save_params(_int8_bundle_name(spec), bundle)
    return bundle


def _int8_bundle_name(spec) -> str:
    return (dataclasses.replace(spec, precision="bf16").artifact_name()
            + "_int8bundle_v2")


def _params_for(spec, model, example, *, quant, params, checkpoint, converter,
                make_sample, input_size, calib_images=None,
                allowed_unconsumed=None, layout_version=1):
    """Shared param resolution for builders with an int8 path: resolve the
    full-precision tree (cache -> checkpoint -> random; int8 shares the bf16
    artifact — only the compiled engine differs), then, when quantizing,
    wrap it into the calibrated+pruned serving bundle.

    ``make_sample``: jittable uint8 image -> model input batch (used only on
    a calibration-cache miss)."""
    from monocular_depth_estimation_trt_tpu.utils.logging import log
    from monocular_depth_estimation_trt_tpu.weights.store import (
        get_or_convert_params,
        load_params,
    )

    params_name = (
        dataclasses.replace(spec, precision="bf16").artifact_name()
        if quant else spec.artifact_name()
    )
    explicit = params is not None
    if quant and not explicit and calib_images is None:
        # int8 cold start: the cached pruned bundle serves directly — the
        # full-precision kernels are never loaded
        try:
            cached = load_params(_int8_bundle_name(spec))
        except Exception:
            cached = None
        if cached is not None:
            log(f"int8: loaded cached serving bundle "
                f"({_int8_bundle_name(spec)})")
            return cached
    if params is None:
        # resolve against the full-precision tree: serve mode doesn't
        # declare the Dense kernels, so its init structure would mismatch
        # the cached/converted params
        params_model = (
            dataclasses.replace(model, quant="none") if quant else model
        )
        params = get_or_convert_params(
            params_name, params_model, example,
            torch_ckpt=checkpoint, converter=converter,
            allowed_unconsumed=allowed_unconsumed,
            layout_version=layout_version,
        )
    if quant:
        params = _int8_bundle(
            model, params, spec, params_name, make_sample,
            calib_images=calib_images, explicit_params=explicit,
            input_size=input_size,
        )
    return params


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
    resize_mode: str = "square",  # "square" | "lower_bound"
    calib_images: Optional[Any] = None,  # uint8 (H,W,3) arrays for int8 scales
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

    if max_depth is None:
        # hypersim (indoor) 20 m, vkitti (outdoor) 80 m
        # (reference Depth_Anything_V2/infer_metric.py:54-58)
        max_depth = 20.0 if dataset == "hypersim" else 80.0

    precision = resolve_int8_precision(model_name, encoder, precision)
    spec = ModelSpec(
        model=model_name,
        encoder=encoder,
        input_hw=(input_size, input_size),
        precision=precision,
        metric=metric,
        dataset=dataset if metric else "",
    )
    # int8 = w8a8 encoder serving (ops/quant.py; beyond the reference's
    # fp16-only TRT engines): bf16 graph everywhere except the ViT Dense
    # layers, whose weights/activations run the int8 MXU with statically
    # calibrated scales. Params convert/cache under the bf16 name — the
    # param tree is identical; only the compiled engine differs.
    quant = precision == "int8"
    dtype = compute_dtype("bf16" if quant else precision)
    model = DepthAnythingV2(
        encoder=encoder,
        metric=metric,
        max_depth=max_depth,
        dtype=dtype,
        attn_impl=attn_impl,
        quant="serve" if quant else "none",
    )

    def preprocess(img_u8):
        if resize_mode == "lower_bound":
            # aspect-preserving DPT policy (reference infer.py transform:
            # Resize lower_bound x14 + ImageNet normalize); the network runs
            # at the lower-bound resolution derived from the input shape
            from monocular_depth_estimation_trt_tpu.ops.preprocess import (
                preprocess_lower_bound,
            )

            return preprocess_lower_bound(img_u8, target=input_size)
        # Reference square path: host resize raw->(518,518) (onnx2trt.py:146),
        # then lower-bound x14 resize (identity at 518^2) + ImageNet
        # normalize (onnx2trt.py:98-130). Fused on device here.
        x = to_float_rgb(img_u8)
        x = resize(x, spec.input_hw, method="linear")
        x = normalize(x, IMAGENET_MEAN, IMAGENET_STD)
        return x[None]

    example = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    params = _params_for(
        spec, model, example, quant=quant, params=params,
        checkpoint=checkpoint,
        converter=functools.partial(convert_depth_anything_v2, encoder=encoder),
        make_sample=preprocess, input_size=input_size,
        calib_images=calib_images,
    )

    from monocular_depth_estimation_trt_tpu.ops.quant import as_variables

    forward = depth_forward_factory(
        lambda p, x: model.apply(as_variables(p), x), preprocess
    )
    return DepthPipeline(
        spec, forward, params, viz=viz or ("metric" if metric else "relative")
    )


@register("depth_anything_v2", fidelity="converter-verified")
def depth_anything_v2(encoder: str = "vits", **kw) -> DepthPipeline:
    return _build_da_family("depth_anything_v2", encoder, **kw)


@register("distill_any_depth", fidelity="converter-verified")
def distill_any_depth(encoder: str = "vits", **kw) -> DepthPipeline:
    """Distilled DA-V2 (reference ``Distill_Any_Depth/``): same architecture,
    safetensors checkpoints, keep_aspect_ratio=False preprocessing — which our
    square-resize preprocess already matches."""
    return _build_da_family("distill_any_depth", encoder, **kw)


@register("depth_anything_ac", fidelity="converter-verified")
def depth_anything_ac(encoder: str = "vits", **kw) -> DepthPipeline:
    """DA-V2 variant robust to adverse conditions (reference
    ``Depth_Anything_AC/``); identical serving graph."""
    return _build_da_family("depth_anything_ac", encoder, **kw)


@register("dkt", fidelity="converter-verified")
def dkt(encoder: str = "vits", metric: bool = True, dataset: str = "hypersim",
        **kw) -> DepthPipeline:
    """DKT (Diffusion Knows Transparency) — transparent-object depth distilled
    into the Depth Anything V2 serving graph. The reference exports it as the
    stock ``DepthAnythingV2`` class (``later/DKT/onnx_export.py:8-9,26-32``:
    encoder vits, metric hypersim by default), so the DA converter applies."""
    return _build_da_family("dkt", encoder, metric=metric, dataset=dataset,
                            **kw)


@register("bridge", fidelity="converter-verified")
def bridge(encoder: str = "vits", **kw) -> DepthPipeline:
    """BRIDGE (RL depth-to-image data engine) — DA-V2-style DPT serving graph
    at 518^2 (``later/BRIDGE/infer.py:52-54,76-77``, ``tt.py:10``: vits/vitb/
    vitg encoders, ``clamp(1e-3, 1e3)`` postprocess — the family default
    here). Trained differently, served identically: the graph + converter
    are gated by ``test_parity_da_v2.py`` and the serving contract
    (align_corners upsample + clamp) by
    ``tests/test_fidelity_promotions.py``."""
    return _build_da_family("bridge", encoder, **kw)


@register("depth_anything_v3", fidelity="converter-verified")
def depth_anything_v3(
    encoder: str = "vitl",
    input_size: int = 518,
    precision: str = "bf16",
    attn_impl: str = "auto",
    params: Any = None,
    checkpoint: Optional[str] = None,
    calib_images: Optional[Any] = None,
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

    precision = resolve_int8_precision("depth_anything_v3", encoder, precision)
    spec = ModelSpec(
        model="da3metric",
        encoder=encoder,
        input_hw=(input_size, input_size),
        precision=precision,
        metric=True,
    )
    quant = precision == "int8"  # w8a8 backbone serving (ops/quant.py)
    model = DepthAnythingV3(
        encoder=encoder, dtype=compute_dtype("bf16" if quant else precision),
        attn_impl=attn_impl, quant="serve" if quant else "none",
    )

    def preprocess(img_u8):
        x = to_float_rgb(img_u8)
        x = resize(x, spec.input_hw, method="linear")
        return normalize(x, IMAGENET_MEAN, IMAGENET_STD)[None]

    def forward(p, img_u8, out_hw):
        from monocular_depth_estimation_trt_tpu.ops.quant import as_variables

        depth, sky = model.apply(as_variables(p), preprocess(img_u8))
        depth = upsample_depth(depth, out_hw)[0]
        sky = resize_hw(sky, out_hw, "linear", align_corners=True)[0]
        return {"depth": depth, "sky": sky}

    from monocular_depth_estimation_trt_tpu.weights.convert import (
        convert_depth_anything_v3,
    )

    example = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    params = _params_for(
        spec, model, example, quant=quant, params=params,
        checkpoint=checkpoint,
        converter=functools.partial(convert_depth_anything_v3,
                                    encoder=encoder),
        make_sample=preprocess, input_size=input_size,
        calib_images=calib_images,
    )
    return DepthPipeline(spec, forward, params, viz="metric")


@register("depth_pro", fidelity="converter-verified")
def depth_pro(
    precision: str = "bf16",
    attn_impl: str = "auto",
    params: Any = None,
    f_px: Optional[float] = None,
    checkpoint: Optional[str] = None,
    calib_images: Optional[Any] = None,
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

    size = 1536
    spec = ModelSpec(model="depth_pro", input_hw=(size, size), precision=precision)
    quant = precision == "int8"  # w8a8 for both ViT encoders (ops/quant.py)
    model = DepthPro(dtype=compute_dtype("bf16" if quant else precision),
                     attn_impl=attn_impl, quant="serve" if quant else "none")

    def preprocess(img_u8):
        # reference: ToTensor + Normalize(0.5) + bilinear resize to 1536
        # (Depth_Pro/onnx2trt.py:96-114), all fused on device
        x = to_float_rgb(img_u8)
        x = normalize(x, HALF_MEAN, HALF_STD)
        return resize(x[None], (size, size), method="linear")

    def forward(p, img_u8, out_hw):
        from monocular_depth_estimation_trt_tpu.ops.quant import as_variables

        cid, fov_deg = model.apply(as_variables(p), preprocess(img_u8))
        # postprocess (reference :152-165): W is the ORIGINAL width
        W = out_hw[1]
        focal = fov_to_focal(fov_deg[0], W) if f_px is None else jnp.float32(f_px)
        inverse_depth = cid[0] * (W / focal)
        inverse_depth = resize_hw(
            inverse_depth, out_hw, "linear", align_corners=False
        )
        depth = 1.0 / jnp.clip(inverse_depth, 1e-4, 1e4)
        return {"depth": depth, "f_px": focal}

    from monocular_depth_estimation_trt_tpu.weights.convert import (
        convert_depth_pro,
    )

    example = jnp.zeros((1, size, size, 3), jnp.float32)
    params = _params_for(
        spec, model, example, quant=quant, params=params,
        checkpoint=checkpoint, converter=convert_depth_pro,
        make_sample=preprocess, input_size=size,
        calib_images=calib_images,
    )
    return DepthPipeline(spec, forward, params, viz="metric")


# ---------------------------------------------------------------------------
# Camera-aware 3D family (reference Uni_Depth_V2/, UniK3D/, Metric3D_V2/,
# MoGe_2/, Metric_Anything/)
# ---------------------------------------------------------------------------


def _build_geometric(
    model_name: str,
    mode: str,
    encoder: str,
    input_size: int,
    precision: str,
    attn_impl: str,
    params: Any,
    checkpoint: Optional[str] = None,
    calib_images: Optional[Any] = None,
) -> DepthPipeline:
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.geometric import GeometricDepthModel
    from monocular_depth_estimation_trt_tpu.ops.camera import rescale_intrinsics
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        normalize,
        to_float_rgb,
    )
    from monocular_depth_estimation_trt_tpu.ops.resize import resize
    from monocular_depth_estimation_trt_tpu.weights.convert import convert_geometric

    precision = resolve_int8_precision(model_name, encoder, precision)
    spec = ModelSpec(
        model=model_name,
        encoder=encoder,
        input_hw=(input_size, input_size),
        precision=precision,
        metric=True,
    )
    quant = precision == "int8"  # w8a8 pixel-encoder serving (ops/quant.py)
    model = GeometricDepthModel(
        encoder=encoder, mode=mode,
        dtype=compute_dtype("bf16" if quant else precision),
        attn_impl=attn_impl, quant="serve" if quant else "none",
    )

    def preprocess(img_u8):
        # ImageNet normalize (reference Uni_Depth_V2/onnx2trt.py:116)
        x = to_float_rgb(img_u8)
        x = resize(x, spec.input_hw, method="linear")
        return normalize(x, IMAGENET_MEAN, IMAGENET_STD)[None]

    def forward(p, img_u8, out_hw):
        from monocular_depth_estimation_trt_tpu.ops.quant import as_variables

        out = model.apply(as_variables(p), preprocess(img_u8))
        # postprocess (reference Uni_Depth_V2/onnx2trt.py:170-183): bilinear
        # align_corners=False resize of points; depth = z clamped; intrinsics
        # rescaled to the original resolution (:78-94)
        pts = resize(out["pts_3d"], out_hw, method="linear", align_corners=False)[0]
        conf = resize(
            out["confidence"][..., None], out_hw, method="linear",
            align_corners=False,
        )[0, ..., 0]
        depth = jnp.clip(pts[..., 2], 1e-3, 1e3)
        K = rescale_intrinsics(out["intrinsics"][0], spec.input_hw, out_hw)
        return {
            "depth": depth,
            "pts_3d": pts,
            "confidence": conf,
            "intrinsics": K,
        }

    example = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    params = _params_for(
        spec, model, example, quant=quant, params=params,
        checkpoint=checkpoint,
        converter=functools.partial(convert_geometric, encoder=encoder,
                                    mode=mode),
        make_sample=preprocess, input_size=input_size,
        calib_images=calib_images,
    )
    return DepthPipeline(spec, forward, params, viz="metric")


@register("unidepth_v2", fidelity="converter-verified")
def unidepth_v2(encoder: str = "vitb", input_size: int = 518,
                precision: str = "bf16", attn_impl: str = "auto",
                params: Any = None, checkpoint: Optional[str] = None,
                **kw) -> DepthPipeline:
    """UniDepth V2: metric points + confidence + predicted intrinsics
    (reference ``Uni_Depth_V2/``)."""
    return _build_geometric("unidepth_v2", "unidepth", encoder, input_size,
                            precision, attn_impl, params, checkpoint,
                            calib_images=kw.get("calib_images"))


@register("unik3d", fidelity="converter-verified")
def unik3d(encoder: str = "vitb", input_size: int = 518,
           precision: str = "bf16", attn_impl: str = "auto",
           params: Any = None, checkpoint: Optional[str] = None,
           **kw) -> DepthPipeline:
    """UniK3D: universal-camera 3D — unit rays x distance
    (reference ``UniK3D/``)."""
    return _build_geometric("unik3d", "unik3d", encoder, input_size,
                            precision, attn_impl, params, checkpoint,
                            calib_images=kw.get("calib_images"))


@register("metric3d_v2", fidelity="converter-verified")
def metric3d_v2(encoder: str = "vitl", precision: str = "bf16",
                attn_impl: str = "auto", params: Any = None,
                focal: Optional[float] = None, iters: int = 4,
                checkpoint: Optional[str] = None,
                calib_images: Optional[Any] = None, **kw) -> DepthPipeline:
    """Metric3D V2: canonical-camera metric depth (+ normals) at 616x1064
    with keep-ratio mean-pad preprocessing and de-canonical focal scaling
    (reference ``Metric3D_V2/infer.py:73-125``, ``onnx2trt.py:176-190``).
    Real architecture: DINOv2-reg encoder + RAFT-DPT iterative decoder
    (``models/metric3d_v2.py``; parity-gated vs the torch mirror)."""
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.metric3d_v2 import Metric3DV2
    from monocular_depth_estimation_trt_tpu.ops.postprocess import crop_pad
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        preprocess_keep_ratio_pad,
    )
    from monocular_depth_estimation_trt_tpu.ops.resize import resize_hw
    from monocular_depth_estimation_trt_tpu.weights.convert import (
        convert_metric3d_v2,
    )

    canvas = (616, 1064)
    precision = resolve_int8_precision("metric3d_v2", encoder, precision)
    spec = ModelSpec(
        model="metric3d_v2", encoder=encoder, input_hw=canvas,
        precision=precision, metric=True,
    )
    # int8 = w8a8 encoder serving (ops/quant.py). Round-3 measured 0.94x
    # (the RAFT-style iterative head's small matmuls paid more in
    # quant/rescale epilogues than the int8 MXU saved); round 4's K>N fused
    # Pallas routing + packed attention flipped it to 1.07x (28.53 vs 26.75
    # FPS on vitl@616x1064, BENCH_ALL / docs/QUANT.md).
    quant = precision == "int8"
    model = Metric3DV2(
        encoder=encoder, iters=iters,
        dtype=compute_dtype("bf16" if quant else precision),
        attn_impl=attn_impl, quant="serve" if quant else "none",
    )

    def forward(p, img_u8, out_hw):
        from monocular_depth_estimation_trt_tpu.ops.quant import as_variables

        x, pad, scale = preprocess_keep_ratio_pad(img_u8, canvas)
        out = model.apply(as_variables(p), x)
        depth = crop_pad(out["depth"], pad)
        depth = resize_hw(depth, out_hw, "linear", align_corners=False)[0]
        if focal is not None:
            # de-canonical transform (reference Metric3D_V2/infer.py:107-125)
            depth = depth * (focal * scale / 1000.0)
        depth = jnp.clip(depth, 0.0, 300.0)
        conf = crop_pad(out["confidence"], pad)
        conf = resize_hw(conf, out_hw, "linear", align_corners=False)[0]
        return {"depth": depth, "confidence": conf}

    example = jnp.zeros((1, *canvas, 3), jnp.float32)
    params = _params_for(
        spec, model, example, quant=quant, params=params,
        checkpoint=checkpoint,
        converter=functools.partial(convert_metric3d_v2, encoder=encoder),
        make_sample=lambda img: preprocess_keep_ratio_pad(img, canvas)[0],
        input_size=canvas,
        calib_images=calib_images,
        # layout_version=2: ConvGRU z/r kernels fused (round 5) — old cached
        # param trees have the unfused convz/convr structure
        layout_version=2,
    )
    return DepthPipeline(spec, forward, params, viz="metric")


def _build_moge(
    model_name: str,
    encoder: str,
    input_hw: tuple,
    num_tokens: int,
    precision: str,
    attn_impl: str,
    params: Any,
    predict_normal: bool = True,
    checkpoint: Optional[str] = None,
    calib_images: Optional[Any] = None,
) -> DepthPipeline:
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.moge2 import MoGe2
    from monocular_depth_estimation_trt_tpu.weights.convert import convert_moge2
    from monocular_depth_estimation_trt_tpu.ops.camera import (
        normalized_view_plane_uv,
        recover_focal_shift,
    )
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        normalize,
        to_float_rgb,
    )
    from monocular_depth_estimation_trt_tpu.ops.resize import resize

    precision = resolve_int8_precision(model_name, encoder, precision)
    spec = ModelSpec(
        model=model_name,
        encoder=encoder,
        input_hw=tuple(input_hw),
        precision=precision,
        variant="normal" if predict_normal else "",
        metric=True,
    )
    quant = precision == "int8"  # w8a8 backbone serving (ops/quant.py)
    model = MoGe2(
        encoder=encoder, num_tokens=num_tokens, predict_normal=predict_normal,
        dtype=compute_dtype("bf16" if quant else precision),
        attn_impl=attn_impl, quant="serve" if quant else "none",
    )

    def preprocess(img_u8):
        x = to_float_rgb(img_u8)
        x = resize(x, spec.input_hw, method="linear")
        return normalize(x, IMAGENET_MEAN, IMAGENET_STD)[None]

    def model_forward(p, img_u8):
        from monocular_depth_estimation_trt_tpu.ops.quant import as_variables

        return model.apply(as_variables(p), preprocess(img_u8))

    def postprocess(out, out_hw):
        points = out["points"]  # (1, h, w, 3) affine-invariant
        mask = out["mask"] > 0.5
        # reference MoGe_2/onnx2trt.py:169-206 on device: recover focal/shift,
        # shift z, re-unproject via uv grid, metric scale, inf-mask
        focal, shift = recover_focal_shift(points, mask)
        z = points[..., 2] + shift[:, None, None]
        mask = mask & (z > 0)
        uv = normalized_view_plane_uv(points.shape[1], points.shape[2])
        pts = jnp.concatenate(
            [uv[None] * z[..., None] / focal[:, None, None, None], z[..., None]],
            axis=-1,
        )
        scale = out["metric_scale"]
        pts = pts * scale[:, None, None, None]
        depth = z * scale[:, None, None]
        inf = jnp.float32(jnp.inf)
        depth = jnp.where(mask, depth, inf)[0]
        pts = jnp.where(mask[..., None], pts, inf)[0]
        result = {
            "depth": depth,
            "points": pts,
            "mask": mask[0],
            "metric_scale": scale[0],
            "focal": focal[0],
        }
        if "normal" in out:
            result["normal"] = jnp.where(
                mask[..., None], out["normal"], 0.0
            )[0]
        return result

    def forward(p, img_u8, out_hw):
        # single-program path (tests / CPU); TPU serving uses the split
        # engines below
        return postprocess(model_forward(p, img_u8), out_hw)

    example = jnp.zeros((1, *input_hw, 3), jnp.float32)
    params = _params_for(
        spec, model, example, quant=quant, params=params,
        checkpoint=checkpoint,
        converter=functools.partial(convert_moge2, encoder=encoder,
                                    predict_normal=predict_normal),
        make_sample=preprocess, input_size=tuple(input_hw),
        calib_images=calib_images,
    )

    class _SplitEngine:
        """Model and focal-shift postprocess as TWO compiled programs with a
        device-resident intermediate. Fusing them into one program
        deterministically kernel-faults the development TPU worker (each
        half runs fine alone — ``scripts/moge_barrier_test.py`` shows an
        optimization_barrier does not help, so the split is at the program
        level; the extra dispatch is sub-ms and the intermediate never
        leaves the device)."""

        def __init__(self, e1, e2):
            self.e1, self.e2 = e1, e2

        def compile(self):
            self.e1.compile()
            self.e2.compile()
            return self

        def __call__(self, p, img):
            return self.e2(self.e1(p, img))

    class MoGePipeline(DepthPipeline):
        def engine_for(self, in_hw, with_viz: bool = False):
            import jax

            from monocular_depth_estimation_trt_tpu.runtime.engine import Engine

            key = (tuple(in_hw), "split")
            if key in self._engines:
                return self._engines[key]
            ex = jax.ShapeDtypeStruct((*in_hw, 3), jnp.uint8)
            e1 = Engine(
                model_forward, (self.params, ex),
                name=f"{spec.artifact_name()}_model_in{in_hw[0]}x{in_hw[1]}",
            )
            mid = jax.eval_shape(model_forward, self.params, ex)
            e2 = Engine(
                functools.partial(postprocess, out_hw=tuple(in_hw)), (mid,),
                name=f"{spec.artifact_name()}_post_{in_hw[0]}x{in_hw[1]}",
            )
            self._engines[key] = _SplitEngine(e1, e2)
            return self._engines[key]

        def batch_engine_for(self, in_hw, batch: int, with_viz: bool = False):
            """Batched serving keeps the same program-level split — the
            base class's fused vmap(forward) would reintroduce the
            kernel-faulting fusion (`_SplitEngine` docstring)."""
            import jax

            from monocular_depth_estimation_trt_tpu.runtime.engine import Engine

            key = (tuple(in_hw), "batch-split", batch)
            if key in self._engines:
                return self._engines[key]
            ex = jax.ShapeDtypeStruct((batch, *in_hw, 3), jnp.uint8)
            bm = jax.vmap(model_forward, in_axes=(None, 0))
            e1 = Engine(
                bm, (self.params, ex),
                name=(f"{spec.artifact_name()}_model_in{in_hw[0]}x"
                      f"{in_hw[1]}_b{batch}"),
            )
            mid = jax.eval_shape(bm, self.params, ex)
            bp = jax.vmap(functools.partial(postprocess, out_hw=tuple(in_hw)))
            e2 = Engine(
                bp, (mid,),
                name=(f"{spec.artifact_name()}_post_{in_hw[0]}x"
                      f"{in_hw[1]}_b{batch}"),
            )
            self._engines[key] = _SplitEngine(e1, e2)
            return self._engines[key]

    return MoGePipeline(spec, forward, params, viz="none")


@register("moge2", fidelity="converter-verified")
def moge2(encoder: str = "vits", input_hw: tuple = (291, 518),
          num_tokens: int = 1800, precision: str = "bf16",
          attn_impl: str = "auto", params: Any = None,
          checkpoint: Optional[str] = None, **kw) -> DepthPipeline:
    """MoGe-2: affine-invariant point map + normal + mask + metric scale
    (reference ``MoGe_2/``)."""
    return _build_moge("moge2", encoder, input_hw, num_tokens, precision,
                       attn_impl, params, predict_normal=True,
                       checkpoint=checkpoint,
                       calib_images=kw.get("calib_images"))


@register("metric_anything", fidelity="converter-verified")
def metric_anything(encoder: str = "vitl", input_hw: tuple = (518, 518),
                    num_tokens: int = 3600, precision: str = "bf16",
                    attn_impl: str = "auto", params: Any = None,
                    checkpoint: Optional[str] = None,
                    **kw) -> DepthPipeline:
    """Metric Anything student_pointmap — MoGe-2 architecture student
    (reference ``Metric_Anything/infer.py:12-14``; num_tokens baked at 3600,
    ``onnx_export.py:23``); no normal head (outputs points/mask/metric_scale,
    ``onnx_export.py:73-74``)."""
    return _build_moge("metric_anything", encoder, input_hw, num_tokens,
                       precision, attn_impl, params, predict_normal=False,
                       calib_images=kw.get("calib_images"))


# ---------------------------------------------------------------------------
# Multi-view geometry transformers (reference VGGT/, StreamVGGT/)
# ---------------------------------------------------------------------------


def _build_vggt(
    model_name: str,
    input_size: int,
    precision: str,
    attn_impl: str,
    params: Any,
    vggt_cfg: Any = None,
    with_camera: bool = True,
    checkpoint: Optional[str] = None,
    allowed_unconsumed: Optional[str] = None,
    calib_images: Optional[Any] = None,
) -> DepthPipeline:
    import jax
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.vggt import VGGT, VGGTConfig
    from monocular_depth_estimation_trt_tpu.weights.convert import convert_vggt
    from monocular_depth_estimation_trt_tpu.ops.camera import (
        extrinsics_from_quat_trans,
        fov_to_focal,
    )
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        preprocess_pad_square,
    )
    from monocular_depth_estimation_trt_tpu.ops.postprocess import upsample_depth
    from monocular_depth_estimation_trt_tpu.ops.quant import as_variables

    cfg = vggt_cfg or VGGTConfig()
    spec = ModelSpec(
        model=model_name, input_hw=(input_size, input_size), precision=precision,
        metric=True,
        # vggt's depth-only and with-camera variants have different param
        # trees — they must not share one params/engine artifact name.
        # streamvggt is ALWAYS depth-only (distinct model name, no
        # collision): keep its established artifact name unchanged.
        variant="depth" if (model_name == "vggt" and not with_camera) else "",
    )
    # int8 = w8a8 aggregator serving (ops/quant.py): the ~1B-param
    # alternating-attention trunk is the zoo's largest weight footprint
    quant = precision == "int8"
    model = VGGT(
        cfg=cfg, dtype=compute_dtype("bf16" if quant else precision),
        attn_impl=attn_impl, with_camera=with_camera,
        quant="serve" if quant else "none",
    )

    def forward(p, img_u8, out_hw):
        h0, w0 = out_hw
        # pad to square (white), resize to 518, normalize
        # (reference VGGT/onnx2trt.py:80-110)
        x = preprocess_pad_square(img_u8, input_size)  # (1, 518, 518, 3)
        out = model.apply(as_variables(p), x[:, None])  # S=1
        depth_sq = out["depth"][:, 0]  # (1, 518, 518)
        conf_sq = out["depth_conf"][:, 0]
        # crop the padding out (reference onnx2trt.py:184-189)
        side = max(h0, w0)
        top = int(round((side - h0) / 2 / side * input_size))
        left = int(round((side - w0) / 2 / side * input_size))
        hh = max(int(round(h0 / side * input_size)), 1)
        ww = max(int(round(w0 / side * input_size)), 1)
        depth_c = depth_sq[:, top : top + hh, left : left + ww]
        conf_c = conf_sq[:, top : top + hh, left : left + ww]
        depth = upsample_depth(depth_c, out_hw, clamp=(1e-3, 1e3))[0]
        conf = upsample_depth(conf_c, out_hw, clamp=None)[0]
        result = {"depth": depth, "depth_conf": conf}
        if with_camera:
            pose = out["pose_enc"][0, 0]  # (9,)
            result["pose_enc"] = pose
            result["extrinsic"] = extrinsics_from_quat_trans(pose[3:7], pose[:3])
            result["focal_px"] = fov_to_focal(
                jnp.rad2deg(pose[7]), input_size
            )
        return result

    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS

    vit_cfg = cfg.vit_config or VIT_CONFIGS[cfg.encoder]
    example = jnp.zeros((1, 1, input_size, input_size, 3), jnp.float32)
    params = _params_for(
        spec, model, example, quant=quant, params=params,
        checkpoint=checkpoint,
        converter=functools.partial(
            convert_vggt, vit_depth=vit_cfg.depth, depth=cfg.depth,
            with_camera=with_camera,
        ),
        # S=1 calibration views (the activation ranges are per-layer, not
        # per-view — S>1 serving reuses the same scales)
        make_sample=lambda img: preprocess_pad_square(img, input_size)[:, None],
        input_size=input_size,
        allowed_unconsumed=allowed_unconsumed,
        calib_images=calib_images,
    )

    class VGGTPipeline(DepthPipeline):
        """Adds the multi-view (S-axis) protocol the reference could not
        export (``VGGT/onnx_export.py:63`` pins S=1): one jitted program over
        (S, H, W, 3) views with cross-view global attention."""

        def views_engine(self, s: int, src_hw=None):
            from monocular_depth_estimation_trt_tpu.runtime.engine import Engine

            src = tuple(src_hw or (input_size, input_size))
            key = ("views", s, src)
            if key not in self._engines:
                def run(p, views_u8):
                    x = preprocess_pad_square(views_u8, input_size)
                    out = model.apply(as_variables(p), x[None])
                    res = {"depth": out["depth"][0],
                           "depth_conf": out["depth_conf"][0]}
                    if with_camera:
                        res["pose_enc"] = out["pose_enc"][0]
                    return res

                self._engines[key] = Engine(
                    run,
                    (self.params,
                     jax.ShapeDtypeStruct((s, *src, 3), jnp.uint8)),
                    name=f"{spec.artifact_name()}_views{s}_{src[0]}x{src[1]}",
                )
            return self._engines[key]

        def multi_view(self, views_u8):
            """views_u8: (S, H, W, 3) RGB uint8 -> dict of host outputs
            (depth (S, 518, 518), conf, pose_enc (S, 9))."""
            import numpy as _np

            from monocular_depth_estimation_trt_tpu.runtime.transfer import (
                device_put_chunked,
                tree_get_chunked,
            )

            views_u8 = _np.asarray(views_u8)
            eng = self.views_engine(views_u8.shape[0], views_u8.shape[1:3])
            return tree_get_chunked(
                eng(self.params, device_put_chunked(views_u8))
            )

        def benchmark_views(self, s: int, config=None):
            """Per-FRAME throughput of the S-view program (tokens scale with
            S; global attention is quadratic in S·tokens)."""
            import numpy as _np

            from monocular_depth_estimation_trt_tpu.runtime.benchmark import (
                benchmark as _bench,
            )

            eng = self.views_engine(s)
            eng.compile()
            rng = _np.random.default_rng(0)
            views = jax.device_put(rng.integers(
                0, 255, (s, input_size, input_size, 3), dtype=_np.uint8))
            rep = _bench(lambda v: eng(self.params, v), (views,),
                         config=config,
                         name=f"{spec.artifact_name()}_s{s}")
            rep.frames_per_iteration = s
            return rep

    class StreamVGGTPipeline(VGGTPipeline):
        """Adds the run_video `.stream()` hook: per-video causal KV-cache
        session (models/streamvggt.py) — ~O(1) per-step cost vs the S=1
        re-forward, the streaming semantics the reference could not export
        (``StreamVGGT/onnx_export.py:25-55``)."""

        def _stream_session(self, window: int):
            from monocular_depth_estimation_trt_tpu.apps.streaming import (
                VGGTStreamingSession,
            )

            return VGGTStreamingSession(
                self.params, cfg=cfg, window=window, input_size=input_size,
                dtype=model.dtype, attn_impl=attn_impl,
            )

        def _stream_viz(self, depth, out_hw):
            # crop the pad-to-square border (as forward does), resample
            # to the source frame, colormap in-graph
            h0, w0 = out_hw
            side = max(h0, w0)
            top = int(round((side - h0) / 2 / side * input_size))
            left = int(round((side - w0) / 2 / side * input_size))
            hh = max(int(round(h0 / side * input_size)), 1)
            ww = max(int(round(w0 / side * input_size)), 1)
            d = upsample_depth(
                depth[None, top:top + hh, left:left + ww], out_hw,
                clamp=(1e-3, 1e3),
            )[0]
            return self._with_viz_epilogue({"depth": d}, True)

        def stream(self, window: int = 4):
            import jax

            sess = self._stream_session(window)
            viz_jit = jax.jit(self._stream_viz, static_argnums=1)

            def runner(rgb, viz=False):
                out = sess.step(rgb)
                res = viz_jit(out["depth"], tuple(rgb.shape[:2]))
                import numpy as _np

                return {k: _np.asarray(v) for k, v in res.items()}

            return runner

        def stream_export_bundle(self, window: int = 4,
                                 frame_hw=(518, 518)):
            """(step_fn(params, frame_u8, cache) -> (outputs-with-viz,
            new_cache), initial_cache) — the causal KV-cache step as ONE
            pure function, for ``runtime/export.py``'s stream modules.
            The serializable streaming the reference could not export
            (``StreamVGGT/onnx_export.py:25-55``)."""
            sess = self._stream_session(window)
            frame_hw = tuple(int(x) for x in frame_hw)

            def step(p, frame_u8, cache):
                out, c2 = sess.pure_step(p, frame_u8, cache)
                # same output contract as the live .stream() runner:
                # {"depth", "viz"} at the frame resolution
                return self._stream_viz(out["depth"], frame_hw), c2

            return step, sess._cache

    if model_name == "streamvggt":
        return StreamVGGTPipeline(spec, forward, params, viz="metric")
    return VGGTPipeline(spec, forward, params, viz="metric")


@register("vggt", fidelity="converter-verified")
def vggt(input_size: int = 518, precision: str = "bf16", attn_impl: str = "auto",
         params: Any = None, depth_only: bool = False,
         checkpoint: Optional[str] = None, **kw) -> DepthPipeline:
    """VGGT-1B multi-view geometry transformer (reference ``VGGT/``):
    aggregator + single 2-channel DPT depth head + iterative adaLN camera
    head, single- or multi-view (parity-gated vs the torch mirror)."""
    return _build_vggt("vggt", input_size, precision, attn_impl, params,
                       with_camera=not depth_only, checkpoint=checkpoint,
                       calib_images=kw.get("calib_images"))


@register("streamvggt", fidelity="converter-verified")
def streamvggt(input_size: int = 518, precision: str = "bf16",
               attn_impl: str = "auto", params: Any = None,
               checkpoint: Optional[str] = None, **kw) -> DepthPipeline:
    """StreamVGGT causal/streaming variant. The reference exports only the
    single-frame depth wrapper (``StreamVGGT/onnx_export.py:25-55``) —
    matched here by this pipeline; true causal KV-cache streaming (which the
    reference could NOT export) is ``apps.streaming.VGGTStreamingSession``
    over the same weights (``models/streamvggt.py``)."""
    return _build_vggt("streamvggt", input_size, precision, attn_impl, params,
                       with_camera=False, checkpoint=checkpoint,
                       calib_images=kw.get("calib_images"))


@register("sidepth", fidelity="converter-verified")
def sidepth(encoder: str = "vits", input_size: int = 518,
            precision: str = "bf16", attn_impl: str = "auto",
            params: Any = None, checkpoint: Optional[str] = None,
            model_kw: Optional[Dict] = None, **kw) -> DepthPipeline:
    """SIDepth scale-invariant depth (reference ``later/SIDepth/``): a
    frozen SSI relative stage + a conditioning network that resolves the
    shift ambiguity — output is metric up to one global scale. Both stages
    fuse into one jitted program; the SSI map is also returned."""
    import jax

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.sidepth import SIDepth
    from monocular_depth_estimation_trt_tpu.ops.postprocess import upsample_depth
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        normalize,
        to_float_rgb,
    )
    from monocular_depth_estimation_trt_tpu.ops.resize import resize
    from monocular_depth_estimation_trt_tpu.weights.convert import convert_sidepth
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    spec = ModelSpec(
        model="sidepth", encoder=encoder, input_hw=(input_size, input_size),
        precision=precision,
    )
    model = SIDepth(encoder=encoder, dtype=compute_dtype(precision),
                    attn_impl=attn_impl, **(model_kw or {}))

    def forward(p, img_u8, out_hw):
        x = to_float_rgb(img_u8)
        x = resize(x, spec.input_hw, method="linear")
        x = normalize(x, IMAGENET_MEAN, IMAGENET_STD)[None]
        out = model.apply({"params": p}, x)
        return {
            "depth": upsample_depth(out["depth"], out_hw, clamp=(1e-3, 1e3))[0],
            "ssi": upsample_depth(out["ssi"], out_hw, clamp=None)[0],
        }

    example = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    if params is None:
        params = get_or_convert_params(
            spec.artifact_name(), model, example, torch_ckpt=checkpoint,
            converter=functools.partial(convert_sidepth, encoder=encoder),
        )
    return DepthPipeline(spec, forward, params, viz="relative")


@register("align3r", fidelity="converter-verified")
def align3r(input_size: int = 512, precision: str = "bf16",
            attn_impl: str = "auto", params: Any = None,
            checkpoint: Optional[str] = None, model_kw: Optional[Dict] = None,
            prior_params: Any = None, **kw):
    """Align3R pairwise dynamic-scene reconstruction (reference
    ``later/Align3R/``): two images -> per-view pointmaps + confidence in
    view 1's frame, view-1 depth, and the relative camera pose. The depth
    prior (a frozen DA-V2 estimate per frame) is computed in-graph, both
    pair orders batch through ONE jitted program, and the pose comes from
    confidence-weighted Procrustes on the cross-view pointmaps
    (``ops/procrustes.py``) — closed-form on device, no RANSAC."""
    import jax
    import numpy as np

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.align3r import Align3R
    from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
        DepthAnythingV2,
    )
    from monocular_depth_estimation_trt_tpu.ops.preprocess import normalize
    from monocular_depth_estimation_trt_tpu.ops.procrustes import (
        weighted_procrustes,
    )
    from monocular_depth_estimation_trt_tpu.ops.resize import resize
    from monocular_depth_estimation_trt_tpu.weights.convert import (
        convert_align3r,
    )
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params
    from monocular_depth_estimation_trt_tpu.runtime.engine import Engine

    dtype = compute_dtype(precision)
    spec = ModelSpec(
        model="align3r", input_hw=(input_size, input_size),
        precision=precision, metric=True,
    )
    model = Align3R(dtype=dtype, attn_impl=attn_impl, **(model_kw or {}))
    prior_model = DepthAnythingV2(encoder="vits", dtype=dtype,
                                  attn_impl=attn_impl)
    # the frozen prior runs on a /14 grid; nearest multiple of 14 below 518
    prior_size = max((input_size // 14) * 14, 14)

    def pair_forward(p, img1_u8, img2_u8):
        in_hw = spec.input_hw
        x1 = resize(img1_u8.astype(jnp.float32), in_hw, method="linear")[None]
        x2 = resize(img2_u8.astype(jnp.float32), in_hw, method="linear")[None]
        # in-graph frozen DA-V2 priors for both frames in one batched pass
        both = jnp.concatenate([x1, x2], axis=0) / 255.0
        pri_in = normalize(resize(both, (prior_size, prior_size),
                                  method="linear"),
                           IMAGENET_MEAN, IMAGENET_STD)
        pri = prior_model.apply({"params": p["prior"]}, pri_in)
        pri = resize(pri[..., None], in_hw, method="linear")[..., 0]
        prior1, prior2 = pri[:1], pri[1:]
        # both pair orders as ONE batch-2 call: row 0 = (1,2), row 1 = (2,1)
        a = jnp.concatenate([x1, x2], axis=0)
        bb = jnp.concatenate([x2, x1], axis=0)
        pa = jnp.concatenate([prior1, prior2], axis=0)
        pb = jnp.concatenate([prior2, prior1], axis=0)
        out = model.apply({"params": p["align3r"]}, a, bb, pa, pb)
        pts1, conf1 = out["pts1"][:1], out["conf1"][:1]   # view1 in frame1
        pts2, conf2 = out["pts2"][:1], out["conf2"][:1]   # view2 in frame1
        pts2_own = out["pts1"][1:]                        # view2 in frame2
        conf2_own = out["conf1"][1:]
        # relative pose frame2 -> frame1 from the shared physical points
        w = (conf2 * conf2_own).reshape(1, -1)
        R, t = weighted_procrustes(
            pts2_own.reshape(1, -1, 3), pts2.reshape(1, -1, 3), w
        )
        return {
            "depth": jnp.maximum(pts1[0, ..., 2], 1e-3),
            "pts1": pts1[0], "conf1": conf1[0],
            "pts2": pts2[0], "conf2": conf2[0],
            "rotation": R[0], "translation": t[0],
        }

    example = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    if params is None:
        a3r_params = get_or_convert_params(
            spec.artifact_name(), model,
            (example, example,
             jnp.zeros((1, input_size, input_size), jnp.float32),
             jnp.zeros((1, input_size, input_size), jnp.float32)),
            torch_ckpt=checkpoint, converter=convert_align3r,
        )
        if prior_params is None:
            pspec = ModelSpec(model="depth_anything_v2", encoder="vits",
                              input_hw=(prior_size, prior_size),
                              precision=precision)
            from monocular_depth_estimation_trt_tpu.weights.convert import (
                convert_depth_anything_v2,
            )
            prior_params = get_or_convert_params(
                pspec.artifact_name(), prior_model,
                jnp.zeros((1, prior_size, prior_size, 3), jnp.float32),
                converter=functools.partial(convert_depth_anything_v2,
                                            encoder="vits"),
            )
        params = {"align3r": a3r_params, "prior": prior_params}

    class Align3RPipeline:
        """Two-image API (FlowPipeline shape): pipe(img1, img2) -> dict."""

        def __init__(self):
            self.spec = spec
            self.params = params
            self._engines = {}

        def engine_for(self, in_hw):
            if in_hw not in self._engines:
                ex = jax.ShapeDtypeStruct((*in_hw, 3), jnp.uint8)
                self._engines[in_hw] = Engine(
                    pair_forward, (self.params, ex, ex),
                    name=f"{spec.artifact_name()}_in{in_hw[0]}x{in_hw[1]}",
                )
            return self._engines[in_hw]

        def __call__(self, frame1, frame2):
            from monocular_depth_estimation_trt_tpu.runtime.transfer import (
                device_put_chunked,
                tree_get_chunked,
            )

            eng = self.engine_for(frame1.shape[:2])
            out = eng(
                self.params,
                device_put_chunked(np.asarray(frame1)),
                device_put_chunked(np.asarray(frame2)),
            )
            return tree_get_chunked(out)

        def benchmark(self, in_hw=None, config=None, **_):
            from monocular_depth_estimation_trt_tpu.runtime.benchmark import (
                benchmark as _bench,
            )

            src = tuple(in_hw or spec.input_hw)
            eng = self.engine_for(src)
            eng.compile()
            rng = np.random.default_rng(0)
            f1 = jax.device_put(
                rng.integers(0, 255, (*src, 3), dtype=np.uint8))
            f2 = jax.device_put(
                rng.integers(0, 255, (*src, 3), dtype=np.uint8))
            return _bench(lambda a, b2: eng(self.params, a, b2), (f1, f2),
                          config=config, name=spec.artifact_name())

    return Align3RPipeline()


@register("stream3r", fidelity="converter-verified")
def stream3r(input_size: int = 518, precision: str = "bf16",
             attn_impl: str = "auto", params: Any = None,
             checkpoint: Optional[str] = None, vggt_cfg: Any = None,
             **kw) -> DepthPipeline:
    """STream3R scalable sequential 3D reconstruction (reference
    ``later/STream3R/``): a causal VGGT-family transformer streaming images
    into per-frame pointmaps. Served as the causal aggregator + the upstream
    point head (inv_log pts3d + expp1 conf) alongside depth and camera;
    single images run through the standard pipeline,
    ``pipe.stream_session(window)`` returns the KV-cache causal session
    (per-step cost independent of the stream length — the serving mode
    STream3R is built for)."""
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.vggt import VGGT, VGGTConfig
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        preprocess_pad_square,
    )
    from monocular_depth_estimation_trt_tpu.ops.postprocess import upsample_depth
    from monocular_depth_estimation_trt_tpu.ops.resize import resize
    from monocular_depth_estimation_trt_tpu.weights.convert import convert_vggt
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    cfg = vggt_cfg or VGGTConfig(causal=True)
    spec = ModelSpec(
        model="stream3r", input_hw=(input_size, input_size),
        precision=precision, metric=True,
    )
    model = VGGT(
        cfg=cfg, dtype=compute_dtype(precision), attn_impl=attn_impl,
        with_camera=True, with_point_head=True,
    )

    def forward(p, img_u8, out_hw):
        h0, w0 = out_hw
        x = preprocess_pad_square(img_u8, input_size)
        out = model.apply({"params": p}, x[:, None])  # S=1
        side = max(h0, w0)
        top = int(round((side - h0) / 2 / side * input_size))
        left = int(round((side - w0) / 2 / side * input_size))
        hh = max(int(round(h0 / side * input_size)), 1)
        ww = max(int(round(w0 / side * input_size)), 1)

        def crop(a):
            return a[:, top: top + hh, left: left + ww]

        depth = upsample_depth(crop(out["depth"][:, 0]), out_hw,
                               clamp=(1e-3, 1e3))[0]
        pts = resize(crop(out["world_points"][:, 0]), out_hw,
                     method="linear")[0]
        pconf = upsample_depth(crop(out["world_points_conf"][:, 0]), out_hw,
                               clamp=None)[0]
        pose = out["pose_enc"][0, 0]
        return {"depth": depth, "world_points": pts,
                "world_points_conf": pconf, "pose_enc": pose}

    example = jnp.zeros((1, 1, input_size, input_size, 3), jnp.float32)
    if params is None:
        vit_cfg = cfg.vit_config or VIT_CONFIGS[cfg.encoder]
        params = get_or_convert_params(
            spec.artifact_name(), model, example, torch_ckpt=checkpoint,
            converter=functools.partial(
                convert_vggt, vit_depth=vit_cfg.depth, depth=cfg.depth,
            ),
        )

    dtype = compute_dtype(precision)

    class Stream3RPipeline(DepthPipeline):
        # named stream_session (not .stream) so run_video's per-frame
        # FlashDepth-style hook does not mistake this batch-step API
        def stream_session(self, window: int = 4):
            from monocular_depth_estimation_trt_tpu.apps.streaming import (
                VGGTStreamingSession,
            )

            return VGGTStreamingSession(
                self.params, cfg=cfg, window=window, input_size=input_size,
                dtype=dtype, attn_impl=attn_impl, with_camera=True,
                with_point_head=True,
            )

    return Stream3RPipeline(spec, forward, params, viz="metric")


@register("flashdepth", fidelity="converter-verified")
def flashdepth(encoder: str = "vits", input_size: int = 518,
               precision: str = "bf16", attn_impl: str = "auto",
               params: Any = None, checkpoint: Optional[str] = None,
               **kw) -> DepthPipeline:
    """FlashDepth streaming video depth (reference ``later/FlashDepth/``):
    per-frame DA-style DPT with a Mamba temporal module whose state persists
    across frames (``wrapper.py:9-25``, ``infer.py:104-130``). Single-image
    calls start a fresh sequence; ``pipe.stream()`` returns a stateful
    session (used by ``apps.streaming.run_video``) whose SSM state stays
    device-resident between frames."""
    import jax
    import numpy as np

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.flashdepth import (
        FlashDepth,
        flashdepth_init_state,
    )
    from monocular_depth_estimation_trt_tpu.ops.postprocess import upsample_depth
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        normalize,
        to_float_rgb,
    )
    from monocular_depth_estimation_trt_tpu.ops.resize import resize
    from monocular_depth_estimation_trt_tpu.weights.convert import (
        convert_flashdepth,
    )
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    spec = ModelSpec(
        model="flashdepth", encoder=encoder, input_hw=(input_size, input_size),
        precision=precision,
    )
    model = FlashDepth(
        encoder=encoder, dtype=compute_dtype(precision), attn_impl=attn_impl
    )
    patch = (input_size // 14, input_size // 14)

    def preprocess(img_u8):
        # reference load_image (later/FlashDepth/infer.py:32-67): INTER_CUBIC
        # resize to a multiple-of-14 target + ImageNet normalize
        x = to_float_rgb(img_u8)
        x = resize(x, spec.input_hw, method="cubic")
        return normalize(x, IMAGENET_MEAN, IMAGENET_STD)[None]

    def forward_state(p, img_u8, out_hw, state):
        depth, new_state = model.apply({"params": p}, preprocess(img_u8), state)
        depth = upsample_depth(depth, out_hw, clamp=None)[0]
        return {"depth": jnp.maximum(depth, 0.0)}, new_state

    def forward(p, img_u8, out_hw):
        # stateless serving: every image is its own sequence
        state = flashdepth_init_state(model, 1, patch)
        out, _ = forward_state(p, img_u8, out_hw, state)
        return out

    example = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    if params is None:
        params = get_or_convert_params(
            spec.artifact_name(),
            model,
            (example, flashdepth_init_state(model, 1, patch)),
            torch_ckpt=checkpoint,
            converter=functools.partial(convert_flashdepth, encoder=encoder),
        )

    class FlashDepthSession:
        """Stateful per-frame depth: the Mamba state rides on device between
        calls (one jitted step program; no host round-trip for the state)."""

        def __init__(self, pipe):
            self.pipe = pipe
            self._state = None
            self._engines = {}

        def reset(self):
            """Upstream ``mamba.start_new_sequence()`` (wrapper.py:13)."""
            self._state = None

        def __call__(self, image_u8, *, viz: bool = False):
            from monocular_depth_estimation_trt_tpu.ops.colormap import (
                turbo_colormap,
            )
            from monocular_depth_estimation_trt_tpu.ops.postprocess import (
                normalize_depth_for_viz,
            )
            from monocular_depth_estimation_trt_tpu.runtime.engine import Engine
            from monocular_depth_estimation_trt_tpu.runtime.transfer import (
                device_put_chunked,
                tree_get_chunked,
            )

            h, w = image_u8.shape[:2]
            if self._state is None:
                self._state = flashdepth_init_state(model, 1, patch)
            key = ((h, w), viz)
            if key not in self._engines:
                def run(p, img, state, _hw=(h, w), _viz=viz):
                    out, new_state = forward_state(p, img, _hw, state)
                    if _viz:
                        out["viz"] = turbo_colormap(
                            normalize_depth_for_viz(out["depth"])
                        )
                    return out, new_state

                self._engines[key] = Engine(
                    run,
                    (self.pipe.params,
                     jax.ShapeDtypeStruct((h, w, 3), jnp.uint8),
                     self._state),
                    name=f"{spec.artifact_name()}_stream_{h}x{w}"
                    + ("_viz" if viz else ""),
                )
            out, self._state = self._engines[key](
                self.pipe.params, device_put_chunked(np.asarray(image_u8)),
                self._state,
            )
            return tree_get_chunked(out)

    class FlashDepthPipeline(DepthPipeline):
        def stream(self):
            return FlashDepthSession(self)

    return FlashDepthPipeline(spec, forward, params, viz="relative")


@register("video_depth_anything", fidelity="converter-verified")
def video_depth_anything(encoder: str = "vits", input_size: int = 518,
                         metric: bool = False, window: int = 0,
                         overlap: int = 0, precision: str = "bf16",
                         attn_impl: str = "auto", params: Any = None,
                         checkpoint: Optional[str] = None,
                         model_kw: Optional[Dict] = None,
                         **kw) -> DepthPipeline:
    """Video Depth Anything (reference ``later/Video_Depth_Anything/``):
    temporally consistent video depth — a DA-V2 encoder + a DPT head with
    temporal attention, run on 32-frame windows; long videos stitch
    overlapping windows with scale/shift alignment (upstream ``run.py``).
    Single images serve through the standard pipeline as a 1-frame window;
    ``pipe.video_depth(frames_u8)`` runs the windowed protocol. ``metric``
    selects the Metric-VDA checkpoints (same graph, depth in meters)."""
    import jax
    import numpy as np

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.video_depth_anything import (
        OVERLAP,
        WINDOW,
        VideoDepthAnything,
        stitch_window,
        window_starts,
    )
    from monocular_depth_estimation_trt_tpu.ops.postprocess import upsample_depth
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        normalize,
        to_float_rgb,
    )
    from monocular_depth_estimation_trt_tpu.ops.resize import resize
    from monocular_depth_estimation_trt_tpu.weights.convert import convert_vda
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    window = window or WINDOW
    overlap = overlap or OVERLAP
    spec = ModelSpec(
        model="video_depth_anything", encoder=encoder,
        input_hw=(input_size, input_size), precision=precision, metric=metric,
        dataset="metric" if metric else "",
    )
    model = VideoDepthAnything(
        encoder=encoder, dtype=compute_dtype(precision), attn_impl=attn_impl,
        **(model_kw or {}),
    )

    def prep_frames(frames_u8):
        # upstream run.py: DA transform per frame (resize + ImageNet
        # normalize); fused on device over the whole window
        x = to_float_rgb(frames_u8)
        x = resize(x, spec.input_hw, method="linear")
        return normalize(x, IMAGENET_MEAN, IMAGENET_STD)

    def forward(p, img_u8, out_hw):
        # single image == 1-frame window (temporal attention over T=1)
        d = model.apply({"params": p}, prep_frames(img_u8)[None, None])
        depth = upsample_depth(d[:, 0], out_hw, clamp=None)[0]
        return {"depth": jnp.maximum(depth, 0.0)}

    example = jnp.zeros((1, 1, input_size, input_size, 3), jnp.float32)
    if params is None:
        params = get_or_convert_params(
            spec.artifact_name(),
            model,
            example,
            torch_ckpt=checkpoint,
            converter=functools.partial(convert_vda, encoder=encoder),
        )

    class VDAPipeline(DepthPipeline):
        """Adds the windowed video protocol on top of single-image serving."""

        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self._window_engines: Dict = {}

        def _window_engine(self, src_hw, t_w):
            from monocular_depth_estimation_trt_tpu.runtime.engine import Engine

            key = (src_hw, t_w)
            if key not in self._window_engines:
                def run(p, frames_u8):
                    d = model.apply({"params": p}, prep_frames(frames_u8)[None])
                    return jnp.maximum(d[0], 0.0)

                self._window_engines[key] = Engine(
                    run,
                    (self.params,
                     jax.ShapeDtypeStruct((t_w, *src_hw, 3), jnp.uint8)),
                    name=f"{spec.artifact_name()}_win{t_w}_{src_hw[0]}x{src_hw[1]}",
                )
            return self._window_engines[key]

        def video_depth(self, video_u8) -> np.ndarray:
            """video (T, H, W, 3) u8 -> depth (T, ih, iw) fp32 at the model
            resolution (upstream run.py's overlapping-window protocol: each
            window is one jitted program; stitching = least-squares
            scale/shift on the overlap + linear cross-fade, on host)."""
            from monocular_depth_estimation_trt_tpu.runtime.transfer import (
                device_put_chunked,
            )

            video_u8 = np.asarray(video_u8)
            t_total = video_u8.shape[0]
            src_hw = video_u8.shape[1:3]
            ih, iw = spec.input_hw
            eng = self._window_engine(src_hw, window)
            if t_total <= window:
                # pad by repeating the last frame so every clip length
                # reuses the ONE compiled window program (compiles are
                # minutes on the remote TPU), then trim
                padded = np.concatenate(
                    [video_u8,
                     np.repeat(video_u8[-1:], window - t_total, axis=0)]
                )
                d = eng(self.params, device_put_chunked(padded))
                return np.asarray(d)[:t_total]

            out = np.zeros((t_total, ih, iw), np.float32)
            prev_end = 0
            for s in window_starts(t_total, window, overlap):
                d = np.asarray(
                    eng(self.params,
                        device_put_chunked(video_u8[s: s + window]))
                )
                if prev_end == 0:
                    out[:window] = d
                else:
                    ov = prev_end - s  # == overlap except the final window
                    out[s: s + window] = stitch_window(out[s:prev_end], d, ov)
                prev_end = s + window
            return out

        def benchmark(self, in_hw=None, config=None, **_):
            """Window-program throughput in FRAMES/sec: each dispatch is a
            full ``window``-frame program (the model's serving unit), so the
            report carries ``frames_per_iteration=window``; ``iterations``
            still counts real dispatches and the latency percentiles are
            per-WINDOW (sync pass)."""
            from monocular_depth_estimation_trt_tpu.runtime.benchmark import (
                benchmark as _bench,
            )

            src = tuple(in_hw or spec.input_hw)
            eng = self._window_engine(src, window)
            eng.compile()
            rng = np.random.default_rng(0)
            fr = jax.device_put(
                rng.integers(0, 255, (window, *src, 3)).astype(np.uint8)
            )
            rep = _bench(lambda f: eng(self.params, f), (fr,), config=config,
                         name=spec.artifact_name())
            rep.frames_per_iteration = window  # per-frame FPS accounting
            return rep

    return VDAPipeline(
        spec, forward, params, viz="metric" if metric else "relative"
    )


@register("litevggt", fidelity="converter-verified")
def litevggt(input_size: int = 518, precision: str = "bf16",
             attn_impl: str = "auto", params: Any = None,
             checkpoint: Optional[str] = None, **kw) -> DepthPipeline:
    """LiteVGGT — distilled VGGT served through the vanilla VGGT graph
    (``later/LiteVGGT/infer.py:26-31``: stock ``VGGT()`` + ``te_dict.pt``
    loaded ``strict=False``, bf16, camera + depth heads). The upstream
    speedup (geometry-aware cached token merging) is a serving optimization
    on the same weights; ``convert_vggt`` applies unchanged and is gated by
    ``test_parity_vggt.py`` + the key-exhaustiveness audit. The upstream
    ``strict=False`` load is declared here as ``allowed_unconsumed`` over the
    token-merge extras so real ``te_dict.pt`` files convert loudly-but-
    successfully (``tests/test_fidelity_promotions.py``)."""
    return _build_vggt("litevggt", input_size, precision, attn_impl, params,
                       with_camera=True, checkpoint=checkpoint,
                       allowed_unconsumed=r"(^|\.)(te|te_dict|token_merge|merge)[._]")


@register("dinov3", fidelity="converter-verified")
def dinov3(encoder: str = "vitl16", input_size: int = 1024,
           precision: str = "bf16", attn_impl: str = "auto",
           params: Any = None, checkpoint: Optional[str] = None,
           **kw) -> DepthPipeline:
    """DINOv3 depther (reference ``later/DINOv3/infer.py:25-45``): RoPE-only
    patch-16 backbone + DPT head at 1024^2, antialiased resize + ImageNet
    normalize preprocessing, Spectral-colormap figures."""
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.dinov3 import DINOv3Depther
    from monocular_depth_estimation_trt_tpu.ops.postprocess import upsample_depth
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        normalize,
        to_float_rgb,
    )
    from monocular_depth_estimation_trt_tpu.ops.resize import resize
    from monocular_depth_estimation_trt_tpu.weights.convert import convert_dinov3
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    spec = ModelSpec(
        model="dinov3", encoder=encoder, input_hw=(input_size, input_size),
        precision=precision,
    )
    model = DINOv3Depther(
        encoder=encoder, dtype=compute_dtype(precision), attn_impl=attn_impl
    )

    def forward(p, img_u8, out_hw):
        # torchvision Resize(antialias=True) + ImageNet normalize
        # (later/DINOv3/infer.py:16-24), fused on device
        x = to_float_rgb(img_u8)
        x = resize(x, spec.input_hw, method="linear", antialias=True)
        x = normalize(x, IMAGENET_MEAN, IMAGENET_STD)[None]
        depth = model.apply({"params": p}, x)
        return {"depth": upsample_depth(depth, out_hw, clamp=None)[0]}

    example = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    if params is None:
        params = get_or_convert_params(
            spec.artifact_name(), model, example, torch_ckpt=checkpoint,
            converter=functools.partial(convert_dinov3, encoder=encoder),
        )
    return DepthPipeline(spec, forward, params, viz="spectral")


@register("geocalib", fidelity="converter-verified")
def geocalib(encoder: str = "vits", input_size: int = 322,
             precision: str = "bf16", attn_impl: str = "auto",
             params: Any = None, checkpoint: Optional[str] = None,
             iters: int = 10, **kw) -> DepthPipeline:
    """GeoCalib single-image calibration (reference ``later/GeoCalib/``):
    perspective fields + confidences -> Gauss-Newton camera fit, reporting
    roll/pitch/vfov/hfov/focal with uncertainties (``infer.py:30-39``).
    Angles are radians; focal is in pixels of the ORIGINAL image height."""
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.geocalib import (
        GeoCalib,
        fit_camera,
    )
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        normalize,
        to_float_rgb,
    )
    from monocular_depth_estimation_trt_tpu.ops.resize import resize
    from monocular_depth_estimation_trt_tpu.weights.convert import convert_geocalib
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    spec = ModelSpec(
        model="geocalib", encoder=encoder, input_hw=(input_size, input_size),
        precision=precision,
    )
    model = GeoCalib(
        encoder=encoder, dtype=compute_dtype(precision), attn_impl=attn_impl
    )

    def forward(p, img_u8, out_hw):
        x = to_float_rgb(img_u8)
        x = resize(x, spec.input_hw, method="linear")
        x = normalize(x, IMAGENET_MEAN, IMAGENET_STD)[None]
        fields = model.apply({"params": p}, x)
        est = fit_camera(
            fields["up_field"][0], fields["latitude_field"][0],
            fields["up_confidence"][0], fields["latitude_confidence"][0],
            spec.input_hw, iters=iters,
        )
        # angles/FoV transfer from the square network view; express the focal
        # in original-image pixels via the vertical FoV
        est["focal"] = out_hw[0] / (2.0 * jnp.tan(est["vfov"] / 2.0))
        est["focal_uncertainty"] = (
            est["focal_uncertainty"] * out_hw[0] / input_size
        )
        est["hfov"] = 2.0 * jnp.arctan(
            out_hw[1] / (2.0 * est["focal"])
        )
        return {**est, **{k: v[0] for k, v in fields.items()}}

    example = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    if params is None:
        params = get_or_convert_params(
            spec.artifact_name(), model, example, torch_ckpt=checkpoint,
            converter=functools.partial(convert_geocalib, encoder=encoder),
        )
    return DepthPipeline(spec, forward, params, viz="none")


@register("prior_depth_anything", fidelity="converter-verified")
def prior_depth_anything(encoder: str = "vits", input_size: int = 518,
                         precision: str = "bf16", attn_impl: str = "auto",
                         params: Any = None,
                         checkpoint: Optional[str] = None,
                         vggt_checkpoint: Optional[str] = None,
                         **kw) -> DepthPipeline:
    """Prior Depth Anything (reference ``later/Prior_Depth_Anything/``):
    VGGT coarse depth + confidence, refined by a prior-conditioned DA stack
    (``infer.py:190-217``: aggregator -> depth_head -> Refiner.predict(image,
    depth_map, confidence)). The whole chain fuses into ONE jitted program.
    ``checkpoint`` loads the refiner; ``vggt_checkpoint`` the VGGT backbone
    (cached params are shared with the ``vggt`` pipeline)."""
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.prior_depth import PriorDARefiner
    from monocular_depth_estimation_trt_tpu.models.vggt import VGGT, VGGTConfig
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS
    from monocular_depth_estimation_trt_tpu.ops.postprocess import upsample_depth
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        normalize,
        preprocess_pad_square,
    )
    from monocular_depth_estimation_trt_tpu.weights.convert import (
        convert_prior_depth,
        convert_vggt,
    )
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    dtype = compute_dtype(precision)
    cfg = VGGTConfig()
    vggt_model = VGGT(cfg=cfg, dtype=dtype, attn_impl=attn_impl,
                      with_camera=False)
    refiner = PriorDARefiner(encoder=encoder, dtype=dtype,
                             attn_impl=attn_impl)

    spec = ModelSpec(
        model="prior_depth_anything", encoder=encoder,
        input_hw=(input_size, input_size), precision=precision, metric=True,
    )

    def forward(p, img_u8, out_hw):
        h0, w0 = out_hw
        x = preprocess_pad_square(img_u8, input_size)  # (1, 518, 518, 3)
        out = vggt_model.apply({"params": p["vggt"]}, x[:, None])
        depth_sq = out["depth"][:, 0]
        conf_sq = out["depth_conf"][:, 0]
        # refiner conditions on the SAME square view, ImageNet-normalized
        rgb = normalize(x, IMAGENET_MEAN, IMAGENET_STD)
        refined = refiner.apply(
            {"params": p["refiner"]}, rgb, depth_sq, conf_sq
        )
        # crop the square padding out + upsample (as the vggt pipeline does)
        side = max(h0, w0)
        top = int(round((side - h0) / 2 / side * input_size))
        left = int(round((side - w0) / 2 / side * input_size))
        hh = max(int(round(h0 / side * input_size)), 1)
        ww = max(int(round(w0 / side * input_size)), 1)

        def crop_up(d):
            return upsample_depth(
                d[:, top : top + hh, left : left + ww], out_hw,
                clamp=(1e-3, 1e3),
            )[0]

        return {
            "depth": crop_up(refined),
            "depth_vggt": crop_up(depth_sq),
            "confidence": upsample_depth(
                conf_sq[:, top : top + hh, left : left + ww], out_hw,
                clamp=None,
            )[0],
        }

    if params is None:
        vit_cfg = cfg.vit_config or VIT_CONFIGS[cfg.encoder]
        vggt_example = jnp.zeros((1, 1, input_size, input_size, 3), jnp.float32)
        vggt_spec = ModelSpec(
            model="vggt", input_hw=(input_size, input_size),
            precision=precision, metric=True,
        )
        vggt_params = get_or_convert_params(
            # depth-only graph is a sub-tree of the full vggt params; name it
            # separately so the cache round-trips with the right structure
            vggt_spec.artifact_name() + "_depthonly",
            vggt_model, vggt_example, torch_ckpt=vggt_checkpoint,
            converter=functools.partial(
                convert_vggt, vit_depth=vit_cfg.depth, depth=cfg.depth,
                with_camera=False,
            ),
        )
        ref_example = (
            jnp.zeros((1, input_size, input_size, 3), jnp.float32),
            jnp.zeros((1, input_size, input_size), jnp.float32),
            jnp.ones((1, input_size, input_size), jnp.float32),
        )
        refiner_params = get_or_convert_params(
            spec.artifact_name() + "_refiner", refiner, ref_example,
            torch_ckpt=checkpoint,
            converter=functools.partial(convert_prior_depth, encoder=encoder),
        )
        params = {"vggt": vggt_params, "refiner": refiner_params}

    return DepthPipeline(spec, forward, params, viz="metric")


@register("map_anything", fidelity="converter-verified")
def map_anything(input_size: int = 518, precision: str = "bf16",
                 attn_impl: str = "auto", params: Any = None,
                 checkpoint: Optional[str] = None, vggt_cfg: Any = None,
                 **kw) -> DepthPipeline:
    """MapAnything metric 3D mapping (reference ``later/Map_Anything/
    infer.py:30-68``): per view — pts3d (world) / pts3d_cam / depth_z /
    depth_along_ray / ray_directions / intrinsics / cam2world poses (quat +
    trans) / conf / masks / metric_scaling_factor / img_no_norm, all composed
    on device. Single images serve through the standard pipeline;
    ``pipe.reconstruct(frames)`` runs a joint multi-view pass."""
    import jax
    import numpy as np

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.map_anything import MapAnything
    from monocular_depth_estimation_trt_tpu.models.vggt import VGGTConfig
    from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS
    from monocular_depth_estimation_trt_tpu.ops.camera import (
        extrinsics_from_quat_trans,
    )
    from monocular_depth_estimation_trt_tpu.ops.postprocess import upsample_depth
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        preprocess_pad_square,
    )
    from monocular_depth_estimation_trt_tpu.weights.convert import (
        convert_map_anything,
    )

    from monocular_depth_estimation_trt_tpu.ops.quant import as_variables

    cfg = vggt_cfg or VGGTConfig()
    spec = ModelSpec(
        model="map_anything", input_hw=(input_size, input_size),
        precision=precision, metric=True,
    )
    quant = precision == "int8"  # w8a8 aggregator serving (ops/quant.py)
    model = MapAnything(cfg=cfg,
                        dtype=compute_dtype("bf16" if quant else precision),
                        attn_impl=attn_impl,
                        quant="serve" if quant else "none")

    def compose(out, rgb01):
        """Raw head outputs -> the reference's per-view output set
        (later/Map_Anything/infer.py:43-68), S folded into the batch."""
        b, s, H, W, _ = rgb01.shape
        msf = out["metric_scaling_factor"][:, None]  # (B, 1)
        ray = out["ray_directions"]
        dar = out["depth_along_ray"] * msf[..., None, None]
        pts_cam = ray * dar[..., None]
        depth_z = pts_cam[..., 2]
        pose = out["pose_enc"]  # (B, S, 9) cam2world
        Rt = extrinsics_from_quat_trans(pose[..., 3:7], pose[..., :3])
        R, t = Rt[..., :3], Rt[..., 3] * msf[..., None]
        pts_world = jnp.einsum("bsij,bshwj->bshwi", R, pts_cam) + t[:, :, None, None]
        fov_h, fov_w = pose[..., 7], pose[..., 8]
        fy = H / (2.0 * jnp.tan(jnp.maximum(fov_h, 1e-3) / 2.0))
        fx = W / (2.0 * jnp.tan(jnp.maximum(fov_w, 1e-3) / 2.0))
        zeros = jnp.zeros_like(fx)
        ones = jnp.ones_like(fx)
        K = jnp.stack([
            jnp.stack([fx, zeros, jnp.full_like(fx, W / 2.0)], -1),
            jnp.stack([zeros, fy, jnp.full_like(fy, H / 2.0)], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ], axis=-2)  # (B, S, 3, 3)
        logits = out["mask_logits"]
        nam = logits > 0.0
        mask = (nam & (dar > 1e-6))[..., None]
        return {
            "pts3d": pts_world,
            "pts3d_cam": pts_cam,
            "depth_z": depth_z[..., None],
            "depth_along_ray": dar[..., None],
            "ray_directions": ray,
            "intrinsics": K,
            "camera_poses": jnp.concatenate(
                [jnp.concatenate([R, t[..., None]], axis=-1),
                 jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0, 1.0]),
                                  (b, s, 1, 4))], axis=-2,
            ),
            "cam_trans": t,
            "cam_quats": pose[..., 3:7],
            "conf": out["conf"],
            "mask": mask,
            "non_ambiguous_mask": nam,
            "non_ambiguous_mask_logits": logits,
            "metric_scaling_factor": out["metric_scaling_factor"],
            # de-normalize back to [0,1] RGB (the reference's img_no_norm
            # output set, later/Map_Anything/infer.py) — the model input is
            # ImageNet-normalized
            "img_no_norm": jnp.clip(
                rgb01 * jnp.asarray(IMAGENET_STD)
                + jnp.asarray(IMAGENET_MEAN), 0.0, 1.0
            ),
        }

    def forward(p, img_u8, out_hw):
        h0, w0 = out_hw
        x = preprocess_pad_square(img_u8, input_size)  # normalized square
        out = model.apply(as_variables(p), x[:, None])
        full = compose(out, x[:, None])
        # standard pipeline contract on top: crop the pad-to-square border
        # (as the other VGGT-family pipelines do) before resampling depth
        # to the source resolution
        side = max(h0, w0)
        top = int(round((side - h0) / 2 / side * input_size))
        left = int(round((side - w0) / 2 / side * input_size))
        hh = max(int(round(h0 / side * input_size)), 1)
        ww = max(int(round(w0 / side * input_size)), 1)
        depth_sq = full["depth_z"][0, :, :, :, 0]
        depth = upsample_depth(
            depth_sq[:, top: top + hh, left: left + ww], out_hw,
            clamp=(1e-3, 1e3),
        )[0]
        return {"depth": depth,
                **{k: v[0] for k, v in full.items()
                   if k != "metric_scaling_factor"},
                "metric_scaling_factor": full["metric_scaling_factor"]}

    example = jnp.zeros((1, 1, input_size, input_size, 3), jnp.float32)
    vit_cfg = cfg.vit_config or VIT_CONFIGS[cfg.encoder]
    params = _params_for(
        spec, model, example, quant=quant, params=params,
        checkpoint=checkpoint,
        converter=functools.partial(
            convert_map_anything, vit_depth=vit_cfg.depth, depth=cfg.depth,
        ),
        make_sample=lambda img: preprocess_pad_square(img, input_size)[:, None],
        input_size=input_size,
        calib_images=kw.get("calib_images"),
    )

    class MapAnythingPipeline(DepthPipeline):
        def reconstruct(self, frames_u8):
            """Joint multi-view pass: frames (S, H, W, 3) uint8 -> the full
            output set with cross-view attention (the reference's
            ``model.infer(views)``)."""
            from monocular_depth_estimation_trt_tpu.runtime.engine import Engine
            from monocular_depth_estimation_trt_tpu.runtime.transfer import (
                device_put_chunked,
                tree_get_chunked,
            )

            frames = np.asarray(frames_u8)
            s = frames.shape[0]
            key = ("views", s, frames.shape[1:3])
            if key not in self._engines:
                def run(p, fr):
                    views = jax.vmap(
                        lambda f: preprocess_pad_square(f, input_size)[0]
                    )(fr)[None]
                    out = model.apply(as_variables(p), views)
                    return compose(out, views)

                ex = jax.ShapeDtypeStruct(frames.shape, jnp.uint8)
                self._engines[key] = Engine(
                    run, (self.params, ex),
                    name=f"{spec.artifact_name()}_s{s}",
                )
            out = self._engines[key](self.params, device_put_chunked(frames))
            return tree_get_chunked(out)

    return MapAnythingPipeline(spec, forward, params, viz="metric")


@register("cotracker3", fidelity="converter-verified")
def cotracker3(window: int = 16, grid_size: int = 10,
               input_hw: tuple = (384, 512), precision: str = "bf16",
               params: Any = None, checkpoint: Optional[str] = None,
               model_kw: Optional[dict] = None, **kw):
    """CoTracker3 online point tracking (reference ``later/CoTracker3/
    infer.py:19-28``): grid queries, sliding windows of ``2 * step`` frames
    (``step = window // 2``), returns (tracks (B,T,N,2), visibility
    (B,T,N,1)). The pipeline object IS the online model: call it with
    ``(video_chunk, is_first_step=True, grid_size=...)`` to start, then with
    successive chunks — exactly the upstream hub API."""
    import jax
    import numpy as np

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.cotracker3 import CoTracker3
    from monocular_depth_estimation_trt_tpu.runtime.engine import Engine
    from monocular_depth_estimation_trt_tpu.weights.convert import (
        convert_cotracker3,
    )
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    in_hw = tuple(input_hw)
    spec = ModelSpec(
        model="cotracker3", input_hw=in_hw, precision=precision,
        extra=(("win", window), ("grid", grid_size)),
    )
    model = CoTracker3(dtype=compute_dtype(precision), **(model_kw or {}))
    n = grid_size * grid_size
    step = window // 2

    def _grid_queries(h, w):
        # interior grid like upstream get_points_on_a_grid: margins of one
        # cell on each side
        ys = np.linspace(h / (grid_size + 1), h * grid_size / (grid_size + 1),
                         grid_size, dtype=np.float32)
        xs = np.linspace(w / (grid_size + 1), w * grid_size / (grid_size + 1),
                         grid_size, dtype=np.float32)
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)[None]

    example_frames = jnp.zeros((1, window, *in_hw, 3), jnp.float32)
    example_q = jnp.zeros((1, n, 2), jnp.float32)
    if params is None:
        params = get_or_convert_params(
            spec.artifact_name(), model, (example_frames, example_q),
            torch_ckpt=checkpoint, converter=convert_cotracker3,
        )

    class CoTrackerPipeline:
        step = window // 2

        def __init__(self):
            self.spec = spec
            self.params = params
            self.grid_size = grid_size
            self._engines = {}
            self._queries = None
            self._state = None  # (coords (1,W,N,2), vis (1,W,N), feat)

        def _prep(self, chunk):
            import cv2

            frames = np.asarray(chunk, dtype=np.float32)
            if frames.max() > 1.5:
                frames = frames / 255.0
            if frames.shape[1:3] != in_hw:
                frames = np.stack(
                    [cv2.resize(f, (in_hw[1], in_hw[0])) for f in frames]
                )
            return frames

        def _engine(self, first: bool):
            key = ("first" if first else "cont",)
            if key in self._engines:
                return self._engines[key]
            fr = jax.ShapeDtypeStruct((1, window, *in_hw, 3), jnp.float32)
            q = jax.ShapeDtypeStruct((1, n, 2), jnp.float32)
            if first:
                def run(p, frames, queries):
                    return model.apply({"params": p}, frames, queries)
                eng = Engine(run, (self.params, fr, q),
                             name=spec.artifact_name() + "_first")
            else:
                co = jax.ShapeDtypeStruct((1, window, n, 2), jnp.float32)
                vi = jax.ShapeDtypeStruct((1, window, n), jnp.float32)
                ft = jax.ShapeDtypeStruct((1, n, model.dim), jnp.float32)

                def run(p, frames, queries, coords, vis, feat):
                    return model.apply(
                        {"params": p}, frames, queries,
                        init_coords=coords, init_vis=vis, track_feat=feat,
                    )
                eng = Engine(run, (self.params, fr, q, co, vi, ft),
                             name=spec.artifact_name() + "_cont")
            self._engines[key] = eng
            return eng

        def __call__(self, video_chunk=None, is_first_step: bool = False,
                     grid_size: int = 0):
            """The upstream online API (later/CoTracker3/infer.py:24-28)."""
            if is_first_step:
                if grid_size and grid_size != self.grid_size:
                    # the query count is baked into the compiled engines;
                    # honor the upstream arg by refusing silently-wrong output
                    raise ValueError(
                        f"[MDET] grid_size={grid_size} differs from the "
                        f"pipeline's compiled grid_size={self.grid_size}; "
                        "rebuild with build_pipeline('cotracker3', "
                        f"grid_size={grid_size})"
                    )
                self._queries = jnp.asarray(_grid_queries(*in_hw))
                self._state = None
                return None
            frames = self._prep(video_chunk[0] if video_chunk.ndim == 5
                                else video_chunk)
            t = frames.shape[0]
            if t < window:  # pad by repeating the last frame (static shapes)
                frames = np.concatenate(
                    [frames, np.repeat(frames[-1:], window - t, axis=0)]
                )
            fr = jnp.asarray(frames[None])
            if self._state is None:
                out = self._engine(True)(self.params, fr, self._queries)
            else:
                coords, vis, feat = self._state
                # seed: the (window - step) overlap frames reuse the previous
                # window's estimates; the `step` new frames start from the
                # last known position (total stays exactly `window`)
                init_c = jnp.concatenate(
                    [coords[:, step:],
                     jnp.repeat(coords[:, -1:], step, axis=1)], axis=1
                )
                init_v = jnp.concatenate(
                    [vis[:, step:],
                     jnp.repeat(vis[:, -1:], step, axis=1)], axis=1
                )
                out = self._engine(False)(
                    self.params, fr, self._queries, init_c, init_v, feat
                )
            vis_logit = jnp.log(
                jnp.clip(out["visibility"][..., 0], 1e-6, 1 - 1e-6)
            ) - jnp.log(
                jnp.clip(1 - out["visibility"][..., 0], 1e-6, 1 - 1e-6)
            )
            self._state = (out["tracks"] / 1.0, vis_logit, out["track_feat"])
            tracks = np.asarray(out["tracks"])[:, :t]
            vis = np.asarray(out["visibility"])[:, :t]
            return tracks, vis

        def track_video(self, video):
            """Full-video convenience: video (T, H, W, 3) -> (tracks, vis)
            over all frames (the reference's loop, infer.py:27-28)."""
            video = self._prep(video)
            self(None, is_first_step=True)
            t_total = video.shape[0]
            all_tracks = np.zeros((1, t_total, n, 2), np.float32)
            all_vis = np.zeros((1, t_total, n, 1), np.float32)
            pos = 0
            while pos < t_total:
                chunk = video[pos: pos + window]
                tr, vi = self(chunk)
                t = chunk.shape[0]
                all_tracks[:, pos: pos + t] = tr[:, :t]
                all_vis[:, pos: pos + t] = vi[:, :t]
                pos += step if pos + window < t_total else t
            return all_tracks, all_vis

        def benchmark(self, _in_hw=None, config=None):
            from monocular_depth_estimation_trt_tpu.runtime.benchmark import (
                benchmark as _bench,
            )

            eng = self._engine(True)
            eng.compile()
            rng = np.random.default_rng(0)
            fr = jax.device_put(
                rng.uniform(0, 1, (1, window, *in_hw, 3)).astype(np.float32)
            )
            q = jax.device_put(_grid_queries(*in_hw).astype(np.float32))
            return _bench(lambda f: eng(self.params, f, q), (fr,),
                          config=config, name=spec.artifact_name())

    return CoTrackerPipeline()


# ---------------------------------------------------------------------------
# Optical flow family (reference RAFT/, NeuFlow/, MeFlow/, MEMFOF/)
# ---------------------------------------------------------------------------


@register("raft", fidelity="converter-verified")
def raft(
    iters: int = 20,
    input_hw: tuple = (288, 512),
    precision: str = "fp32",
    params: Any = None,
    **kw,
) -> "FlowPipeline":
    """RAFT optical flow (reference ``RAFT/``): frame pair at 288x512 ->
    flow_low (1/8) + flow (full res)."""
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.flow.raft import RAFT
    from monocular_depth_estimation_trt_tpu.ops.resize import resize
    from monocular_depth_estimation_trt_tpu.pipelines import FlowPipeline
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    spec = ModelSpec(
        model="raft",
        input_hw=tuple(input_hw),
        precision=precision,
        extra=(("iters", iters),),
    )
    # RAFT runs fp32 even in the reference's fp16 engines for the corr volume;
    # compute dtype applies to convs.
    model = RAFT(iters=iters, dtype=compute_dtype(precision))

    def forward(p, img1_u8, img2_u8, in_hw=tuple(input_hw)):
        # host resize in reference (onnx2trt.py:100-111) -> device resize here
        x1 = resize(img1_u8.astype(jnp.float32), in_hw, method="linear")[None]
        x2 = resize(img2_u8.astype(jnp.float32), in_hw, method="linear")[None]
        flow_low, flow_up = model.apply({"params": p}, x1, x2)
        return {"flow_low": flow_low[0], "flow": flow_up[0]}

    example = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
    if params is None:
        # layout_version=2: SepConvGRU z/r kernels are fused (_sep_gru) —
        # pre-fusion cached artifacts must not be structurally loaded.
        params = get_or_convert_params(
            spec.artifact_name(), model, (example, example), seed=0,
            layout_version=2,
        )
    return FlowPipeline(spec, forward, params)


@register("waft", fidelity="converter-verified")
def waft(iters: int = 8, input_hw: tuple = (280, 504), encoder: str = "vits",
         precision: str = "bf16", params: Any = None,
         checkpoint: Optional[str] = None, **kw) -> "FlowPipeline":
    """WAFT warping-alone flow (reference ``later/WAFT/``): frame pair ->
    flow at a 1/7 grid + convex-upsampled full res, no correlation volume.
    ``input_hw`` must be multiples of 14 (the DINOv2 backbone's patch)."""
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.flow.waft import WAFT
    from monocular_depth_estimation_trt_tpu.ops.resize import resize
    from monocular_depth_estimation_trt_tpu.pipelines import FlowPipeline
    from monocular_depth_estimation_trt_tpu.weights.convert import convert_waft
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    spec = ModelSpec(model="waft", encoder=encoder, input_hw=tuple(input_hw),
                     precision=precision, extra=(("iters", iters),))
    model = WAFT(iters=iters, encoder=encoder, dtype=compute_dtype(precision))

    def forward(p, img1_u8, img2_u8, in_hw=tuple(input_hw)):
        x1 = resize(img1_u8.astype(jnp.float32), in_hw, method="linear")[None]
        x2 = resize(img2_u8.astype(jnp.float32), in_hw, method="linear")[None]
        flow_low, flow_up = model.apply({"params": p}, x1, x2)
        return {"flow_low": flow_low[0], "flow": flow_up[0]}

    example = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
    if params is None:
        params = get_or_convert_params(
            spec.artifact_name(), model, (example, example),
            torch_ckpt=checkpoint,
            converter=functools.partial(convert_waft, encoder=encoder),
        )
    return FlowPipeline(spec, forward, params)


@register("neuflow", fidelity="converter-verified")
def neuflow(input_hw: tuple = (288, 512), precision: str = "bf16",
            params: Any = None, checkpoint: Optional[str] = None,
            **kw) -> "FlowPipeline":
    """NeuFlow v2 efficient flow (reference ``NeuFlow/``): global matching at
    1/16 + windowed refinement; single ``flow`` output."""
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.flow.neuflow import NeuFlow
    from monocular_depth_estimation_trt_tpu.ops.resize import resize
    from monocular_depth_estimation_trt_tpu.pipelines import FlowPipeline
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    spec = ModelSpec(model="neuflow", input_hw=tuple(input_hw),
                     precision=precision)
    model = NeuFlow(dtype=compute_dtype(precision))

    def forward(p, img1_u8, img2_u8, in_hw=tuple(input_hw)):
        x1 = resize(img1_u8.astype(jnp.float32), in_hw, method="linear")[None]
        x2 = resize(img2_u8.astype(jnp.float32), in_hw, method="linear")[None]
        flow = model.apply({"params": p}, x1, x2)
        return {"flow": flow[0]}

    example = jnp.zeros((1, *input_hw, 3), jnp.float32)
    if params is None:
        from monocular_depth_estimation_trt_tpu.weights.convert import (
            convert_neuflow,
        )

        params = get_or_convert_params(
            spec.artifact_name(), model, (example, example),
            torch_ckpt=checkpoint, converter=convert_neuflow,
            layout_version=2,  # fused SepConvGRU z/r layout (_sep_gru)
        )
    return FlowPipeline(spec, forward, params)


@register("meflow", fidelity="converter-verified")
def meflow(iters: int = 20, input_hw: tuple = (288, 512),
           precision: str = "bf16", params: Any = None,
           use_scan: bool = False, checkpoint: Optional[str] = None,
           **kw) -> "FlowPipeline":
    """MeFlow memory-efficient flow via alternating 1D correlations
    (reference ``MeFlow/``). ``use_scan=True`` compiles in seconds at ~0.7x
    throughput (see the model docstring)."""
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.flow.meflow import MeFlow
    from monocular_depth_estimation_trt_tpu.ops.resize import resize
    from monocular_depth_estimation_trt_tpu.pipelines import FlowPipeline
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    spec = ModelSpec(model="meflow", input_hw=tuple(input_hw),
                     precision=precision,
                     extra=(("iters", iters),) + ((("scan", 1),) if use_scan else ()))
    model = MeFlow(iters=iters, use_scan=use_scan, dtype=compute_dtype(precision))

    def forward(p, img1_u8, img2_u8, in_hw=tuple(input_hw)):
        x1 = resize(img1_u8.astype(jnp.float32), in_hw, method="linear")[None]
        x2 = resize(img2_u8.astype(jnp.float32), in_hw, method="linear")[None]
        flow_low, flow_up = model.apply({"params": p}, x1, x2)
        return {"flow_low": flow_low[0], "flow": flow_up[0]}

    example = jnp.zeros((1, *input_hw, 3), jnp.float32)
    if params is None:
        from monocular_depth_estimation_trt_tpu.weights.convert import (
            convert_meflow,
        )

        params = get_or_convert_params(
            spec.artifact_name(), model, (example, example),
            torch_ckpt=checkpoint, converter=convert_meflow,
            layout_version=2,  # fused SepConvGRU z/r layout (_sep_gru)
        )
    return FlowPipeline(spec, forward, params)


@register("memfof", fidelity="converter-verified")
def memfof(iters: int = 8, input_hw: tuple = (288, 512),
           precision: str = "bf16", params: Any = None,
           checkpoint: Optional[str] = None, **kw):
    """MEMFOF 3-frame bidirectional flow with encoder feature caching
    (reference ``MEMFOF/``). Returns a TripletFlowPipeline: call with three
    frames; in video mode pass the previous call's cache."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from monocular_depth_estimation_trt_tpu.config import compute_dtype
    from monocular_depth_estimation_trt_tpu.models.flow.memfof import MEMFOF
    from monocular_depth_estimation_trt_tpu.ops.resize import resize
    from monocular_depth_estimation_trt_tpu.runtime.engine import Engine
    from monocular_depth_estimation_trt_tpu.weights.store import get_or_convert_params

    spec = ModelSpec(model="memfof", input_hw=tuple(input_hw),
                     precision=precision, extra=(("iters", iters),))
    model = MEMFOF(iters=iters, dtype=compute_dtype(precision))

    in_hw = tuple(input_hw)

    def forward(p, frames_u8):
        x = resize(frames_u8.astype(jnp.float32), in_hw, method="linear")[None]
        out = model.apply({"params": p}, x)
        return {"flow": out["flow"][0], "fmap_cache": out["fmap_cache"]}

    example = jnp.zeros((1, 3, *in_hw, 3), jnp.float32)
    if params is None:
        from monocular_depth_estimation_trt_tpu.weights.convert import (
            convert_memfof,
        )

        params = get_or_convert_params(
            spec.artifact_name(), model, example, torch_ckpt=checkpoint,
            converter=convert_memfof,
            layout_version=2,  # fused SepConvGRU z/r layout (_sep_gru)
        )

    class TripletFlowPipeline:
        def __init__(self):
            self.spec = spec
            self.params = params
            self._eng = None

        def engine(self):
            if self._eng is None:
                ex = jax.ShapeDtypeStruct((3, *in_hw, 3), jnp.uint8)
                self._eng = Engine(
                    forward, (self.params, ex), name=spec.artifact_name()
                )
            return self._eng

        def __call__(self, f1, f2, f3):
            from monocular_depth_estimation_trt_tpu.runtime.transfer import (
                device_get_chunked,
                device_put_chunked,
            )

            frames = device_put_chunked(
                np.stack([np.asarray(f1), np.asarray(f2), np.asarray(f3)])
            )
            out = self.engine()(self.params, frames)
            return {
                "flow": device_get_chunked(out["flow"]),
                "fmap_cache": out["fmap_cache"],  # device-resident
            }

        def benchmark(self, _in_hw=None, config=None):
            from monocular_depth_estimation_trt_tpu.runtime.benchmark import (
                benchmark as _bench,
            )

            eng = self.engine()
            eng.compile()
            rng = np.random.default_rng(0)
            frames = jax.device_put(
                rng.integers(0, 255, (3, *in_hw, 3), dtype=np.uint8)
            )
            return _bench(
                lambda f: eng(self.params, f), (frames,), config=config,
                name=spec.artifact_name(),
            )

        def stream(self):
            return MEMFOFSession(self)

    class MEMFOFSession:
        """Video mode: per step only the newest frame is encoded; the two
        older feature maps come from the previous step's cache (reference
        ``MEMFOF/wrapper.py:210-232,277-281``)."""

        def __init__(self, pipe):
            self.pipe = pipe
            self._frames = []  # device frames (resized model inputs)
            self._cache = None

            def cached_forward(p, f1, f2, f3, c1, c2):
                x = jnp.stack([f1, f2, f3], axis=0).astype(jnp.float32)[None]
                out = model.apply({"params": p}, x, fmap_cache=(c1, c2, None))
                return {"flow": out["flow"][0], "fmap_cache": out["fmap_cache"]}

            self._cached_eng = None
            self._cached_forward = cached_forward

        def step(self, frame_u8):
            """Push one frame; returns bidirectional flow for the previous
            frame once >=3 frames have been seen (else None)."""
            from monocular_depth_estimation_trt_tpu.ops.resize import resize as _rs

            f = jax.jit(lambda u: _rs(u.astype(jnp.float32), in_hw,
                                      method="linear").astype(jnp.uint8))(
                jax.device_put(np.asarray(frame_u8))
            )
            self._frames.append(f)
            if len(self._frames) < 3:
                return None
            self._frames = self._frames[-3:]
            f1, f2, f3 = self._frames
            if self._cache is None:
                out = pipe_self(f1, f2, f3)
                self._cache = out["fmap_cache"]
                return out["flow"]
            c1, c2 = self._cache[1], self._cache[2]
            if self._cached_eng is None:
                from monocular_depth_estimation_trt_tpu.runtime.engine import (
                    Engine as _E,
                )

                self._cached_eng = _E(
                    self._cached_forward,
                    (pipe_self.params, f1, f2, f3, c1, c2),
                    name=spec.artifact_name() + "_stream",
                )
            out = self._cached_eng(pipe_self.params, f1, f2, f3, c1, c2)
            self._cache = out["fmap_cache"]
            from monocular_depth_estimation_trt_tpu.runtime.transfer import (
                device_get_chunked,
            )

            return device_get_chunked(out["flow"])

    pipe_self = TripletFlowPipeline()
    return pipe_self


# -- SLAM recipes (reference later/MegaSaM, later/VIPE, later/WildGS-SLAM) --
# The reference vendors NO code for these three staging dirs — each README
# is a clone-and-run recipe around networks served above. The TPU-first
# systems live in slam/ (dense-flow LM-BA, Gaussian-splat mapping); the
# registry entries wire them to the zoo's flow/depth/calibration pipelines.
# Fidelity is "approximated" by construction: there is no reference graph
# to converter-verify against, only the papers' problem definitions.


@register("megasam", fidelity="approximated")
def megasam(**kw) -> "Any":
    """MegaSaM casual-video structure+motion (``later/MegaSaM/README.md``;
    arXiv 2412.04463): DA disparity + RAFT flow -> keyframe LM bundle
    adjustment with focal refinement -> consistent video depth. Use
    ``mdet slam megasam --video ...`` or ``pipe.run(frames)``."""
    from monocular_depth_estimation_trt_tpu.slam.recipes import MegaSaMPipeline

    return MegaSaMPipeline(**kw)


@register("vipe", fidelity="approximated")
def vipe(**kw) -> "Any":
    """ViPE video pose engine (``later/VIPE/README.md``): GeoCalib
    intrinsics + flow BA + UniDepth metric promotion -> poses, intrinsics,
    metric depth. Use ``mdet slam vipe --video ...``."""
    from monocular_depth_estimation_trt_tpu.slam.recipes import ViPEPipeline

    return ViPEPipeline(**kw)


@register("wildgs_slam", fidelity="approximated")
def wildgs_slam(**kw) -> "Any":
    """WildGS-SLAM (``later/WildGS-SLAM/README.md``; arXiv 2504.03886):
    flow-BA tracking + uncertainty-weighted Gaussian-splat mapping, robust
    to dynamic scenes. Use ``mdet slam wildgs_slam --video ...``."""
    from monocular_depth_estimation_trt_tpu.slam.recipes import WildGSSLAMPipeline

    return WildGSSLAMPipeline(**kw)
