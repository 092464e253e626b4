"""On-device image preprocessing.

The reference does all preprocessing on the host with numpy/cv2 — BGR->RGB,
/255, aspect-keeping resize to a multiple of 14, mean/std normalize, HWC->CHW
(reference ``Depth_Anything_V2/onnx2trt.py:98-130``) — and ships the result
over PCIe every frame. Here the host only decodes the frame; the uint8 HWC
image is sent to device once and everything else is fused into the jitted
model program.

Layout note: the framework is channels-last (NHWC) end to end — the native
TPU conv layout — so there is no CHW transpose anywhere.

Variants covered (one per reference preprocessing family):

* :func:`preprocess_lower_bound` — DPT-style lower-bound multiple-of-14 resize
  (Depth Anything V2/AC/Distill, reference ``onnx2trt.py:98-130``);
* :func:`preprocess_resize` — plain resize to a fixed square + normalize
  (Depth Pro 1536, reference ``Depth_Pro/onnx2trt.py:96-114``);
* :func:`preprocess_pad_square` — pad to square, resize (VGGT, reference
  ``VGGT/onnx2trt.py:80-110``);
* :func:`preprocess_keep_ratio_pad` — keep-ratio resize + mean-pad to canvas
  (Metric3D V2, reference ``Metric3D_V2/infer.py:73-96``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from monocular_depth_estimation_trt_tpu.config import IMAGENET_MEAN, IMAGENET_STD
from monocular_depth_estimation_trt_tpu.ops.resize import lower_bound_size, resize


def to_float_rgb(img: jax.Array, bgr: bool = False) -> jax.Array:
    """uint8 (..., H, W, 3) -> float32 RGB in [0, 1]."""
    x = img.astype(jnp.float32) / 255.0
    if bgr:
        x = x[..., ::-1]
    return x


def normalize(
    img: jax.Array,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> jax.Array:
    mean_a = jnp.asarray(mean, dtype=img.dtype)
    std_a = jnp.asarray(std, dtype=img.dtype)
    return (img - mean_a) / std_a


def preprocess_lower_bound(
    img_u8: jax.Array,
    target: int = 518,
    multiple: int = 14,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    *,
    bgr: bool = False,
    method: str = "cubic",
) -> jax.Array:
    """DPT 'lower_bound' preprocessing, fused on device.

    Input: uint8 (H, W, 3). Output: float32 (1, H', W', 3) with H', W' the
    lower-bound multiple-of-``multiple`` size (both static given the input
    shape). Matches reference ``Depth_Anything_V2/onnx2trt.py:98-130``
    (cv2.INTER_CUBIC + ImageNet normalize) to float precision.
    """
    h, w = img_u8.shape[-3], img_u8.shape[-2]
    new_h, new_w = lower_bound_size(h, w, target, multiple)
    x = to_float_rgb(img_u8, bgr=bgr)
    x = resize(x, (new_h, new_w), method=method)
    x = normalize(x, mean, std)
    if x.ndim == 3:
        x = x[None]
    return x


def preprocess_resize(
    img_u8: jax.Array,
    out_hw: Tuple[int, int],
    mean: Sequence[float] = (0.5, 0.5, 0.5),
    std: Sequence[float] = (0.5, 0.5, 0.5),
    *,
    bgr: bool = False,
    method: str = "linear",
) -> jax.Array:
    """Plain resize + normalize (Depth Pro: bilinear to 1536 then 0.5/0.5)."""
    x = to_float_rgb(img_u8, bgr=bgr)
    x = resize(x, out_hw, method=method)
    x = normalize(x, mean, std)
    if x.ndim == 3:
        x = x[None]
    return x


def pad_square_size(h: int, w: int) -> Tuple[int, int, int]:
    """(pad_top, pad_left, side) for centered pad-to-square."""
    side = max(h, w)
    return (side - h) // 2, (side - w) // 2, side


def preprocess_pad_square(
    img_u8: jax.Array,
    out_size: int = 518,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    *,
    bgr: bool = False,
    pad_value: float = 1.0,
    method: str = "cubic",
) -> jax.Array:
    """VGGT preprocessing: center-pad to square (white), resize to
    ``out_size``, normalize (reference ``VGGT/onnx2trt.py:80-110``).

    The reference resizes square->1024 then bilinearly 1024->518; this
    resizes directly to ``out_size`` (one resampling instead of two —
    differences are sub-1e-3 in image units and below the depth parity bar).
    """
    h, w = img_u8.shape[-3], img_u8.shape[-2]
    top, left, side = pad_square_size(h, w)
    x = to_float_rgb(img_u8, bgr=bgr)
    pad_width = [(top, side - h - top), (left, side - w - left), (0, 0)]
    if x.ndim == 4:
        pad_width = [(0, 0)] + pad_width
    x = jnp.pad(x, pad_width, constant_values=pad_value)
    x = resize(x, (out_size, out_size), method=method)
    x = normalize(x, mean, std)
    if x.ndim == 3:
        x = x[None]
    return x


def preprocess_keep_ratio_pad(
    img_u8: jax.Array,
    canvas_hw: Tuple[int, int],
    mean255: Sequence[float] = (123.675, 116.28, 103.53),
    std255: Sequence[float] = (58.395, 57.12, 57.375),
    *,
    bgr: bool = False,
    method: str = "linear",
):
    """Metric3D V2 preprocessing: keep-ratio resize into a fixed canvas,
    pad the borders with the dataset mean, normalize in 0-255 space
    (reference ``Metric3D_V2/infer.py:73-96``).

    Returns (batched tensor, pad_info=(top, bottom, left, right), scale).
    """
    h, w = img_u8.shape[-3], img_u8.shape[-2]
    ch, cw = canvas_hw
    scale = min(ch / h, cw / w)
    new_h, new_w = round(h * scale), round(w * scale)
    x = img_u8.astype(jnp.float32)
    if bgr:
        x = x[..., ::-1]
    x = resize(x, (new_h, new_w), method=method)
    pad_t = (ch - new_h) // 2
    pad_b = ch - new_h - pad_t
    pad_l = (cw - new_w) // 2
    pad_r = cw - new_w - pad_l
    mean_a = jnp.asarray(mean255, dtype=x.dtype)
    x = x - mean_a  # pad with mean == pad with zeros after subtraction
    pad_width = [(pad_t, pad_b), (pad_l, pad_r), (0, 0)]
    if x.ndim == 4:
        pad_width = [(0, 0)] + pad_width
    x = jnp.pad(x, pad_width)
    x = x / jnp.asarray(std255, dtype=x.dtype)
    if x.ndim == 3:
        x = x[None]
    return x, (pad_t, pad_b, pad_l, pad_r), scale
