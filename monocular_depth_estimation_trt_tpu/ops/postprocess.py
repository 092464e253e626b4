"""On-device depth postprocessing.

Reference postprocessing runs on the host with torch: reshape, bilinear
upsample to the original resolution with ``align_corners=True``, clamp to
[1e-3, 1e3] (reference ``Depth_Anything_V2/onnx2trt.py:208-211``), then
min-max normalization (relative models, ``infer.py:116-117``) or inverse-depth
normalization clipped to [0.1 m, 250 m] (metric models, ``onnx2trt.py:228-231``)
for visualization. All of it is fused here into the jitted program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.ops.resize import resize_hw


def upsample_depth(
    depth: jax.Array,
    out_hw: Tuple[int, int],
    clamp: Optional[Tuple[float, float]] = (1e-3, 1e3),
    align_corners: bool = True,
) -> jax.Array:
    """(..., h, w) depth -> bilinear (align_corners=True) resize + clamp."""
    d = resize_hw(depth.astype(jnp.float32), out_hw, "linear", align_corners)
    if clamp is not None:
        d = jnp.clip(d, clamp[0], clamp[1])
    return d


def normalize_depth_for_viz(depth: jax.Array) -> jax.Array:
    """Relative-depth min-max normalization to [0, 1]
    (reference ``Depth_Anything_V2/infer.py:116-117``)."""
    dmin = jnp.min(depth)
    dmax = jnp.max(depth)
    return (depth - dmin) / jnp.maximum(dmax - dmin, 1e-12)


def inverse_depth_normalize(
    depth: jax.Array, near: float = 0.1, far: float = 250.0
) -> jax.Array:
    """Metric-depth visualization: normalized inverse depth clipped to the
    [near, far] range (reference ``Depth_Anything_V2/onnx2trt.py:228-231``)."""
    inv = 1.0 / jnp.maximum(depth, 1e-12)
    max_inv = jnp.minimum(jnp.max(inv), 1.0 / near)
    min_inv = jnp.maximum(1.0 / far, jnp.min(inv))
    return (inv - min_inv) / jnp.maximum(max_inv - min_inv, 1e-12)


def quantile_normalize(
    value: jax.Array, lo_q: float = 0.001, hi_q: float = 0.99
) -> jax.Array:
    """MoGe-style robust normalization by quantiles
    (reference ``MoGe_2/infer.py:164-168``)."""
    lo = jnp.quantile(value, lo_q)
    hi = jnp.quantile(value, hi_q)
    return jnp.clip((value - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)


def crop_pad(
    x: jax.Array, pad: Tuple[int, int, int, int]
) -> jax.Array:
    """Remove (top, bottom, left, right) padding from (..., H, W)."""
    t, b, l, r = pad
    h, w = x.shape[-2], x.shape[-1]
    return x[..., t : h - b if b else h, l : w - r if r else w]
