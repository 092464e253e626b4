"""Turbo colormap on device.

The reference colorizes on the host via matplotlib's "turbo" cmap applied to a
uint8-quantized normalized depth map (reference
``Depth_Anything_V2/infer.py:116-121``, ``onnx2trt.py:225-237``). Matplotlib
listed colormaps are a 256-entry LUT — so the exact same mapping is a 256x3
constant table + one gather on device, leaving only the JPEG encode on host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=1)
def turbo_lut() -> np.ndarray:
    """(256, 3) float32 RGB LUT identical to ``plt.get_cmap('turbo')``."""
    try:
        from matplotlib import pyplot as plt

        lut = np.asarray(plt.get_cmap("turbo")(np.arange(256) / 255.0))[:, :3]
        return lut.astype(np.float32)
    except Exception:  # matplotlib unavailable: fall back to the polynomial fit
        return _turbo_polynomial().astype(np.float32)


def _turbo_polynomial() -> np.ndarray:
    # Google's published turbo polynomial approximation (public domain).
    x = np.linspace(0.0, 1.0, 256)
    r = np.polyval([662.821, -1741.1, 1526.52, -490.205, 35.8260, 0.13572138][::-1], x)
    g = np.polyval([442.766, -1275.3, 1091.16, -308.936, 4.84659, 0.09140261][::-1], x)
    b = np.polyval([-604.58, 1423.12, -1088.4, 258.843, 21.3461, 0.10667330][::-1], x)
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 1.0)


def turbo_colormap(norm01: jax.Array, as_uint8: bool = True) -> jax.Array:
    """Map (..., H, W) values in [0, 1] to turbo RGB.

    Quantizes to uint8 indices first, matching the reference's
    ``(depth_norm * 255).astype(uint8)`` then ``cmap(idx)`` path exactly.
    """
    lut = jnp.asarray(turbo_lut())
    idx = jnp.clip(norm01 * 255.0, 0.0, 255.0).astype(jnp.uint8)
    rgb = lut[idx.astype(jnp.int32)]
    if as_uint8:
        return (rgb * 255.0).astype(jnp.uint8)
    return rgb


@functools.lru_cache(maxsize=1)
def spectral_lut() -> np.ndarray:
    """(256, 3) float32 RGB LUT identical to ``plt.get_cmap('Spectral')``
    (the colormap the DINOv3 depther figures use,
    reference ``later/DINOv3/infer.py:44``)."""
    try:
        from matplotlib import pyplot as plt

        lut = np.asarray(plt.get_cmap("Spectral")(np.arange(256) / 255.0))[:, :3]
        return lut.astype(np.float32)
    except Exception:  # ColorBrewer 11-anchor fallback, linearly interpolated
        anchors = np.array([
            [158, 1, 66], [213, 62, 79], [244, 109, 67], [253, 174, 97],
            [254, 224, 139], [255, 255, 191], [230, 245, 152],
            [171, 221, 164], [102, 194, 165], [50, 136, 189], [94, 79, 162],
        ], dtype=np.float32) / 255.0
        x = np.linspace(0.0, 1.0, 256)
        xp = np.linspace(0.0, 1.0, len(anchors))
        return np.stack(
            [np.interp(x, xp, anchors[:, c]) for c in range(3)], axis=-1
        ).astype(np.float32)


def spectral_colormap(norm01: jax.Array, as_uint8: bool = True) -> jax.Array:
    """Map (..., H, W) values in [0, 1] to Spectral RGB (uint8-quantized
    indices, same protocol as :func:`turbo_colormap`)."""
    lut = jnp.asarray(spectral_lut())
    idx = jnp.clip(norm01 * 255.0, 0.0, 255.0).astype(jnp.uint8)
    rgb = lut[idx.astype(jnp.int32)]
    if as_uint8:
        return (rgb * 255.0).astype(jnp.uint8)
    return rgb
