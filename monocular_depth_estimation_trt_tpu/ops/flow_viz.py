"""Optical-flow visualization: the Middlebury color wheel.

The reference uses the standard ``flow_viz`` color-wheel encoding for RAFT /
NeuFlow / MeFlow / MEMFOF MP4 outputs (``RAFT/onnx2trt.py:150-196``). This is
that well-known encoding (Baker et al., "A Database and Evaluation
Methodology for Optical Flow") implemented on-device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=1)
def color_wheel() -> np.ndarray:
    """(55, 3) RGB color wheel."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel.astype(np.float32)


def flow_to_color(flow: jax.Array, clip: float | None = None) -> jax.Array:
    """(H, W, 2) flow -> (H, W, 3) uint8 RGB (normalized by max magnitude)."""
    u = flow[..., 0]
    v = flow[..., 1]
    if clip is not None:
        u = jnp.clip(u, -clip, clip)
        v = jnp.clip(v, -clip, clip)
    rad = jnp.sqrt(u * u + v * v)
    rad_max = jnp.maximum(jnp.max(rad), 1e-5)
    u = u / rad_max
    v = v / rad_max
    rad = rad / rad_max

    wheel = jnp.asarray(color_wheel() / 255.0)  # (ncols, 3)
    ncols = wheel.shape[0]
    a = jnp.arctan2(-v, -u) / jnp.pi  # [-1, 1]
    fk = (a + 1.0) / 2.0 * (ncols - 1)
    k0 = jnp.floor(fk).astype(jnp.int32)
    k1 = (k0 + 1) % ncols
    f = (fk - k0)[..., None]
    col0 = wheel[k0]
    col1 = wheel[k1]
    col = (1.0 - f) * col0 + f * col1
    # saturate toward white for small magnitudes
    col = 1.0 - rad[..., None] * (1.0 - col)
    return (col * 255.0).astype(jnp.uint8)
