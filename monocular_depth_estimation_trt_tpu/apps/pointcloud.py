"""Depth -> point-cloud export (reference ``onnx2trt_pointcloud.py`` family).

The reference unprojects on the host with numpy and writes via open3d
(``Depth_Anything_V2/onnx2trt_pointcloud.py:60-84``); here the unprojection
runs on device (``ops/camera.py``) and the PLY/GLB write is dependency-free
(``apps/ply.py``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from monocular_depth_estimation_trt_tpu.apps.ply import write_glb_pointcloud, write_ply
from monocular_depth_estimation_trt_tpu.ops.camera import (
    unproject_depth,
    unproject_intrinsics,
)


def depth_to_pointcloud(
    depth: np.ndarray,
    image_rgb: Optional[np.ndarray] = None,
    *,
    focal: float = 470.4,
    intrinsics: Optional[np.ndarray] = None,
    z_limit: Optional[float] = None,
    stride: int = 1,
):
    """Returns (points (N,3), colors (N,3) uint8 or None).

    focal default matches the reference's hard-coded value for 518-sized maps
    (``Depth_Anything_V2/onnx2trt_pointcloud.py``). ``z_limit`` drops far
    points; ``stride`` subsamples for interactive viewing.
    """
    d = jnp.asarray(depth[::stride, ::stride])
    if intrinsics is not None:
        K = jnp.asarray(intrinsics, dtype=jnp.float32)
        if stride != 1:
            K = K.at[:2].divide(stride)
        pts = unproject_intrinsics(d, K)
    else:
        pts = unproject_depth(d, focal / stride)
    pts = np.asarray(pts).reshape(-1, 3)

    colors = None
    if image_rgb is not None:
        colors = np.asarray(image_rgb[::stride, ::stride]).reshape(-1, 3)
        if colors.dtype != np.uint8:
            colors = np.clip(colors * 255, 0, 255).astype(np.uint8)

    if z_limit is not None:
        keep = pts[:, 2] < z_limit
        pts = pts[keep]
        if colors is not None:
            colors = colors[keep]
    return pts, colors


def depth_to_pointcloud_file(
    depth: np.ndarray,
    image_rgb: Optional[np.ndarray],
    path: str,
    *,
    focal: float = 470.4,
    intrinsics: Optional[np.ndarray] = None,
    z_limit: Optional[float] = None,
    stride: int = 1,
) -> str:
    pts, colors = depth_to_pointcloud(
        depth,
        image_rgb,
        focal=focal,
        intrinsics=intrinsics,
        z_limit=z_limit,
        stride=stride,
    )
    if path.endswith(".glb"):
        return write_glb_pointcloud(path, pts, colors)
    return write_ply(path, pts, colors)
