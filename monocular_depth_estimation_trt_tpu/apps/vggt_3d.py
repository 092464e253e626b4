"""VGGT 3D export: depth + pose -> world-space point cloud
(reference ``VGGT/onnx2trt2.py:240-292``)."""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from monocular_depth_estimation_trt_tpu.apps.ply import write_ply
from monocular_depth_estimation_trt_tpu.ops.camera import unproject_to_world
from monocular_depth_estimation_trt_tpu.utils.logging import log


def export_world_points(
    out: dict,
    image_rgb: Optional[np.ndarray],
    path: str,
    *,
    conf_threshold: float = 1.5,
    stride: int = 2,
) -> str:
    """``out`` is a VGGT pipeline result (depth, depth_conf, pose_enc,
    extrinsic, focal_px). Unprojects depth through the predicted camera into
    world space and writes a colored ``.ply``.

    ``depth_conf`` follows the upstream ``expp1`` activation (range
    [1, inf)); the default threshold 1.5 mirrors the reference's
    conf-percentile filtering (``VGGT/onnx2trt2.py:274-292``)."""
    depth = jnp.asarray(out["depth"])[::stride, ::stride]
    h, w = depth.shape
    f = float(out["focal_px"]) / stride
    K = jnp.asarray(
        [[f, 0.0, w / 2.0], [0.0, f, h / 2.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    E = jnp.asarray(out["extrinsic"], jnp.float32)
    pts = np.asarray(unproject_to_world(depth, K, E)).reshape(-1, 3)

    colors = None
    if image_rgb is not None:
        import cv2

        img = cv2.resize(image_rgb, (w, h))
        colors = img.reshape(-1, 3).astype(np.uint8)

    if "depth_conf" in out:
        conf = np.asarray(out["depth_conf"])[::stride, ::stride].reshape(-1)
        keep = conf > conf_threshold
        pts = pts[keep]
        if colors is not None:
            colors = colors[keep]

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    write_ply(path, pts, colors)
    log(f"wrote {len(pts)} world points -> {path}")
    return path
