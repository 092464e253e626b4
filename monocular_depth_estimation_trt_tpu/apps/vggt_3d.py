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


def world_points_from_output(
    out: dict,
    image_rgb: Optional[np.ndarray],
    *,
    conf_threshold: float = 1.5,
    stride: int = 2,
):
    """``out`` is a single-view VGGT pipeline result (depth, depth_conf,
    extrinsic, focal_px). Unprojects depth through the predicted camera into
    world space; returns ``(points (N, 3), colors (N, 3) | None)``.

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
    return pts, colors


def export_world_points(
    out: dict,
    image_rgb: Optional[np.ndarray],
    path: str,
    *,
    conf_threshold: float = 1.5,
    stride: int = 2,
) -> str:
    """Single-view world-point export -> colored ``.ply``."""
    pts, colors = world_points_from_output(
        out, image_rgb, conf_threshold=conf_threshold, stride=stride
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    write_ply(path, pts, colors)
    log(f"wrote {len(pts)} world points -> {path}")
    return path


def export_multi_view_points(
    mv_out: dict,
    images_rgb,
    path: str,
    input_size: int = 518,
    *,
    conf_threshold: float = 1.5,
    stride: int = 2,
) -> str:
    """Merged world-space cloud from a VGGTPipeline.multi_view result
    (depth (S, H, W), depth_conf, pose_enc (S, 9)): every view unprojects
    through ITS OWN predicted camera into the shared world frame — the
    multi-view reconstruction the reference's S=1 export cannot produce."""
    from monocular_depth_estimation_trt_tpu.ops.camera import (
        extrinsics_from_quat_trans,
        fov_to_focal,
    )

    all_pts, all_colors = [], []
    s = np.asarray(mv_out["depth"]).shape[0]
    for i in range(s):
        pose = jnp.asarray(mv_out["pose_enc"][i])
        view = {
            "depth": mv_out["depth"][i],
            "depth_conf": mv_out["depth_conf"][i],
            "extrinsic": extrinsics_from_quat_trans(pose[3:7], pose[:3]),
            "focal_px": fov_to_focal(jnp.rad2deg(pose[7]), input_size),
        }
        img = images_rgb[i] if images_rgb is not None else None
        pts, colors = world_points_from_output(
            view, img, conf_threshold=conf_threshold, stride=stride
        )
        all_pts.append(pts)
        if colors is not None:
            all_colors.append(colors)
    pts = np.concatenate(all_pts)
    colors = np.concatenate(all_colors) if all_colors else None
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    write_ply(path, pts, colors)
    log(f"wrote {len(pts)} world points from {s} views -> {path}")
    return path
