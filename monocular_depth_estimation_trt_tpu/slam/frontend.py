"""SLAM frontend: keyframing, pair graph, and BA-problem assembly.

Host-side orchestration (like the reference's app scripts) around the
framework's jitted flow/depth engines: pick keyframes by accumulated flow
magnitude, connect them in a radius graph, run dense flow along both
directions of every edge, convert forward/backward consistency into
per-correspondence weights, and sample everything onto the static BA grid.

This is the shared tracking substrate of all three SLAM recipes
(``later/MegaSaM/README.md``, ``later/VIPE/README.md``,
``later/WildGS-SLAM/README.md``): MegaSaM and WildGS-SLAM build their
keyframe graphs from RAFT-style dense flow; ViPE adds intrinsics and
metric-depth channels on top of the same machinery.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.slam.ba import (
    BAProblem,
    flow_consistency_weights,
)


@dataclass(frozen=True)
class FrontendConfig:
    grid_stride: int = 16  # BA grid stride in flow-resolution pixels
    kf_min_flow: float = 8.0  # mean |flow| (px) that spawns a keyframe
    kf_max_interval: int = 12  # force a keyframe after this many frames
    kf_stride: int = 2  # candidate spacing when scanning for keyframes
    max_keyframes: int = 16
    edge_radius: int = 2  # connect keyframes (i, i+1 .. i+radius)
    sigma_consistency: float = 1.5
    depth_is_disparity: bool = True  # DA-family nets emit disparity


def scale_coords(p: np.ndarray, src: float, dst: float) -> np.ndarray:
    """Map pixel-center coords from a src-length axis to a dst-length axis.

    The half-pixel-center form ``(p + 0.5) * (dst / src) - 0.5`` (plain
    ``p * dst / src`` is biased by up to half a source pixel at the
    borders — the same convention ops/resize.py uses on device)."""
    return (p + 0.5) * (dst / src) - 0.5


def _bilinear(img: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Sample (H, W[, C]) at float coords (clamped); host-side numpy."""
    h, w = img.shape[:2]
    x = np.clip(x, 0.0, w - 1.0)
    y = np.clip(y, 0.0, h - 1.0)
    x0 = np.clip(np.floor(x).astype(np.int64), 0, w - 2)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, h - 2)
    fx = (x - x0).reshape(x.shape + (1,) * (img.ndim - 2))
    fy = (y - y0).reshape(y.shape + (1,) * (img.ndim - 2))
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return out


class Frontend:
    """Wraps a flow pipeline + a mono-depth pipeline into BA inputs.

    ``flow_fn(frame1_u8, frame2_u8) -> (H', W', 2)`` and
    ``depth_fn(frame_u8) -> (H, W)`` may be the framework pipelines
    (``build_pipeline("raft")``, ``build_pipeline("depth_anything_v2")``)
    or injected callables (tests use synthetic ones).
    """

    def __init__(self, flow_fn, depth_fn, cfg: FrontendConfig = FrontendConfig()):
        self.flow_fn = flow_fn
        self.depth_fn = depth_fn
        self.cfg = cfg

    # -- keyframing -------------------------------------------------------
    def select_keyframes(self, frames: Sequence[np.ndarray]) -> List[int]:
        """Greedy scan: a frame becomes a keyframe when the mean flow from
        the previous keyframe exceeds ``kf_min_flow`` px (or after
        ``kf_max_interval`` frames)."""
        cfg = self.cfg
        n = len(frames)
        kf = [0]
        last = 0
        i = cfg.kf_stride
        while i < n and len(kf) < cfg.max_keyframes:
            flow = np.asarray(self.flow_fn(frames[last], frames[i]))
            mean_mag = float(np.mean(np.linalg.norm(flow, axis=-1)))
            if mean_mag >= cfg.kf_min_flow or (i - last) >= cfg.kf_max_interval:
                kf.append(i)
                last = i
            i += cfg.kf_stride
        return kf

    # -- pair graph -------------------------------------------------------
    def build_edges(self, num_kf: int) -> np.ndarray:
        """Radius graph over keyframes, both directions per pair."""
        edges = []
        for i in range(num_kf):
            for r in range(1, self.cfg.edge_radius + 1):
                j = i + r
                if j < num_kf:
                    edges.append((i, j))
                    edges.append((j, i))
        # reshape keeps the (0, 2) shape when there are no edges (a single
        # keyframe) — np.asarray([]) alone would be 1-D and crash the BA
        # residuals' edges[:, 0] indexing
        return np.asarray(edges, np.int32).reshape(-1, 2)

    # -- problem assembly -------------------------------------------------
    def build_problem(
        self, frames: Sequence[np.ndarray], kf_idx: Sequence[int]
    ) -> Tuple[BAProblem, dict]:
        """Run flow over every edge + mono depth on every keyframe, and
        sample both onto the BA grid. Returns the device-ready problem and
        an aux dict (flow resolution, grid shape, per-keyframe full
        disparity for the CVD stage)."""
        cfg = self.cfg
        kf_frames = [np.asarray(frames[i]) for i in kf_idx]
        k = len(kf_frames)
        edges = self.build_edges(k)

        # one probe to learn the flow resolution
        probe = np.asarray(self.flow_fn(kf_frames[0], kf_frames[0]))
        fh, fw = probe.shape[:2]
        st = cfg.grid_stride
        us = np.arange(st // 2, fw, st, dtype=np.float32)
        vs = np.arange(st // 2, fh, st, dtype=np.float32)
        uu, vv = np.meshgrid(us, vs)
        pu, pv = uu.ravel(), vv.ravel()
        p = pu.shape[0]

        # forward flow per ordered edge; cache by (i, j)
        flows = {}
        for (i, j) in map(tuple, edges):
            if (i, j) not in flows:
                flows[(i, j)] = np.asarray(
                    self.flow_fn(kf_frames[i], kf_frames[j])
                )

        e = edges.shape[0]
        flow_grid = np.zeros((e, p, 2), np.float32)
        weight = np.zeros((e, p), np.float32)
        for n, (i, j) in enumerate(map(tuple, edges)):
            fwd = flows[(i, j)]
            bwd = flows[(j, i)]
            fg = _bilinear(fwd, pu, pv)  # (P, 2)
            # backward flow at the forward-displaced location
            bg = _bilinear(bwd, pu + fg[:, 0], pv + fg[:, 1])
            flow_grid[n] = fg
            weight[n] = np.asarray(
                flow_consistency_weights(
                    jnp.asarray(fg), jnp.asarray(bg), cfg.sigma_consistency
                )
            )
            # discard correspondences leaving the frame
            tu, tv = pu + fg[:, 0], pv + fg[:, 1]
            inside = (tu >= 0) & (tu <= fw - 1) & (tv >= 0) & (tv <= fh - 1)
            weight[n] *= inside.astype(np.float32)

        # mono disparity per keyframe, sampled at the grid (scaled to the
        # depth map's own resolution), median-normalized per frame (BA's
        # affine channel owns the global alignment)
        idepth = np.zeros((k, p), np.float32)
        full_disp = []
        for n, f in enumerate(kf_frames):
            d = np.asarray(self.depth_fn(f))
            dh, dw = d.shape[:2]
            disp = d if cfg.depth_is_disparity else 1.0 / np.maximum(d, 1e-6)
            med = float(np.median(disp)) or 1.0
            disp = disp / med
            full_disp.append(disp)
            idepth[n] = _bilinear(
                disp, scale_coords(pu, fw, dw), scale_coords(pv, fh, dh)
            )

        prob = BAProblem(
            points_uv=jnp.asarray(np.stack([pu, pv], -1)),
            idepth=jnp.asarray(idepth),
            edges=jnp.asarray(edges),
            flow=jnp.asarray(flow_grid),
            weight=jnp.asarray(weight),
        )
        aux = {
            "flow_hw": (fh, fw),
            "grid_hw": (len(vs), len(us)),
            "full_disparity": full_disp,
        }
        return prob, aux


def make_pipeline_flow_fn(flow_pipe) -> Any:
    """Adapt a framework FlowPipeline to the frontend contract."""

    def fn(f1: np.ndarray, f2: np.ndarray) -> np.ndarray:
        return np.asarray(flow_pipe(f1, f2)["flow"])

    return fn


def make_pipeline_depth_fn(depth_pipe) -> Any:
    def fn(f: np.ndarray) -> np.ndarray:
        return np.asarray(depth_pipe(f)["depth"])

    return fn
