"""Point-track visualization (the reference's ``cotracker.utils.visualizer``
role, ``later/CoTracker3/infer.py:31-32``): draw tracked points with short
motion trails onto the video and write an MP4."""

from __future__ import annotations

from typing import Optional

import numpy as np

from monocular_depth_estimation_trt_tpu.utils.logging import log


def _track_color(i: int, n: int):
    """Stable per-track color from the turbo LUT."""
    from monocular_depth_estimation_trt_tpu.ops.colormap import turbo_lut

    lut = turbo_lut()
    c = lut[int(i / max(n - 1, 1) * 255)] * 255.0
    return int(c[2]), int(c[1]), int(c[0])  # BGR


def visualize_tracks(
    video: np.ndarray,
    tracks: np.ndarray,
    visibility: Optional[np.ndarray],
    out_path: str,
    *,
    fps: float = 20.0,
    trail: int = 8,
) -> str:
    """video (T, H, W, 3) uint8 RGB; tracks (1, T, N, 2) pixel (x, y);
    visibility (1, T, N, 1) in [0, 1] or None. Writes ``out_path`` MP4."""
    import cv2

    t_total, h, w = video.shape[:3]
    tr = tracks[0]
    vis = None if visibility is None else visibility[0, ..., 0] > 0.5
    n = tr.shape[1]
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for t in range(min(t_total, tr.shape[0])):
        frame = cv2.cvtColor(video[t], cv2.COLOR_RGB2BGR).copy()
        for i in range(n):
            color = _track_color(i, n)
            for s in range(max(0, t - trail), t):
                p0 = tuple(np.round(tr[s, i]).astype(int))
                p1 = tuple(np.round(tr[s + 1, i]).astype(int))
                cv2.line(frame, p0, p1, color, 1, cv2.LINE_AA)
            if vis is None or vis[t, i]:
                cv2.circle(frame, tuple(np.round(tr[t, i]).astype(int)), 3,
                           color, -1, cv2.LINE_AA)
        writer.write(frame)
    writer.release()
    log(f"wrote {out_path}")
    return out_path
