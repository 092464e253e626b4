#!/usr/bin/env python
"""Generate the tiny committed video fixture ``data/example_video.mp4``.

Deterministic synthetic motion (a textured background translating at a few
px/frame plus two moving discs) so optical-flow models produce structured,
non-degenerate flow fields — the analogue of the reference's ``video_frames/``
sample loop (``RAFT/onnx2trt.py:150-196``) that we can ship in-repo.

16 frames @ 288x512 keeps the file ~100 KB. Regenerate with:
    python scripts/gen_video_fixture.py [--out data/example_video.mp4]
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np

H, W, FRAMES, FPS = 288, 512, 16, 10


def make_frames(h: int = H, w: int = W, n: int = FRAMES) -> np.ndarray:
    rng = np.random.default_rng(7)
    # smooth random texture, larger than the viewport so it can translate
    pad = 4 * n
    base = rng.uniform(0, 255, (h + pad, w + pad)).astype(np.float32)
    base = cv2.GaussianBlur(base, (0, 0), 9)
    base = cv2.normalize(base, None, 30, 220, cv2.NORM_MINMAX)
    tex = cv2.applyColorMap(base.astype(np.uint8), cv2.COLORMAP_BONE)

    frames = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        dx, dy = 3 * i, 2 * i  # background translates (3, 2) px/frame
        f = tex[dy:dy + h, dx:dx + w].copy()
        # two discs moving against the background
        c1 = (int(w * 0.25 + 6 * i), int(h * 0.4))
        c2 = (int(w * 0.75 - 4 * i), int(h * 0.65 + 3 * i))
        cv2.circle(f, c1, 28, (40, 90, 200), -1)
        cv2.circle(f, c2, 20, (200, 120, 40), -1)
        frames[i] = f
    return frames


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "example_video.mp4"))
    args = ap.parse_args()

    frames = make_frames()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    wr = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"), FPS,
                         (W, H))
    if not wr.isOpened():
        raise SystemExit("cv2.VideoWriter failed to open (no mp4v codec?)")
    for f in frames:
        wr.write(f[..., ::-1])  # frames are RGB; VideoWriter wants BGR
    wr.release()
    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes, "
          f"{FRAMES} frames @ {W}x{H})")


if __name__ == "__main__":
    main()
