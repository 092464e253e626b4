"""Streaming apps: video files and live webcam.

Host-side structure mirrors the reference's latency-oriented serving path
(``Depth_Pro/onnx2trt_webcam.py:36-44,117-180``): a capture thread feeding a
bounded ``deque(maxlen=2)`` frame queue (drop-oldest backpressure), a model
worker thread calling the jitted pipeline, and a ``deque(maxlen=1)`` result
queue for display — identical thread/queue discipline, with the TPU pipeline
in place of the TRT engine.
"""

from __future__ import annotations

import collections
import os
import threading
import time
from typing import Callable, Optional

import numpy as np

from monocular_depth_estimation_trt_tpu.utils.logging import log


class FrameWorker:
    """Producer/consumer pair around ``process(frame) -> result``."""

    def __init__(self, process: Callable[[np.ndarray], np.ndarray]):
        self.process = process
        self.frame_queue = collections.deque(maxlen=2)
        self.result_queue = collections.deque(maxlen=1)
        self.lock = threading.Lock()
        self.running = False
        self.model_fps = 0.0
        self._thread: Optional[threading.Thread] = None

    def submit(self, frame: np.ndarray) -> None:
        with self.lock:
            self.frame_queue.append(frame)

    def latest(self):
        with self.lock:
            return self.result_queue[-1] if self.result_queue else None

    def _loop(self) -> None:
        while self.running:
            frame = None
            with self.lock:
                if self.frame_queue:
                    frame = self.frame_queue.popleft()
            if frame is None:
                time.sleep(0.001)
                continue
            t0 = time.perf_counter()
            try:
                result = self.process(frame)
            except Exception as e:  # graceful frame-skip, reference :113-115
                log(f"frame processing failed: {e!r}", tag="WARN")
                result = frame
            self.model_fps = 1.0 / max(time.perf_counter() - t0, 1e-9)
            with self.lock:
                self.result_queue.append(result)

    def start(self) -> "FrameWorker":
        self.running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.running = False
        if self._thread is not None:
            self._thread.join(timeout=2.0)


def run_video(
    pipeline,
    video_path: str,
    out_path: str,
    *,
    overlay_fps: bool = True,
    max_frames: Optional[int] = None,
) -> str:
    """MP4 -> colorized depth MP4 with FPS overlay (reference
    ``Depth_Pro/onnx2trt_video.py:41-85``)."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"[MDET] cannot open video: {video_path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    # temporal models (FlashDepth) expose a stateful per-video session whose
    # recurrent state rides on device between frames; each video is a fresh
    # sequence (reference later/FlashDepth/wrapper.py:13 start_new_sequence)
    runner = pipeline.stream() if hasattr(pipeline, "stream") else pipeline
    # pipelined decode/compute/encode: dispatch frame N on the device
    # (device_out=True), then fetch + colorize + write frame N-1 while N
    # computes — over the axon tunnel the per-frame host readback (~RTT +
    # transfer) hides behind device time. Stateful stream sessions without
    # a device_out kwarg keep the synchronous per-frame path.
    from monocular_depth_estimation_trt_tpu.runtime.transfer import (
        supports_device_out,
        tree_get_chunked,
    )

    # MDET_VIDEO_SYNC=1 forces the synchronous path (A/B measurement knob
    # for the overlap win; scripts/hw_pending.sh emits both rows)
    pipelined = (supports_device_out(runner)
                 and not os.environ.get("MDET_VIDEO_SYNC"))
    n = 0
    last_emit = None  # overlay FPS = emitted-frame period (true throughput)

    def emit(out, dt_fallback):
        nonlocal last_emit
        now = time.perf_counter()
        dt = (now - last_emit) if last_emit is not None else dt_fallback
        last_emit = now
        viz = cv2.cvtColor(np.asarray(out["viz"]), cv2.COLOR_RGB2BGR)
        if viz.shape[:2] != (h, w):
            viz = cv2.resize(viz, (w, h))
        if overlay_fps:
            cv2.putText(
                viz,
                f"FPS: {1.0 / max(dt, 1e-9):.1f}",
                (20, 40),
                cv2.FONT_HERSHEY_SIMPLEX,
                1.0,
                (255, 255, 255),
                2,
            )
        writer.write(viz)

    pending = None  # (dispatch time, device outputs) — one frame in flight
    while True:
        ok, frame_bgr = cap.read()
        if not ok or (max_frames and n >= max_frames):
            break
        rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
        t0 = time.perf_counter()
        if pipelined:
            out_dev = runner(rgb, viz=True, device_out=True)
            if pending is not None:
                p_t0, p_out = pending
                emit(tree_get_chunked(p_out), time.perf_counter() - p_t0)
            pending = (t0, out_dev)
        else:
            out = runner(rgb, viz=True)
            emit(out, time.perf_counter() - t0)
        n += 1
    if pending is not None:
        p_t0, p_out = pending
        emit(tree_get_chunked(p_out), time.perf_counter() - p_t0)
    cap.release()
    writer.release()
    log(f"wrote {n} frames -> {out_path}")
    return out_path


def run_flow_frames(
    flow_pipeline,
    frames_dir: str,
    out_path: str,
    *,
    size_wh: tuple = (512, 288),
    max_pairs: Optional[int] = None,
) -> str:
    """Consecutive-frame optical flow over an image directory -> color-wheel
    MP4 (reference ``RAFT/onnx2trt.py:150-196``)."""
    import os

    import cv2

    exts = {".png", ".jpg", ".jpeg", ".bmp"}
    paths = sorted(
        os.path.join(frames_dir, f)
        for f in os.listdir(frames_dir)
        if os.path.splitext(f)[1].lower() in exts
    )
    if len(paths) < 2:
        raise FileNotFoundError(f"[MDET] need >=2 frames in {frames_dir}")
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), 15.0, size_wh
    )
    # same one-in-flight software pipeline as run_video: dispatch pair N,
    # then fetch + write pair N-1 while N computes on the device
    from monocular_depth_estimation_trt_tpu.runtime.transfer import (
        supports_device_out,
        tree_get_chunked,
    )

    pipelined = supports_device_out(flow_pipeline)

    def emit(out):
        viz = cv2.cvtColor(np.asarray(out["viz"]), cv2.COLOR_RGB2BGR)
        if (viz.shape[1], viz.shape[0]) != size_wh:
            viz = cv2.resize(viz, size_wh)
        writer.write(viz)

    prev = cv2.cvtColor(cv2.imread(paths[0]), cv2.COLOR_BGR2RGB)
    n = 0
    pending = None
    for p in paths[1:]:
        if max_pairs and n >= max_pairs:
            break
        cur = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        if pipelined:
            out_dev = flow_pipeline(prev, cur, viz=True, device_out=True)
            if pending is not None:
                emit(tree_get_chunked(pending))
            pending = out_dev
        else:
            emit(flow_pipeline(prev, cur, viz=True))
        prev = cur
        n += 1
    if pending is not None:
        emit(tree_get_chunked(pending))
    writer.release()
    log(f"wrote {n} flow frames -> {out_path}")
    return out_path


class VGGTStreamingSession:
    """KV-cache causal streaming on VGGT weights (the StreamVGGT serving
    pattern, reference ``StreamVGGT/`` — whose streaming inference the
    reference could NOT export, ``StreamVGGT/onnx_export.py:25-55``).

    Per step, ONE view runs through the aggregator; global attention reads
    the cached keys/values of previous views (``models/streamvggt.py``), so
    per-step cost is ~independent of the window length — vs the reference's
    (and round-1's) full-window recompute, which scaled with S. The cache is
    a fixed-capacity ring (sliding window); stepwise outputs exactly match
    the view-causal joint model (``tests/test_streamvggt.py``).
    """

    def __init__(self, params, *, cfg=None, window: int = 4,
                 input_size: int = 518, dtype=None, attn_impl: str = "auto",
                 with_camera: bool = False, with_point_head: bool = False):
        import jax
        import jax.numpy as jnp

        from monocular_depth_estimation_trt_tpu.models.streamvggt import (
            StreamingVGGT,
            init_stream_cache,
        )
        from monocular_depth_estimation_trt_tpu.models.vggt import VGGTConfig

        from monocular_depth_estimation_trt_tpu.ops.quant import as_variables

        cfg = cfg or VGGTConfig()
        self.window = window
        self.input_size = input_size
        self.params = params
        dtype = dtype or jnp.bfloat16
        # int8 serving bundle ({"params", "q8"}, e.g. from an int8 vggt
        # pipeline): identical param paths mean the joint model's calibrated
        # scales serve the streaming graph unchanged
        from collections.abc import Mapping

        quant = (isinstance(params, Mapping) and "q8" in params
                 and "params" in params)
        model = StreamingVGGT(cfg=cfg, max_views=window, dtype=dtype,
                              attn_impl=attn_impl, with_camera=with_camera,
                              with_point_head=with_point_head,
                              quant="serve" if quant else "none")
        grid = (input_size // cfg.patch_size, input_size // cfg.patch_size)
        self._cache = init_stream_cache(cfg, 1, grid, window, dtype)
        self._jit = jax.jit(
            lambda p, v, c: model.apply(as_variables(p), v, c)
        )

    def reset(self):
        import jax

        self._cache = jax.tree_util.tree_map(
            lambda x: x * 0 if hasattr(x, "dtype") else x, self._cache
        )

    def pure_step(self, params, frame_u8, cache):
        """One causal step as a PURE function (params/cache explicit) —
        the single definition shared by the stateful ``step`` and the
        serialized-artifact export (``registry`` ``stream_export_bundle``),
        so the two can never drift."""
        import jax.numpy as jnp

        from monocular_depth_estimation_trt_tpu.ops.preprocess import (
            preprocess_pad_square,
        )

        x = preprocess_pad_square(jnp.asarray(frame_u8), self.input_size)
        out, cache = self._jit(params, x, cache)
        result = {
            "depth": out["depth"][0],
            "depth_conf": out["depth_conf"][0],
        }
        for k in ("pose_enc", "world_points", "world_points_conf"):
            if k in out:
                result[k] = out[k][0]
        return result, cache

    def step(self, frame_u8: np.ndarray):
        """frame_u8: (H, W, 3) RGB uint8 -> dict with this view's
        depth/conf (device arrays)."""
        result, self._cache = self.pure_step(self.params, frame_u8,
                                             self._cache)
        return result


def run_flow_triplets(
    triplet_pipeline,
    frames_dir: str,
    out_path: str,
    *,
    size_wh: tuple = (512, 288),
    max_triplets: Optional[int] = None,
) -> str:
    """MEMFOF-style 3-frame bidirectional flow over a frame directory ->
    forward-flow MP4, reusing the encoder feature cache across steps
    (reference ``MEMFOF/wrapper.py:210-232``)."""
    import os

    import cv2
    import numpy as np

    from monocular_depth_estimation_trt_tpu.ops.flow_viz import flow_to_color

    exts = {".png", ".jpg", ".jpeg", ".bmp"}
    paths = sorted(
        os.path.join(frames_dir, f)
        for f in os.listdir(frames_dir)
        if os.path.splitext(f)[1].lower() in exts
    )
    if len(paths) < 3:
        raise FileNotFoundError(f"[MDET] need >=3 frames in {frames_dir}")
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), 15.0,
                             size_wh)
    load = lambda p: cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
    n = 0
    for i in range(1, len(paths) - 1):
        if max_triplets and n >= max_triplets:
            break
        out = triplet_pipeline(load(paths[i - 1]), load(paths[i]), load(paths[i + 1]))
        fwd = out["flow"][1]  # center->next
        import jax.numpy as jnp

        viz = np.asarray(flow_to_color(jnp.asarray(fwd)))
        viz = cv2.cvtColor(viz, cv2.COLOR_RGB2BGR)
        if (viz.shape[1], viz.shape[0]) != size_wh:
            viz = cv2.resize(viz, size_wh)
        writer.write(viz)
        n += 1
    writer.release()
    log(f"wrote {n} flow frames -> {out_path}")
    return out_path


def extract_frames_from_video(
    video_path: str, out_dir: str, *, every: int = 1, max_frames: Optional[int] = None
) -> int:
    """MP4 -> numbered PNG frames (reference ``gen_video2imgs.py:4-35``)."""
    import os

    import cv2

    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"[MDET] cannot open video: {video_path}")
    n = saved = 0
    while True:
        ok, frame = cap.read()
        if not ok or (max_frames and saved >= max_frames):
            break
        if n % every == 0:
            cv2.imwrite(os.path.join(out_dir, f"frame_{saved:05d}.png"), frame)
            saved += 1
        n += 1
    cap.release()
    log(f"extracted {saved} frames -> {out_dir}")
    return saved


def run_webcam(pipeline, camera: int | str = 0, *, display: bool = True) -> None:
    """Live webcam/IP-cam viewer (reference ``Depth_Pro/onnx2trt_webcam.py``;
    IP camera URL support at :195)."""
    import cv2

    cap = cv2.VideoCapture(camera)
    if not cap.isOpened():
        raise RuntimeError(f"[MDET] cannot open camera {camera!r}")

    def process(frame_bgr):
        rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
        out = pipeline(rgb, viz=True)
        return cv2.cvtColor(out["viz"], cv2.COLOR_RGB2BGR)

    worker = FrameWorker(process).start()
    frames, t_start = 0, time.perf_counter()
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            worker.submit(frame)
            result = worker.latest()
            frames += 1
            if display and result is not None:
                view = result.copy()
                cam_fps = frames / max(time.perf_counter() - t_start, 1e-9)
                cv2.putText(
                    view,
                    f"cam {cam_fps:.1f} fps / model {worker.model_fps:.1f} fps",
                    (20, 40),
                    cv2.FONT_HERSHEY_SIMPLEX,
                    0.8,
                    (255, 255, 255),
                    2,
                )
                cv2.imshow("mdet", view)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
    finally:
        worker.stop()
        cap.release()
        if display:
            cv2.destroyAllWindows()


def write_depth_video(
    pipeline,
    video_path: str,
    out_path: str,
    *,
    max_frames: Optional[int] = None,
) -> str:
    """Whole-video depth for windowed batch models (Video Depth Anything's
    ``run.py`` protocol): read all frames, run ``pipeline.video_depth`` (one
    jitted program per overlapping window, stitched on host), colorize with
    ONE global normalization over the full video — the temporally consistent
    visualization the per-frame path cannot produce — and write the MP4."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"[MDET] cannot open video: {video_path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames = []
    while True:
        ok, bgr = cap.read()
        if not ok or (max_frames and len(frames) >= max_frames):
            break
        frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise ValueError(f"[MDET] no frames decoded from {video_path}")
    video = np.stack(frames)
    h, w = video.shape[1:3]

    t0 = time.perf_counter()
    depth = pipeline.video_depth(video)  # (T, ih, iw)
    dt = time.perf_counter() - t0
    log(f"video depth: {len(frames)} frames in {dt:.2f}s "
        f"({len(frames) / max(dt, 1e-9):.1f} FPS)")

    if getattr(pipeline.spec, "metric", False):
        # Metric checkpoints emit depth in meters; colorize inverse depth so
        # near=bright / far=dark matches the upstream disparity-style
        # visualization (Video-Depth-Anything run.py grayscale convention).
        depth = 1.0 / np.maximum(depth, 1e-4)
    lo, hi = float(depth.min()), float(depth.max())
    norm = ((depth - lo) / max(hi - lo, 1e-6) * 255.0).astype(np.uint8)
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for d in norm:
        viz = cv2.applyColorMap(d, cv2.COLORMAP_INFERNO)
        writer.write(cv2.resize(viz, (w, h)))
    writer.release()
    log(f"wrote {out_path}")
    return out_path
