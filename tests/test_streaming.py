"""Streaming apps: worker queues, video loop, VGGT windowed session."""

import os
import time

import numpy as np
import pytest

import cv2

from monocular_depth_estimation_trt_tpu.apps.streaming import (
    FrameWorker,
    VGGTStreamingSession,
    run_video,
)


def test_frame_worker_backpressure():
    processed = []

    def process(frame):
        time.sleep(0.01)
        processed.append(frame.sum())
        return frame * 2

    w = FrameWorker(process).start()
    try:
        for i in range(20):
            w.submit(np.full((4, 4), i, np.uint8))
            time.sleep(0.002)
        deadline = time.time() + 2
        while w.latest() is None and time.time() < deadline:
            time.sleep(0.01)
        assert w.latest() is not None
        # bounded queues drop frames rather than queueing unboundedly
        assert len(processed) < 20
    finally:
        w.stop()


def test_frame_worker_error_recovery():
    """Failed frames fall back to passthrough (reference
    Depth_Pro/onnx2trt_webcam.py:113-115)."""
    calls = {"n": 0}

    def process(frame):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("boom")
        return frame

    w = FrameWorker(process).start()
    try:
        w.submit(np.ones((2, 2), np.uint8))
        deadline = time.time() + 2
        while w.latest() is None and time.time() < deadline:
            time.sleep(0.01)
        assert w.latest() is not None  # raw frame passthrough
    finally:
        w.stop()


def test_run_video_roundtrip(tmp_path, rng):
    vp = str(tmp_path / "in.mp4")
    writer = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for _ in range(4):
        writer.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    writer.release()

    class FakePipe:
        def __call__(self, rgb, viz=False):
            d = rgb[..., 0].astype(np.float32)
            return {"depth": d, "viz": np.stack([rgb[..., 0]] * 3, -1)}

    out = run_video(FakePipe(), vp, str(tmp_path / "out.mp4"), max_frames=3)
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3


def test_run_video_pipelined_one_in_flight(tmp_path, rng):
    """A pipeline that accepts device_out takes the pipelined path: frame N
    dispatches BEFORE frame N-1's output is written, every frame still
    lands in the MP4, and the tail frame is flushed after the loop."""
    vp = str(tmp_path / "in.mp4")
    writer = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for _ in range(4):
        writer.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    writer.release()

    calls = []

    class DevOutPipe:
        def __call__(self, rgb, viz=False, device_out=False):
            assert device_out, "run_video should request device outputs"
            calls.append(rgb.shape)
            d = rgb[..., 0].astype(np.float32)
            return {"depth": d, "viz": np.stack([rgb[..., 0]] * 3, -1)}

    out = run_video(DevOutPipe(), vp, str(tmp_path / "out.mp4"), max_frames=4)
    cap = cv2.VideoCapture(out)
    # all 4 frames land, including the final in-flight frame's tail flush
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
    assert len(calls) == 4


def test_vggt_streaming_session(rng):
    """KV-cache session over real (tiny) VGGT weights: static shapes, the
    cache advances, and outputs are finite for more steps than the window."""
    import jax
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.models.vggt import VGGT, VGGTConfig
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    cfg = VGGTConfig(
        dim=64, depth=2, num_heads=4, head_layers=(0, 1, 0, 1),
        encoder="vits", causal=True,
        vit_config=ViTConfig(dim=48, depth=2, num_heads=2,
                             pretrain_img_size=70),
    )
    joint = VGGT(cfg=cfg, dtype=jnp.float32, attn_impl="xla",
                 with_camera=False)
    x0 = jnp.zeros((1, 1, 70, 70, 3), jnp.float32)
    params = jax.jit(joint.init)(jax.random.PRNGKey(0), x0)["params"]

    sess = VGGTStreamingSession(params, cfg=cfg, window=3, input_size=70,
                                dtype=jnp.float32, attn_impl="xla")
    for i in range(4):  # one more step than the window (ring eviction)
        out = sess.step(rng.integers(0, 255, (70, 70, 3), dtype=np.uint8))
    assert out["depth"].shape == (70, 70)
    assert np.isfinite(np.asarray(out["depth"])).all()
    assert int(sess._cache["t"]) == 4


def test_run_flow_frames_pipelined_and_sync(tmp_path, rng):
    """Flow-over-frames writes one viz frame per consecutive pair, through
    both the pipelined (device_out) and the plain synchronous path."""
    from monocular_depth_estimation_trt_tpu.apps.streaming import (
        run_flow_frames,
    )

    d = tmp_path / "frames"
    d.mkdir()
    for i in range(4):
        cv2.imwrite(str(d / f"f{i:03d}.png"),
                    rng.integers(0, 255, (36, 64, 3), dtype=np.uint8))

    def make_out(f1):
        return {"flow": np.zeros((*f1.shape[:2], 2), np.float32),
                "viz": np.stack([f1[..., 0]] * 3, -1)}

    class SyncFlow:
        def __call__(self, f1, f2, viz=False):
            return make_out(f1)

    class DevOutFlow:
        def __init__(self):
            self.dev_out_seen = 0

        def __call__(self, f1, f2, viz=False, device_out=False):
            self.dev_out_seen += int(device_out)
            return make_out(f1)

    for pipe in (SyncFlow(), DevOutFlow()):
        out = run_flow_frames(pipe, str(d), str(tmp_path / "flow.mp4"),
                              size_wh=(64, 36))
        cap = cv2.VideoCapture(out)
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3  # 4 frames: 3 pairs
        cap.release()
    assert pipe.dev_out_seen == 3  # pipelined path actually taken


def test_video_sync_env_forces_synchronous_path(tmp_path, rng, monkeypatch):
    """MDET_VIDEO_SYNC=1 (the hardware A/B knob) serves device_out-capable
    pipelines through the old synchronous path."""
    vp = str(tmp_path / "in.mp4")
    writer = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for _ in range(3):
        writer.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    writer.release()

    seen = []

    class Pipe:
        def __call__(self, rgb, viz=False, device_out=False):
            seen.append(device_out)
            return {"depth": rgb[..., 0].astype(np.float32),
                    "viz": np.stack([rgb[..., 0]] * 3, -1)}

    monkeypatch.setenv("MDET_VIDEO_SYNC", "1")
    out = run_video(Pipe(), vp, str(tmp_path / "out.mp4"), max_frames=3)
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
    assert seen == [False, False, False]  # called WITHOUT device_out
