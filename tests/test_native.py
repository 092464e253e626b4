"""Native host-IO library: build, decode, ordered pump, round-trips."""

import os

import numpy as np
import pytest

import cv2

from monocular_depth_estimation_trt_tpu.runtime import native


pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain/OpenCV unavailable"
)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(10):
        img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
        # encode the frame index into the top-left pixel block for ordering
        img[:10, :10] = i * 20
        p = str(d / f"f_{i:03d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_decode_resize(image_dir):
    out = native.decode_resize(image_dir[0], (60, 80))
    assert out is not None and out.shape == (60, 80, 3)
    ref = cv2.cvtColor(cv2.imread(image_dir[0]), cv2.COLOR_BGR2RGB)
    ref = cv2.resize(ref, (80, 60), interpolation=cv2.INTER_LINEAR)
    assert np.array_equal(out, ref)


def test_pump_ordered_delivery(image_dir):
    with native.FramePump.from_images(image_dir, (120, 160), threads=4) as pump:
        seen = []
        for idx, frame in pump:
            assert frame.shape == (120, 160, 3)
            # ordering marker survives (no resize here)
            assert frame[0, 0, 0] == idx * 20
            seen.append(idx)
        assert seen == list(range(10))
        assert pump.decoded == 10


def test_pump_with_resize(image_dir):
    with native.FramePump.from_images(image_dir, (64, 96), threads=2) as pump:
        n = sum(1 for _ in pump)
    assert n == 10


def test_encode_jpg(tmp_path, rng):
    rgb = rng.integers(0, 255, (50, 60, 3), dtype=np.uint8)
    p = str(tmp_path / "out.jpg")
    assert native.encode_jpg(p, rgb)
    back = cv2.imread(p)
    assert back is not None and back.shape == (50, 60, 3)


def test_pump_stress_small_ring(tmp_path, rng):
    """Deadlock regression: more workers than ring slots, slow consumer.

    The original slot-acquisition order (index before slot) deadlocked when
    all ring slots were held by newer frames while the consumer waited on an
    older frame whose worker was blocked on a free slot."""
    import time

    d = tmp_path / "stress"
    d.mkdir()
    paths = []
    for i in range(40):
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        p = str(d / f"s_{i:03d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    for trial in range(3):
        with native.FramePump.from_images(paths, (64, 64), ring=2, threads=6) as pump:
            seen = []
            for idx, frame in pump:
                time.sleep(0.002)  # slow consumer widens the race window
                seen.append(idx)
            assert seen == list(range(40)), f"trial {trial}: {seen[:5]}..."


def test_pump_video(tmp_path, rng):
    vp = str(tmp_path / "clip.mp4")
    writer = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 64))
    for i in range(6):
        writer.write(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
    writer.release()
    with native.FramePump.from_video(vp, (64, 96)) as pump:
        frames = [idx for idx, _ in pump]
    assert frames == list(range(6))
