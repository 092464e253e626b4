"""The committed video fixture (data/example_video.mp4) and its generator.

The fixture backs the raft_video end-to-end BENCH_ALL row (the reference's
RAFT/onnx2trt.py:150-196 video loop); these gates keep it decodable and the
generator deterministic so a regenerated fixture doesn't silently change
the benchmark's workload.
"""

import importlib.util
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

ROOT = os.path.join(os.path.dirname(__file__), "..")
FIXTURE = os.path.join(ROOT, "data", "example_video.mp4")


def _gen():
    spec = importlib.util.spec_from_file_location(
        "gen_video_fixture",
        os.path.join(ROOT, "scripts", "gen_video_fixture.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generator_is_deterministic():
    g = _gen()
    a = g.make_frames(n=4)
    b = g.make_frames(n=4)
    assert a.shape == (4, g.H, g.W, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    # frames actually move (flow models need non-identical pairs)
    assert np.mean(np.abs(a[1].astype(int) - a[0].astype(int))) > 1.0


def test_committed_fixture_decodes():
    assert os.path.exists(FIXTURE), "data/example_video.mp4 not committed"
    cap = cv2.VideoCapture(FIXTURE)
    assert cap.isOpened()
    n = 0
    shapes = set()
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        shapes.add(frame.shape)
        n += 1
    cap.release()
    g = _gen()
    assert n == g.FRAMES
    assert shapes == {(g.H, g.W, 3)}


def test_extract_frames_roundtrip(tmp_path):
    from monocular_depth_estimation_trt_tpu.apps.streaming import (
        extract_frames_from_video,
    )

    out = tmp_path / "frames"
    extract_frames_from_video(FIXTURE, str(out))
    files = sorted(os.listdir(out))
    assert len(files) == _gen().FRAMES
    img = cv2.imread(str(out / files[0]))
    assert img is not None and img.shape[2] == 3
