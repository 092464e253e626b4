"""CoTracker3 online sliding-window session (tiny config, CPU).

Exercises the upstream hub API the reference uses
(``later/CoTracker3/infer.py:22-28``): is_first_step initialization,
chunked calls, window continuation seeding, short-chunk padding, and the
full-video convenience loop + MP4 visualization.
"""

import numpy as np
import pytest

TINY_MODEL = dict(dim=16, d_model=32, iters=2, blocks=1, levels=2, radius=2,
                  num_heads=4)


@pytest.fixture(scope="module")
def pipe():
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.weights.store import (
        allow_random_weights,
    )

    with allow_random_weights():
        return build_pipeline(
            "cotracker3", window=4, grid_size=2, input_hw=(32, 48),
            precision="fp32", model_kw=TINY_MODEL,
        )


def _video(t, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (t, 32, 48, 3), dtype=np.uint8)


def test_online_api_matches_reference_usage(pipe):
    video = _video(10)
    # reference usage: init, then chunks of step*2 == window frames
    assert pipe(None, is_first_step=True, grid_size=2) is None
    outs = []
    for ind in range(0, video.shape[0] - pipe.step, pipe.step):
        tracks, vis = pipe(video[ind: ind + pipe.step * 2])
        outs.append((tracks, vis))
    assert len(outs) >= 2
    for tracks, vis in outs:
        assert tracks.shape[0] == 1 and tracks.shape[2:] == (4, 2)
        assert vis.shape[-1] == 1
        assert np.isfinite(tracks).all()
        assert ((vis >= 0) & (vis <= 1)).all()


def test_track_video_and_short_chunk_padding(pipe):
    video = _video(7, seed=1)  # not a multiple of the window
    tracks, vis = pipe.track_video(video)
    assert tracks.shape == (1, 7, 4, 2)
    assert vis.shape == (1, 7, 4, 1)
    assert np.isfinite(tracks).all()


def test_visualize_tracks(tmp_path, pipe):
    from monocular_depth_estimation_trt_tpu.apps.tracking import (
        visualize_tracks,
    )

    video = _video(6, seed=2)
    tracks, vis = pipe.track_video(video)
    out = str(tmp_path / "tracked.mp4")
    visualize_tracks(video, tracks, vis, out)
    import os

    assert os.path.getsize(out) > 500


def test_odd_window_continuation():
    """window=5 (odd): the continuation seed must still assemble exactly
    `window` frames (regression: the repeat count was window-step, which
    only equals step for even windows)."""
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.weights.store import (
        allow_random_weights,
    )

    with allow_random_weights():
        p = build_pipeline(
            "cotracker3", window=5, grid_size=2, input_hw=(32, 48),
            precision="fp32", model_kw=TINY_MODEL,
        )
    video = _video(12, seed=3)
    tracks, vis = p.track_video(video)
    assert tracks.shape == (1, 12, 4, 2)
    assert np.isfinite(tracks).all()


def test_call_time_grid_size_mismatch_errors():
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.weights.store import (
        allow_random_weights,
    )

    with allow_random_weights():
        p = build_pipeline(
            "cotracker3", window=4, grid_size=2, input_hw=(32, 48),
            precision="fp32", model_kw=TINY_MODEL,
        )
    with pytest.raises(ValueError, match="grid_size"):
        p(None, is_first_step=True, grid_size=9)
