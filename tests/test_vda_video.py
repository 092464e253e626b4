"""Video Depth Anything windowed serving (tiny config, CPU).

Exercises the upstream ``run.py`` protocol end-to-end at the pipeline level:
single-image serving as a 1-frame window, sub-window clips, the overlapping
window loop with scale/shift stitching, and the whole-video MP4 writer.
"""

import os

import numpy as np
import pytest

TINY_MODEL = dict(num_heads=2, head_features=16,
                  head_out_channels=(8, 16, 32, 32), out_indices=(0, 1, 2, 3))


@pytest.fixture(scope="module")
def pipe():
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.weights.store import (
        allow_random_weights,
    )

    kw = dict(TINY_MODEL)
    kw["vit_config"] = ViTConfig(dim=64, depth=4, num_heads=2,
                                 pretrain_img_size=70)
    with allow_random_weights():
        return build_pipeline(
            "video_depth_anything", input_size=28, window=4, overlap=2,
            precision="fp32", model_kw=kw,
        )


def _video(t, seed=0, hw=(32, 48)):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (t, *hw, 3), dtype=np.uint8)


def test_single_image_serving(pipe):
    out = pipe(_video(1)[0])
    assert out["depth"].shape == (32, 48)
    assert np.isfinite(out["depth"]).all()
    assert float(np.asarray(out["depth"]).min()) >= 0.0


def test_video_depth_short_clip(pipe):
    d = pipe.video_depth(_video(3))
    assert d.shape == (3, 28, 28)
    assert np.isfinite(d).all()


def test_video_depth_windowed_stitching(pipe):
    d = pipe.video_depth(_video(9, seed=1))
    assert d.shape == (9, 28, 28)
    assert np.isfinite(d).all()
    # stitched output must not collapse to a constant
    assert float(d.std()) > 0.0


def test_write_depth_video(tmp_path, pipe):
    import cv2

    from monocular_depth_estimation_trt_tpu.apps.streaming import (
        write_depth_video,
    )

    src = os.path.join(tmp_path, "src.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 32))
    for f in _video(6, seed=2):
        w.write(f[..., ::-1])
    w.release()

    out = os.path.join(tmp_path, "depth.mp4")
    write_depth_video(pipe, src, out)
    assert os.path.exists(out) and os.path.getsize(out) > 0
