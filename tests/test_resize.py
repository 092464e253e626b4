"""Resize parity vs the reference's host-side oracles (cv2 + torch).

The reference preprocesses with cv2.resize(INTER_CUBIC)
(``Depth_Anything_V2/onnx2trt.py:118``) and postprocesses with
torch.F.interpolate(bilinear, align_corners=True) (``onnx2trt.py:209``); our
on-device matmul resampler must match both to float precision.
"""

import numpy as np
import pytest

import cv2
import torch
import torch.nn.functional as F

from monocular_depth_estimation_trt_tpu.ops.resize import (
    constrain_to_multiple_of,
    lower_bound_size,
    resample_matrix,
    resize,
    resize_hw,
)


def _img(rng, h, w, c=3):
    return rng.random((h, w, c)).astype(np.float32)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((64, 48), (128, 96)), ((100, 80), (37, 29)), ((518, 518), (296, 296)),
     ((32, 32), (45, 45))],
)
def test_cubic_matches_cv2(rng, in_hw, out_hw):
    img = _img(rng, *in_hw)
    ours = np.asarray(resize(img, out_hw, method="cubic"))
    ref = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_CUBIC)
    assert np.max(np.abs(ours - ref)) < 1e-4


@pytest.mark.parametrize("in_hw,out_hw", [((40, 60), (80, 120)), ((80, 120), (40, 60))])
def test_cubic_matches_torch_bicubic(rng, in_hw, out_hw):
    img = _img(rng, *in_hw)
    ours = np.asarray(resize(img, out_hw, method="cubic"))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    ref = F.interpolate(t, out_hw, mode="bicubic", align_corners=False)
    ref = ref[0].permute(1, 2, 0).numpy()
    assert np.max(np.abs(ours - ref)) < 1e-4


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("in_hw,out_hw", [((37, 37), (74, 74)), ((19, 23), (37, 37)), ((518, 518), (360, 640))])
def test_linear_matches_torch(rng, align, in_hw, out_hw):
    img = _img(rng, *in_hw)
    ours = np.asarray(resize(img, out_hw, method="linear", align_corners=align))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    ref = F.interpolate(t, out_hw, mode="bilinear", align_corners=align)
    ref = ref[0].permute(1, 2, 0).numpy()
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_linear_upscale_matches_cv2(rng):
    img = _img(rng, 50, 70)
    ours = np.asarray(resize(img, (100, 140), method="linear"))
    ref = cv2.resize(img, (140, 100), interpolation=cv2.INTER_LINEAR)
    assert np.max(np.abs(ours - ref)) < 1e-5


@pytest.mark.parametrize("in_hw,out_hw", [((100, 100), (37, 53)), ((64, 64), (16, 16))])
def test_antialias_matches_torch(rng, in_hw, out_hw):
    img = _img(rng, *in_hw)
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    for method, mode in [("linear", "bilinear"), ("cubic", "bicubic")]:
        ours = np.asarray(resize(img, out_hw, method=method, antialias=True))
        ref = F.interpolate(t, out_hw, mode=mode, align_corners=False, antialias=True)
        ref = ref[0].permute(1, 2, 0).numpy()
        assert np.max(np.abs(ours - ref)) < 1e-4, method


def test_resize_hw_depth_map(rng):
    depth = rng.random((1, 37, 37)).astype(np.float32)
    ours = np.asarray(resize_hw(depth, (518, 518)))
    ref = F.interpolate(
        torch.from_numpy(depth)[None], (518, 518), mode="bilinear", align_corners=True
    )[0].numpy()
    assert np.max(np.abs(ours - ref)) < 1e-5


def test_identity_fast_path(rng):
    img = _img(rng, 32, 32)
    out = np.asarray(resize(img, (32, 32), method="cubic"))
    assert np.array_equal(out, img)


def test_nearest_matches_cv2(rng):
    img = _img(rng, 33, 47)
    ours = np.asarray(resize(img, (66, 94), method="nearest"))
    ref = cv2.resize(img, (94, 66), interpolation=cv2.INTER_NEAREST)
    assert np.max(np.abs(ours - ref)) == 0.0


def test_constrain_to_multiple_of():
    # reference Depth_Anything_V2/onnx2trt.py:87-96
    assert constrain_to_multiple_of(518) == 518
    assert constrain_to_multiple_of(520) == 518
    assert constrain_to_multiple_of(527.9) == 532
    assert constrain_to_multiple_of(530, max_val=528) == 518
    assert constrain_to_multiple_of(3, min_val=14) == 14


def test_lower_bound_size():
    # square stays square at the target
    assert lower_bound_size(518, 518, 518) == (518, 518)
    # landscape: height is the bound, width scales up to x14 multiple
    h, w = lower_bound_size(480, 640, 518)
    assert h == 518 and w % 14 == 0 and w >= 518
    assert abs(w / h - 640 / 480) < 0.05


def test_resample_matrix_rows_sum_to_one():
    for method in ("cubic", "linear"):
        for align in (False, True):
            m = resample_matrix(37, 97, method, align)
            assert np.allclose(m.sum(axis=1), 1.0, atol=1e-6)
