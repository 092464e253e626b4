"""Preprocess / postprocess / colormap / camera op parity.

Oracles are the reference's host-side numpy formulas
(``Depth_Anything_V2/onnx2trt.py:98-130`` preprocessing,
``infer.py:116-121`` / ``onnx2trt.py:228-231`` visualization,
``onnx2trt_pointcloud.py:70-78`` unprojection,
``Depth_Pro/onnx2trt.py:152-165`` fov->focal).
"""

import numpy as np
import pytest

import cv2
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.ops.camera import (
    canonical_to_metric_depth,
    extrinsics_from_quat_trans,
    fov_to_focal,
    unproject_depth,
    unproject_intrinsics,
)
from monocular_depth_estimation_trt_tpu.ops.colormap import turbo_colormap, turbo_lut
from monocular_depth_estimation_trt_tpu.ops.postprocess import (
    crop_pad,
    inverse_depth_normalize,
    normalize_depth_for_viz,
    upsample_depth,
)
from monocular_depth_estimation_trt_tpu.ops.preprocess import (
    normalize,
    preprocess_keep_ratio_pad,
    preprocess_lower_bound,
    preprocess_pad_square,
    to_float_rgb,
)


def _reference_preprocess(raw_rgb_u8, input_size=518):
    """Direct numpy port of reference Depth_Anything_V2/onnx2trt.py:98-130
    (NHWC output instead of NCHW; same numbers)."""
    from monocular_depth_estimation_trt_tpu.ops.resize import lower_bound_size

    image = raw_rgb_u8 / 255.0
    h, w = image.shape[:2]
    nh, nw = lower_bound_size(h, w, input_size)
    image = cv2.resize(
        image.astype(np.float32), (nw, nh), interpolation=cv2.INTER_CUBIC
    )
    image = (image - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    return image[None].astype(np.float32)


@pytest.mark.parametrize("hw", [(518, 518), (480, 640)])
def test_preprocess_lower_bound_matches_reference(rng, hw):
    img = rng.integers(0, 255, size=(*hw, 3), dtype=np.uint8)
    ours = np.asarray(preprocess_lower_bound(jnp.asarray(img)))
    ref = _reference_preprocess(img)
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) < 1e-3


def test_preprocess_pad_square_shape_and_padding(rng):
    img = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
    out = np.asarray(preprocess_pad_square(jnp.asarray(img), 518))
    assert out.shape == (1, 518, 518, 3)
    # white padding (value 1.0 pre-normalize) lands at the top/bottom bands
    # for a landscape image; check the very first row equals normalized white
    white = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    assert np.allclose(out[0, 0, 259], white, atol=1e-2)


def test_preprocess_keep_ratio_pad(rng):
    img = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
    out, pad, scale = preprocess_keep_ratio_pad(jnp.asarray(img), (616, 1064))
    assert out.shape == (1, 616, 1064, 3)
    t, b, l, r = pad
    # border columns are exactly the normalized mean (zero after subtraction)
    arr = np.asarray(out)
    if l > 0:
        assert np.allclose(arr[0, :, 0, :], 0.0)
    assert scale == min(616 / 480, 1064 / 640)


def test_upsample_depth_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    depth = rng.random((1, 37, 37)).astype(np.float32) * 10
    ours = np.asarray(upsample_depth(jnp.asarray(depth), (130, 120)))
    ref = F.interpolate(
        torch.from_numpy(depth)[None], (130, 120), mode="bilinear", align_corners=True
    )[0]
    ref = torch.clamp(ref, 1e-3, 1e3).numpy()
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_normalize_depth_for_viz(rng):
    d = rng.random((10, 10)).astype(np.float32) * 7 + 2
    n = np.asarray(normalize_depth_for_viz(jnp.asarray(d)))
    assert abs(n.min()) < 1e-6 and abs(n.max() - 1) < 1e-6


def test_inverse_depth_normalize_matches_reference(rng):
    depth = rng.random((16, 16)).astype(np.float32) * 50 + 0.5
    ours = np.asarray(inverse_depth_normalize(jnp.asarray(depth)))
    inv = 1 / depth
    max_inv = min(inv.max(), 1 / 0.1)
    min_inv = max(1 / 250, inv.min())
    ref = (inv - min_inv) / (max_inv - min_inv)
    assert np.max(np.abs(ours - ref)) < 1e-5


def test_turbo_matches_matplotlib(rng):
    from matplotlib import pyplot as plt

    norm = rng.random((8, 8)).astype(np.float32)
    ours = np.asarray(turbo_colormap(jnp.asarray(norm)))
    idx = (norm * 255.0).astype(np.uint8)
    ref = (plt.get_cmap("turbo")(idx)[..., :3] * 255).astype(np.uint8)
    assert np.array_equal(ours, ref)


def test_turbo_lut_shape():
    lut = turbo_lut()
    assert lut.shape == (256, 3)
    assert lut.min() >= 0 and lut.max() <= 1


def test_unproject_depth_matches_reference(rng):
    depth = rng.random((12, 16)).astype(np.float32) * 5
    f = 300.0
    pts = np.asarray(unproject_depth(jnp.asarray(depth), f))
    h, w = depth.shape
    # reference Depth_Anything_V2/onnx2trt_pointcloud.py:70-78
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    x = (u - w / 2) * depth / f
    y = (v - h / 2) * depth / f
    ref = np.stack([x, y, depth], axis=-1).astype(np.float32)
    assert np.max(np.abs(pts - ref)) < 1e-5


def test_fov_to_focal_and_canonical():
    # reference Depth_Pro/onnx2trt.py:152-165
    w = 1536
    fov = 60.0
    f = float(fov_to_focal(fov, w))
    assert abs(f - 0.5 * w / np.tan(np.deg2rad(30.0))) < 1e-3
    cid = jnp.full((4, 4), 0.5)
    depth, f_px = canonical_to_metric_depth(cid, jnp.asarray(fov), w)
    ref = 1.0 / np.clip(0.5 * w / f, 1e-4, 1e4)
    assert np.allclose(np.asarray(depth), ref, atol=1e-4)


def test_extrinsics_from_quat_matches_scipy(rng):
    from scipy.spatial.transform import Rotation

    for _ in range(5):
        q = rng.standard_normal(4)
        q = q / np.linalg.norm(q)
        t = rng.standard_normal(3).astype(np.float32)
        E = np.asarray(
            extrinsics_from_quat_trans(
                jnp.asarray(q.astype(np.float32)), jnp.asarray(t)
            )
        )
        # both ours and scipy take scalar-last (x, y, z, w) — the upstream
        # VGGT quat_to_mat convention
        R_ref = Rotation.from_quat(q).as_matrix()
        assert np.allclose(E[:, :3], R_ref, atol=1e-5)
        assert np.allclose(E[:, 3], t, atol=1e-6)


def test_extrinsics_from_quat_identity():
    E = np.asarray(
        extrinsics_from_quat_trans(jnp.asarray([0.0, 0, 0, 1.0]), jnp.asarray([1.0, 2, 3]))
    )
    assert np.allclose(E[:, :3], np.eye(3), atol=1e-6)
    assert np.allclose(E[:, 3], [1, 2, 3])


def test_crop_pad():
    x = jnp.arange(30.0).reshape(1, 5, 6)
    y = crop_pad(x, (1, 1, 2, 0))
    assert y.shape == (1, 3, 4)
    assert float(y[0, 0, 0]) == 8.0
