"""PLY/GLB writer round-trips and pipeline machinery tests."""

import os

import numpy as np

from monocular_depth_estimation_trt_tpu.apps.ply import (
    read_ply,
    write_glb_pointcloud,
    write_ply,
)


def test_ply_roundtrip_binary(tmp_path, rng):
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    col = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    p = str(tmp_path / "cloud.ply")
    write_ply(p, pts, col)
    rpts, rcol = read_ply(p)
    assert np.allclose(rpts, pts)
    assert np.array_equal(rcol, col)


def test_ply_roundtrip_ascii(tmp_path, rng):
    pts = rng.standard_normal((10, 3)).astype(np.float32)
    p = str(tmp_path / "cloud_ascii.ply")
    write_ply(p, pts, binary=False)
    rpts, rcol = read_ply(p)
    assert np.allclose(rpts, pts, atol=1e-5)
    assert rcol is None


def test_glb_valid_header(tmp_path, rng):
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    col = rng.random((50, 3)).astype(np.float32)
    p = str(tmp_path / "cloud.glb")
    write_glb_pointcloud(p, pts, col)
    with open(p, "rb") as f:
        data = f.read()
    import struct

    magic, version, length = struct.unpack_from("<III", data, 0)
    assert magic == 0x46546C67 and version == 2 and length == len(data)
