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


def test_image_mesh_faces_mask_removal():
    from monocular_depth_estimation_trt_tpu.apps.ply import image_mesh_faces

    # full grid: 2*(h-1)*(w-1) triangles
    faces = image_mesh_faces(3, 4)
    assert faces.shape == (2 * 2 * 3, 3)
    assert faces.min() >= 0 and faces.max() < 12
    # mask out one vertex: every face touching it disappears
    mask = np.ones((3, 4), bool)
    mask[1, 1] = False
    faces_m = image_mesh_faces(3, 4, mask)
    v = 1 * 4 + 1
    assert not (faces_m == v).any()
    assert len(faces_m) < len(faces)


def test_glb_mesh_valid(tmp_path, rng):
    from monocular_depth_estimation_trt_tpu.apps.ply import (
        image_mesh_faces,
        write_glb_mesh,
    )

    h, w = 4, 5
    pts = rng.standard_normal((h * w, 3)).astype(np.float32)
    faces = image_mesh_faces(h, w)
    col = rng.random((h * w, 3)).astype(np.float32)
    p = str(tmp_path / "mesh.glb")
    write_glb_mesh(p, pts, faces, col)
    with open(p, "rb") as f:
        data = f.read()
    import json as _json
    import struct

    magic, version, length = struct.unpack_from("<III", data, 0)
    assert magic == 0x46546C67 and version == 2 and length == len(data)
    js_len, js_type = struct.unpack_from("<II", data, 12)
    gltf = _json.loads(data[20 : 20 + js_len])
    prim = gltf["meshes"][0]["primitives"][0]
    assert prim["mode"] == 4 and "indices" in prim
    idx_acc = gltf["accessors"][prim["indices"]]
    assert idx_acc["count"] == faces.size


def test_ply_mesh_roundtrip_header(tmp_path, rng):
    from monocular_depth_estimation_trt_tpu.apps.ply import (
        image_mesh_faces,
        write_ply_mesh,
    )

    h, w = 4, 5
    pts = rng.standard_normal((h * w, 3)).astype(np.float32)
    faces = image_mesh_faces(h, w)
    p = str(tmp_path / "mesh.ply")
    write_ply_mesh(p, pts, faces)
    head = open(p, "rb").read(400).decode("ascii", errors="ignore")
    assert f"element vertex {h * w}" in head
    assert f"element face {len(faces)}" in head


def test_points_to_mesh_file(tmp_path, rng):
    from monocular_depth_estimation_trt_tpu.apps.pointcloud import (
        points_to_mesh_file,
    )

    h, w = 6, 8
    pts = rng.standard_normal((h, w, 3)).astype(np.float32)
    pts[0, 0] = np.inf  # invalid vertex must be dropped from faces
    mask = np.ones((h, w), bool)
    mask[3, 3] = False
    p = str(tmp_path / "m.glb")
    points_to_mesh_file(pts, None, p, mask=mask)
    assert len(open(p, "rb").read()) > 100


def test_metric_colorbar_figure(tmp_path, rng):
    from monocular_depth_estimation_trt_tpu.apps.pointcloud import (
        save_metric_colorbar_figure,
    )

    depth = (rng.random((32, 48)) * 20 + 0.5).astype(np.float32)
    p = str(tmp_path / "bar.jpg")
    save_metric_colorbar_figure(depth, p)
    assert len(open(p, "rb").read()) > 1000
