"""`mdet run` artifact surface: fov json (reference MoGe_2/onnx2trt.py:211-213)
and the --compare regression gate."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu import cli, registry
from monocular_depth_estimation_trt_tpu.config import ModelSpec
from monocular_depth_estimation_trt_tpu.pipelines import DepthPipeline


def _toy_pipeline(extra_outputs):
    spec = ModelSpec(model="toy_cli", input_hw=(16, 16))

    def forward(params, img_u8, out_hw):
        x = img_u8.astype(jnp.float32) / 255.0
        out = {"depth": x[..., 0] + 1.0}
        out.update({k: jnp.asarray(v) for k, v in extra_outputs.items()})
        return out

    return DepthPipeline(spec, forward, {}, viz="none")


def _img(tmp_path):
    import cv2

    p = str(tmp_path / "img.png")
    rng = np.random.default_rng(3)
    cv2.imwrite(p, rng.integers(0, 255, (20, 24, 3), dtype=np.uint8))
    return p


def _run(tmp_path, monkeypatch, extra_outputs, argv_extra=()):
    monkeypatch.setattr(registry, "build_pipeline",
                        lambda name, **kw: _toy_pipeline(extra_outputs))
    out_dir = tmp_path / "out"
    rc = cli.main(["run", "toy", "--image", _img(tmp_path),
                   "--out", str(out_dir), *argv_extra])
    return rc, out_dir


def test_fov_json_written_for_pixel_focal(tmp_path, monkeypatch):
    """Depth-Pro-style f_px output -> dedicated fov json artifact."""
    rc, out_dir = _run(tmp_path, monkeypatch, {"f_px": 30.0})
    assert rc == 0
    fovs = [f for f in os.listdir(out_dir) if f.endswith("_fov.json")]
    assert len(fovs) == 1
    fov = json.load(open(out_dir / fovs[0]))
    # original image is 20x24: fov_x = 2*atan(12/30), fov_y = 2*atan(10/30)
    assert fov["fov_x"] == pytest.approx(
        np.degrees(2 * np.arctan(12 / 30)), abs=0.02)
    assert fov["fov_y"] == pytest.approx(
        np.degrees(2 * np.arctan(10 / 30)), abs=0.02)


def test_fov_json_written_for_moge_normalized_focal(tmp_path, monkeypatch):
    rc, out_dir = _run(tmp_path, monkeypatch, {"focal": 0.8})
    assert rc == 0
    fovs = [f for f in os.listdir(out_dir) if f.endswith("_fov.json")]
    (fov,) = [json.load(open(out_dir / f)) for f in fovs]
    diag = np.hypot(20, 24)
    assert fov["fov_x"] == pytest.approx(
        np.degrees(2 * np.arctan((24 / diag) / 0.8)), abs=0.02)


def test_no_fov_json_without_camera_outputs(tmp_path, monkeypatch):
    rc, out_dir = _run(tmp_path, monkeypatch, {})
    assert rc == 0
    assert not [f for f in os.listdir(out_dir) if f.endswith("_fov.json")]


def test_compare_gate_pass_and_fail(tmp_path, monkeypatch):
    # first run writes the npz; second compares against it and passes
    rc, out_dir = _run(tmp_path, monkeypatch, {})
    (npz,) = [f for f in os.listdir(out_dir) if f.endswith(".npz")]
    ref = str(out_dir / npz)
    rc2, _ = _run(tmp_path, monkeypatch, {}, ("--compare", ref))
    assert rc2 == 0
    # drifted reference must fail
    d = np.load(ref)["depth"]
    bad = str(tmp_path / "bad.npz")
    np.savez_compressed(bad, depth=d + 1.0)
    rc3, _ = _run(tmp_path, monkeypatch, {}, ("--compare", bad))
    assert rc3 == 1
    # shape mismatch fails
    np.savez_compressed(bad, depth=d[:-2])
    rc4, _ = _run(tmp_path, monkeypatch, {}, ("--compare", bad))
    assert rc4 == 1


def test_views_subcommand_writes_npz_and_ply(tmp_path, monkeypatch):
    """`mdet views` drives multi_view and writes the S-stack npz + merged
    world-point ply."""
    class ToyMV:
        class spec:
            input_hw = (16, 16)

            @staticmethod
            def artifact_name():
                return "toy_views"

        def multi_view(self, views):
            s = views.shape[0]
            return {
                "depth": np.ones((s, 16, 16), np.float32),
                "depth_conf": np.full((s, 16, 16), 2.0, np.float32),
                # identity rotation quat (x,y,z,w)=(0,0,0,1), zero trans,
                # fov entries ~0.8 rad
                "pose_enc": np.tile(
                    np.asarray([0, 0, 0, 0, 0, 0, 1, 0.8, 0.8], np.float32),
                    (s, 1)),
            }

    monkeypatch.setattr(registry, "build_pipeline",
                        lambda name, **kw: ToyMV())
    img1, img2 = _img(tmp_path), _img(tmp_path)
    out_dir = tmp_path / "out"
    rc = cli.main(["views", "vggt", "--images", img1, img2,
                   "--resize", "16", "--out", str(out_dir)])
    assert rc == 0
    files = os.listdir(out_dir)
    assert any(f.endswith("_s2.npz") for f in files)
    assert any(f.endswith("_s2.ply") for f in files)
    npz = np.load(out_dir / [f for f in files if f.endswith(".npz")][0])
    assert npz["depth"].shape == (2, 16, 16)
