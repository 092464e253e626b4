"""Serialized engine artifacts (`mdet export` / `runtime/export.py`).

The reference ships a serialized TRT plan (`Depth_Anything_V2/onnx2trt.py:
60-68`) that a consumer deserializes and runs without model code
(`common_runtime.py`). These tests gate our analogue: the `.mdeteng`
container round-trips the fused program bit-exactly, bakes weights in as
constants (plan-file semantics), and serves through the CLI.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu import cli, registry
from monocular_depth_estimation_trt_tpu.config import ModelSpec
from monocular_depth_estimation_trt_tpu.pipelines import DepthPipeline
from monocular_depth_estimation_trt_tpu.runtime.export import (
    export_pipeline,
    load_engine,
    read_meta,
)


def _toy_pipeline(viz="relative"):
    spec = ModelSpec(model="toy_export", input_hw=(16, 16))
    params = {"w": jnp.full((3,), 2.0, jnp.float32),
              "b": jnp.asarray(0.5, jnp.float32)}

    def forward(params, img_u8, out_hw):
        x = img_u8.astype(jnp.float32) / 255.0
        depth = x @ params["w"] + params["b"]
        return {"depth": depth}

    return DepthPipeline(spec, forward, params, viz=viz)


def _img(shape=(16, 16, 3), seed=7):
    return np.random.default_rng(seed).integers(
        0, 255, shape, dtype=np.uint8
    )


def test_roundtrip_matches_pipeline(tmp_path):
    pipe = _toy_pipeline()
    path = str(tmp_path / "toy.mdeteng")
    out_path = export_pipeline(pipe, (16, 16), path=path)
    assert out_path == path and os.path.exists(path)

    eng = load_engine(path)
    img = _img()
    got = eng(img)
    want = pipe(img)
    assert set(got) == set(want)
    np.testing.assert_allclose(got["depth"], want["depth"], rtol=1e-6)


def test_viz_epilogue_is_fused_into_artifact(tmp_path):
    pipe = _toy_pipeline()
    path = export_pipeline(pipe, (16, 16), with_viz=True,
                           path=str(tmp_path / "v.mdeteng"))
    eng = load_engine(path)
    out = eng(_img())
    assert "viz" in out and out["viz"].dtype == np.uint8
    assert read_meta(path)["with_viz"] is True


def test_weights_are_baked_constants(tmp_path):
    """Plan-file semantics: mutating the live params after export must not
    change the artifact's outputs."""
    pipe = _toy_pipeline()
    path = export_pipeline(pipe, (16, 16), path=str(tmp_path / "b.mdeteng"))
    img = _img()
    before = load_engine(path)(img)["depth"]
    pipe.params["w"] = jnp.zeros((3,), jnp.float32)
    after = load_engine(path)(img)["depth"]
    np.testing.assert_array_equal(before, after)
    assert not np.allclose(before, np.asarray(pipe(img)["depth"]))


def test_meta_describes_signature(tmp_path):
    pipe = _toy_pipeline()
    path = export_pipeline(pipe, (16, 16), path=str(tmp_path / "m.mdeteng"))
    meta = read_meta(path)
    assert meta["format"] == "MDETENG"
    assert meta["model"] == "toy_export"
    assert meta["in_hw"] == [16, 16]
    assert meta["inputs"][0]["shape"] == [16, 16, 3]
    assert meta["inputs"][0]["dtype"] == "uint8"
    assert "depth" in meta["output_names"]
    assert "cpu" in meta["platforms"]
    eng = load_engine(path)
    assert eng.in_shapes[0] == (16, 16, 3)
    assert "toy_export" in eng.describe()


def test_load_rejects_non_engine_zip(tmp_path):
    import zipfile

    p = str(tmp_path / "junk.mdeteng")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("meta.json", "{}")
        z.writestr("module.bin", b"")
    with pytest.raises(ValueError, match="not an MDETENG artifact"):
        load_engine(p)


def test_cli_export_then_run_engine(tmp_path, monkeypatch):
    """End-to-end: `mdet export` writes the artifact, `mdet run --engine`
    serves from it (with the fixed-shape auto-resize, TRT-plan style) and
    writes the usual npz/jpg artifacts."""
    import cv2

    monkeypatch.setattr(registry, "build_pipeline",
                        lambda name, **kw: _toy_pipeline())
    eng_path = str(tmp_path / "cli.mdeteng")
    rc = cli.main(["export", "toy_export", "--size", "16",
                   "--out", eng_path, "--platforms", "cpu"])
    assert rc == 0 and os.path.exists(eng_path)

    img_path = str(tmp_path / "img.png")
    cv2.imwrite(img_path, _img((20, 24, 3)))  # wrong shape -> auto-resize
    out_dir = tmp_path / "out"
    rc = cli.main(["run", "unused_model", "--engine", eng_path,
                   "--image", img_path, "--out", str(out_dir)])
    assert rc == 0
    npz = [f for f in os.listdir(out_dir) if f.endswith(".npz")]
    assert len(npz) == 1
    depth = np.load(out_dir / npz[0])["depth"]
    assert depth.shape == (16, 16)
