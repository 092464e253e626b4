"""CLI parser, config naming, registry listing."""

import numpy as np
import pytest

from monocular_depth_estimation_trt_tpu.cli import build_parser
from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig, ModelSpec


def test_artifact_name_reference_convention():
    # reference Depth_Anything_V2/onnx2trt.py:160-166
    spec = ModelSpec(
        model="depth_anything_v2", encoder="vits", input_hw=(518, 518),
        precision="fp16", metric=True, dataset="hypersim",
    )
    assert spec.artifact_name() == "depth_anything_v2_vits_518x518_metric_hypersim_fp16"
    spec2 = ModelSpec(model="raft", input_hw=(288, 512), precision="fp32",
                      extra=(("iters", 20),))
    assert spec2.artifact_name() == "raft_288x512_iters20_fp32"


def test_spec_rejects_bad_precision():
    with pytest.raises(ValueError):
        ModelSpec(model="m", precision="int4")


def test_parser_subcommands():
    p = build_parser()
    args = p.parse_args(["run", "depth_anything_v2", "--encoder", "vitl",
                         "--image", "x.jpg", "--pointcloud"])
    assert args.model == "depth_anything_v2" and args.pointcloud
    args = p.parse_args(["flow", "raft", "--frames", "d", "--max-frames", "5"])
    assert args.model == "raft" and args.max_frames == 5
    args = p.parse_args(["bench", "vggt", "--iterations", "7"])
    assert args.iterations == 7
    args = p.parse_args(["webcam", "depth_pro", "--camera", "rtsp://cam"])
    assert args.camera == "rtsp://cam"


def test_registry_covers_reference_model_dirs():
    """Every main-table reference model directory has a registered serving
    entry (SURVEY.md §2.2)."""
    from monocular_depth_estimation_trt_tpu.registry import list_models

    models = set(list_models())
    expected = {
        "depth_anything_v2", "distill_any_depth", "depth_anything_ac",
        "depth_anything_v3", "depth_pro", "unidepth_v2", "unik3d",
        "metric3d_v2", "moge2", "metric_anything", "vggt", "streamvggt",
        "raft", "neuflow", "meflow", "memfof",
    }
    missing = expected - models
    assert not missing, f"unregistered reference models: {missing}"


def test_registry_covers_staged_model_dirs():
    """Substantive reference ``later/`` staging dirs promoted to registered
    entries (docs/STAGING.md)."""
    from monocular_depth_estimation_trt_tpu.registry import list_models

    models = set(list_models())
    staged = {"dkt", "bridge", "litevggt", "flashdepth",
              "prior_depth_anything", "dinov3", "geocalib", "map_anything",
              "cotracker3", "video_depth_anything", "waft", "stream3r",
              "align3r", "sidepth"}
    missing = staged - models
    assert not missing, f"unregistered staged models: {missing}"


def test_device_flag_parses_and_defaults_from_env(monkeypatch):
    """--device forces the jax platform (the axon plugin ignores the
    JAX_PLATFORMS env var, so the flag is the only reliable override)."""
    from monocular_depth_estimation_trt_tpu.cli import build_parser

    assert build_parser().parse_args(["models"]).device == "auto"
    assert build_parser().parse_args(
        ["--device", "cpu", "models"]).device == "cpu"
    monkeypatch.setenv("MDET_DEVICE", "cpu")
    assert build_parser().parse_args(["models"]).device == "cpu"


def test_bad_env_device_is_a_usage_error(monkeypatch, capsys):
    """argparse never validates defaults, so MDET_DEVICE=gpu must be caught
    in main() instead of dying deep in jax backend init."""
    from monocular_depth_estimation_trt_tpu import cli

    monkeypatch.setenv("MDET_DEVICE", "gpu")
    assert cli.main(["models"]) == 2
    captured = capsys.readouterr()
    assert "invalid mdet_device" in (captured.out + captured.err).lower()
