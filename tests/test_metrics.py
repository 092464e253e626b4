"""Depth/flow metric suites + `mdet eval` CLI.

The reference's validation protocol is eyeballing console max/min lines
(``Depth_Anything_V2/onnx2trt.py:218-245``); these metrics replace it.
"""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from monocular_depth_estimation_trt_tpu.training import depth_metrics, flow_metrics


def test_depth_metrics_perfect_prediction(rng):
    gt = jnp.asarray(np.abs(rng.standard_normal((2, 16, 16)).astype(np.float32)) + 0.5)
    m = depth_metrics(gt, gt)
    assert float(m["abs_rel"]) < 1e-6
    assert float(m["rmse"]) < 1e-5
    assert float(m["delta1"]) == pytest.approx(1.0)
    assert float(m["silog"]) < 1e-3


def test_depth_metrics_affine_alignment(rng):
    gt = jnp.asarray(np.abs(rng.standard_normal((2, 16, 16)).astype(np.float32)) + 0.5)
    pred = 2.0 * gt + 1.0
    assert float(depth_metrics(pred, gt)["abs_rel"]) > 0.5
    m = depth_metrics(pred, gt, align="affine")
    assert float(m["abs_rel"]) < 1e-5
    assert float(m["delta1"]) == pytest.approx(1.0)


def test_depth_metrics_median_alignment(rng):
    gt = jnp.asarray(np.abs(rng.standard_normal((1, 16, 16)).astype(np.float32)) + 0.5)
    pred = 3.0 * gt  # pure scale: median alignment is exact
    m = depth_metrics(pred, gt, align="median")
    assert float(m["abs_rel"]) < 1e-5


def test_depth_metrics_mask_and_nonpositive_gt(rng):
    gt = np.abs(rng.standard_normal((1, 8, 8)).astype(np.float32)) + 0.5
    gt[0, :2] = 0.0  # invalid gt pixels must be excluded automatically
    pred = gt.copy()
    pred[0, :2] = 99.0
    m = depth_metrics(jnp.asarray(pred), jnp.asarray(gt))
    assert float(m["abs_rel"]) < 1e-6

    mask = np.ones((1, 8, 8), np.float32)
    mask[0, :, :4] = 0.0
    pred2 = gt.copy()
    pred2[0, :, :4] = 77.0
    m2 = depth_metrics(jnp.asarray(pred2), jnp.asarray(gt), jnp.asarray(mask))
    assert float(m2["abs_rel"]) < 1e-6


def test_depth_metrics_known_delta(rng):
    gt = jnp.ones((1, 4, 4))
    pred = jnp.full((1, 4, 4), 1.3)  # ratio 1.3: fails delta1, passes delta2
    m = depth_metrics(pred, gt)
    assert float(m["delta1"]) == pytest.approx(0.0)
    assert float(m["delta2"]) == pytest.approx(1.0)
    assert float(m["abs_rel"]) == pytest.approx(0.3, rel=1e-5)


def test_flow_metrics(rng):
    gt = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    m = flow_metrics(gt, gt)
    assert float(m["epe"]) < 1e-5
    assert float(m["acc_1px"]) == pytest.approx(1.0)
    shifted = gt + jnp.asarray([2.0, 0.0])
    m2 = flow_metrics(shifted, gt)
    assert float(m2["epe"]) == pytest.approx(2.0, rel=1e-5)
    assert float(m2["acc_1px"]) == pytest.approx(0.0)
    assert float(m2["acc_3px"]) == pytest.approx(1.0)


def test_cli_eval_files_and_dirs(tmp_path, capsys, rng):
    from monocular_depth_estimation_trt_tpu import cli

    gt = np.abs(rng.standard_normal((12, 12)).astype(np.float32)) + 0.5
    pred = 2.0 * gt + 1.0

    pd, gd = tmp_path / "pred", tmp_path / "gt"
    pd.mkdir(), gd.mkdir()
    for i in range(2):
        np.savez(pd / f"im{i}.npz", depth=pred)
        np.savez(gd / f"im{i}.npz", depth=gt)

    rc = cli.main(["eval", "--pred", str(pd), "--gt", str(gd),
                   "--align", "affine"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_images"] == 2
    assert out["abs_rel"] < 1e-4
    assert out["delta1"] == pytest.approx(1.0)

    # single-file mode with mismatched stems still pairs them
    np.savez(tmp_path / "a.npz", depth=pred)
    np.savez(tmp_path / "b.npz", depth=gt)
    rc = cli.main(["eval", "--pred", str(tmp_path / "a.npz"),
                   "--gt", str(tmp_path / "b.npz")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["abs_rel"] > 0.5  # unaligned


def test_cli_eval_png_gt_caps_and_resolution(tmp_path, capsys, rng):
    """Real-dataset shape: GT as KITTI-style uint16 PNG (meters*256, holes
    as 0), prediction npz at model resolution != GT resolution, scored at
    GT resolution within [min_depth, max_depth]."""
    import cv2

    from monocular_depth_estimation_trt_tpu import cli

    # smooth ramp (real depth is spatially coherent; a nearest round trip
    # through half resolution stays close)
    yy, xx = np.mgrid[0:24, 0:32].astype(np.float32)
    gt = 0.5 + 2.0 * yy / 24 + 1.5 * xx / 32
    # prediction taken from the CLEAN ramp at half resolution...
    pred = gt[::2, ::2].copy()
    np.savez(tmp_path / "im0.npz", depth=pred)
    # ...then the stored GT gains sensor holes and far outliers the
    # prediction knows nothing about
    gt[:4] = 0.0          # holes -> invalid (gt<=min_depth)
    gt[-2:] = 100.0       # beyond the cap -> must be ignored
    gt_png = (gt * 256.0).astype(np.uint16)
    cv2.imwrite(str(tmp_path / "im0.png"), gt_png)

    rc = cli.main(["eval", "--pred", str(tmp_path / "im0.npz"),
                   "--gt", str(tmp_path / "im0.png"),
                   "--min-depth", "0.001", "--max-depth", "80"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_images"] == 1
    assert out["abs_rel"] < 0.2        # nearest up/down round trip
    assert out["delta1"] > 0.8

    # without the cap the 100 m rows (pred says ~gt values there) would
    # tank abs_rel; with it they are excluded, so the capped run is better
    rc = cli.main(["eval", "--pred", str(tmp_path / "im0.npz"),
                   "--gt", str(tmp_path / "im0.png")])
    assert rc == 0
    uncapped = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert uncapped["abs_rel"] > out["abs_rel"]


def test_cli_eval_gt_scale_flag(tmp_path, capsys, rng):
    """--gt-scale overrides the uint16/256 default (e.g. NYU's 1000)."""
    import cv2

    from monocular_depth_estimation_trt_tpu import cli

    gt = np.abs(rng.standard_normal((8, 8)).astype(np.float32)) + 1.0
    cv2.imwrite(str(tmp_path / "x.png"),
                (gt * 1000.0).astype(np.uint16))
    np.savez(tmp_path / "x.npz", depth=gt)
    rc = cli.main(["eval", "--pred", str(tmp_path / "x.npz"),
                   "--gt", str(tmp_path / "x.png"), "--gt-scale", "1000"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["abs_rel"] < 1e-3


def test_cli_eval_gt_scale_is_image_only(tmp_path, capsys, rng):
    """--gt-scale documents itself as image-file-only: already-metric
    .npz/.npy ground truth in a mixed GT directory must NOT be divided."""
    from monocular_depth_estimation_trt_tpu import cli

    gt = np.abs(rng.standard_normal((8, 8)).astype(np.float32)) + 1.0
    np.savez(tmp_path / "x.npz", depth=gt)
    rc = cli.main(["eval", "--pred", str(tmp_path / "x.npz"),
                   "--gt", str(tmp_path / "x.npz"), "--gt-scale", "1000"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["abs_rel"] < 1e-6
