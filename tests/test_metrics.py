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
