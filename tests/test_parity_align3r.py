"""Align3R parity: Flax two-view decoder vs the torch mirror through
``convert_align3r`` (tiny config, fp32, CPU), plus the weighted-Procrustes
pose recovery (``ops/procrustes.py``).

Covers: the shared patch-16 encoder over both frames, depth-prior
standardize+embed injection, the lockstep twin cross-attention decoders,
per-view 4-channel DPT heads (inv_log pts + expp1 conf), and closed-form
SE(3) recovery on synthetic rigid motions.
"""

import numpy as np
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.align3r import Align3R
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.ops.procrustes import (
    se3_apply,
    weighted_procrustes,
)
from monocular_depth_estimation_trt_tpu.weights.convert import convert_align3r

from torch_mirror_align3r import TorchAlign3R

ENC = dict(dim=64, depth=2, num_heads=2)
DEC = dict(dec_dim=48, dec_depth=4, dec_heads=2)
HEAD = dict(features=16, out_channels=(8, 16, 32, 32))
TAPS = (0, 1, 2, 3)


def _models():
    torch.manual_seed(13)
    tm = TorchAlign3R(
        ENC["dim"], ENC["depth"], ENC["num_heads"],
        DEC["dec_dim"], DEC["dec_depth"], DEC["dec_heads"],
        HEAD["features"], HEAD["out_channels"], TAPS, pretrain_img=64,
    ).eval()
    fm = Align3R(
        enc=ViTConfig(**ENC, patch_size=16, pretrain_img_size=64),
        **DEC, head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"], out_indices=TAPS,
        dtype=jnp.float32, attn_impl="xla",
    )
    params = convert_align3r(tm.state_dict(), enc_depth=ENC["depth"],
                             dec_depth=DEC["dec_depth"])
    return tm, fm, params


def test_align3r_parity_vs_torch():
    tm, fm, params = _models()
    rng = np.random.default_rng(0)
    i1 = rng.integers(0, 255, (1, 64, 80, 3)).astype(np.float32)
    i2 = rng.integers(0, 255, (1, 64, 80, 3)).astype(np.float32)
    p1 = rng.uniform(0.5, 5.0, (1, 64, 80)).astype(np.float32)
    p2 = rng.uniform(0.5, 5.0, (1, 64, 80)).astype(np.float32)

    with torch.no_grad():
        r_pts1, r_conf1, r_pts2, r_conf2 = tm(
            torch.from_numpy(i1).permute(0, 3, 1, 2),
            torch.from_numpy(i2).permute(0, 3, 1, 2),
            torch.from_numpy(p1), torch.from_numpy(p2),
        )
    out = fm.apply({"params": params}, jnp.asarray(i1), jnp.asarray(i2),
                   jnp.asarray(p1), jnp.asarray(p2))

    for ours, ref, name in [
        (out["pts1"], r_pts1.numpy(), "pts1"),
        (out["conf1"], r_conf1.numpy(), "conf1"),
        (out["pts2"], r_pts2.numpy(), "pts2"),
        (out["conf2"], r_conf2.numpy(), "conf2"),
    ]:
        ours = np.asarray(ours)
        assert ours.shape == ref.shape, (name, ours.shape, ref.shape)
        err = np.max(np.abs(ours - ref)) / max(np.max(np.abs(ref)), 1e-6)
        assert err < 2e-3, f"{name} rel err {err:.2e}"


def test_prior_conditions_output():
    """Changing a view's depth prior must change its pointmap (the Align3R
    property the plain DUSt3R graph lacks)."""
    _, fm, params = _models()
    rng = np.random.default_rng(1)
    i1 = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.float32)
    i2 = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.float32)
    p = rng.uniform(0.5, 5.0, (1, 64, 64)).astype(np.float32)
    out_a = fm.apply({"params": params}, jnp.asarray(i1), jnp.asarray(i2),
                     jnp.asarray(p), jnp.asarray(p))
    out_b = fm.apply({"params": params}, jnp.asarray(i1), jnp.asarray(i2),
                     jnp.asarray(p * 3.0 + 1.0) ** 2, jnp.asarray(p))
    assert not np.allclose(np.asarray(out_a["pts1"]),
                           np.asarray(out_b["pts1"]))


def test_weighted_procrustes_recovers_rigid_motion():
    rng = np.random.default_rng(2)
    # random rotation via QR
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = np.asarray([0.3, -1.2, 2.0], np.float32)
    src = rng.standard_normal((1, 200, 3)).astype(np.float32)
    dst = src @ Q.T.astype(np.float32) + t
    w = rng.uniform(0.1, 1.0, (1, 200)).astype(np.float32)

    R_est, t_est = weighted_procrustes(jnp.asarray(src), jnp.asarray(dst),
                                       jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R_est)[0], Q, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_est)[0], t, atol=1e-4)
    aligned = np.asarray(se3_apply(R_est, t_est, jnp.asarray(src)))
    np.testing.assert_allclose(aligned, dst, atol=1e-4)


def test_weighted_procrustes_ignores_zero_weight_outliers():
    rng = np.random.default_rng(3)
    src = rng.standard_normal((1, 100, 3)).astype(np.float32)
    t = np.asarray([1.0, 2.0, 3.0], np.float32)
    dst = src + t
    # corrupt half the correspondences but zero their weights
    dst[:, 50:] += rng.standard_normal((1, 50, 3)) * 100
    w = np.ones((1, 100), np.float32)
    w[:, 50:] = 0.0
    R_est, t_est = weighted_procrustes(jnp.asarray(src), jnp.asarray(dst),
                                       jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R_est)[0], np.eye(3), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_est)[0], t, atol=1e-4)


def test_align3r_registry_pair_pipeline():
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.weights.store import (
        allow_random_weights,
    )

    kw = dict(DEC, head_features=HEAD["features"],
              head_out_channels=HEAD["out_channels"], out_indices=TAPS,
              enc=ViTConfig(**ENC, patch_size=16, pretrain_img_size=64))
    with allow_random_weights():
        pipe = build_pipeline("align3r", input_size=64, precision="fp32",
                              attn_impl="xla", model_kw=kw)
    rng = np.random.default_rng(4)
    f1 = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    f2 = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    out = pipe(f1, f2)
    assert out["pts1"].shape == (64, 64, 3)
    assert out["depth"].shape == (64, 64)
    assert out["rotation"].shape == (3, 3)
    assert out["translation"].shape == (3,)
    R = np.asarray(out["rotation"])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
    assert np.isfinite(np.asarray(out["pts2"])).all()
