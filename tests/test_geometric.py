"""Geometric model family: contracts + recover_focal_shift correctness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.ops.camera import (
    normalized_view_plane_uv,
    recover_focal_shift,
)


def test_recover_focal_shift_synthetic(rng):
    """Generate a point map from known (focal, shift); the solver must
    recover them."""
    h, w = 48, 64
    uv = np.asarray(normalized_view_plane_uv(h, w))
    true_focal = 0.8
    true_shift = 1.3
    z_true = rng.random((h, w)).astype(np.float32) * 2 + 2.0  # 2..4
    x = uv[..., 0] * z_true / true_focal
    y = uv[..., 1] * z_true / true_focal
    pts = np.stack([x, y, z_true - true_shift], axis=-1)[None]

    focal, shift = recover_focal_shift(jnp.asarray(pts))
    assert abs(float(focal[0]) - true_focal) < 0.05, float(focal[0])
    assert abs(float(shift[0]) - true_shift) < 0.1, float(shift[0])


def test_geometric_model_contract(rng):
    """Tiny GeometricDepthModel: output shapes + ray geometry."""
    import monocular_depth_estimation_trt_tpu.models.geometric as gm
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    cfg = gm.GeometricConfig(
        vit_config=ViTConfig(dim=64, depth=4, num_heads=2, pretrain_img_size=70),
        decoder_dim=64,
        out_indices=(0, 1, 2, 3),
    )
    for mode in ("unidepth", "unik3d"):
        model = gm.GeometricDepthModel(
            encoder="vits", mode=mode, dtype=jnp.float32, attn_impl="xla",
            cfg=cfg,
        )
        x = jnp.asarray(rng.standard_normal((1, 70, 70, 3)).astype(np.float32))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
        out = model.apply({"params": params}, x)
        assert out["pts_3d"].shape == (1, 70, 70, 3)
        assert out["confidence"].shape == (1, 70, 70)
        assert out["intrinsics"].shape == (1, 3, 3)
        pts = np.asarray(out["pts_3d"])
        if mode == "unik3d":
            # unit rays x distance: |pts| = distance, constant per pixel
            dist = np.linalg.norm(pts, axis=-1)
            assert np.isfinite(pts).all()
            assert (dist > 0).all()
        else:
            assert (pts[..., 2] > 0).all()  # z = exp(depth) positive


def test_moge2_contract(rng):
    import monocular_depth_estimation_trt_tpu.models.moge2 as m2
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    cfg = m2.MoGeConfig(
        vit_config=ViTConfig(dim=64, depth=4, num_heads=2, pretrain_img_size=70),
        proj_dim=32,
        up_dims=(16, 16, 8),
        out_indices=(0, 1, 2, 3),
    )
    model = m2.MoGe2(encoder="vits", num_tokens=25, dtype=jnp.float32,
                     attn_impl="xla", cfg=cfg)
    x = jnp.asarray(rng.standard_normal((1, 63, 112, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out["points"].shape == (1, 63, 112, 3)
    assert out["normal"].shape == (1, 63, 112, 3)
    assert out["mask"].shape == (1, 63, 112)
    assert out["metric_scale"].shape == (1,)
    n = np.asarray(out["normal"])
    norms = np.linalg.norm(n, axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-3)


def test_grid_for_tokens():
    from monocular_depth_estimation_trt_tpu.models.moge2 import grid_for_tokens

    gh, gw = grid_for_tokens(291, 518, 1800)
    assert abs(gh * gw - 1800) / 1800 < 0.15
    assert abs((gw / gh) - (518 / 291)) < 0.2
