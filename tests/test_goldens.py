"""Golden-artifact regression tests (SURVEY.md §4 protocol).

The reference's quality gate is committed golden outputs (depth .npz + README
max/min values) diffed across engine rebuilds. Here: deterministic tiny
models (fixed seeds, fp32, CPU) with committed golden depth maps. A drift
beyond tolerance means a semantic change to the model graph or ops — bump the
golden deliberately, never silently.

Regenerate: see the generation snippet in git history / run the body of
``_build`` with ``save=True``.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _build():
    from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
        DepthAnythingV2,
    )
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    cfg = ViTConfig(dim=64, depth=4, num_heads=2, pretrain_img_size=70)
    model = DepthAnythingV2(
        encoder="tiny", dtype=jnp.float32, attn_impl="xla", vit_config=cfg,
        head_features=16, head_out_channels=(8, 16, 32, 32),
        out_indices=(0, 1, 2, 3),
    )
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((1, 70, 70, 3)).astype(np.float32) * 0.5)
    params = jax.jit(model.init)(jax.random.PRNGKey(7), x)["params"]
    return model, params, x


def test_da_v2_tiny_matches_golden():
    model, params, x = _build()
    depth = np.asarray(model.apply({"params": params}, x))
    golden = np.load(os.path.join(GOLDEN_DIR, "da_v2_tiny_seed7.npz"))["depth"]
    assert depth.shape == golden.shape
    err = np.max(np.abs(depth - golden))
    # reference parity bar is 1e-2 (BASELINE.json); regression bar is tighter
    assert err < 1e-3, f"golden drift {err:.2e}"


def test_vggt_tiny_matches_golden():
    from monocular_depth_estimation_trt_tpu.models.vggt import VGGT, VGGTConfig
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    cfg = VGGTConfig(dim=64, depth=2, num_heads=4, head_layers=(0, 1, 0, 1),
                     encoder="vits",
                     vit_config=ViTConfig(dim=48, depth=2, num_heads=2,
                                          pretrain_img_size=70))
    model = VGGT(cfg=cfg, dtype=jnp.float32, attn_impl="xla")
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 1, 70, 70, 3)).astype(np.float32) * 0.3)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), x)["params"]
    out = model.apply({"params": params}, x)
    g = np.load(os.path.join(GOLDEN_DIR, "vggt_tiny_seed2.npz"))
    scale = max(np.max(np.abs(g["depth"])), 1e-3)
    assert np.max(np.abs(np.asarray(out["depth"]) - g["depth"])) / scale < 1e-3
    assert np.max(np.abs(np.asarray(out["pose_enc"]) - g["pose_enc"])) < 1e-3


def test_raft_tiny_matches_golden():
    from monocular_depth_estimation_trt_tpu.models.flow.raft import RAFT

    model = RAFT(iters=2, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    i1 = jnp.asarray(rng.integers(0, 255, (1, 64, 96, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.integers(0, 255, (1, 64, 96, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(3), i1, i2)["params"]
    low, up = model.apply({"params": params}, i1, i2)
    g = np.load(os.path.join(GOLDEN_DIR, "raft_tiny_seed3.npz"))
    scale = max(np.max(np.abs(g["flow_up"])), 1e-3)
    assert np.max(np.abs(np.asarray(low) - g["flow_low"])) / scale < 1e-3
    assert np.max(np.abs(np.asarray(up) - g["flow_up"])) / scale < 1e-3


def test_waft_tiny_matches_golden():
    from monocular_depth_estimation_trt_tpu.models.flow.waft import WAFT
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    model = WAFT(iters=2,
                 vit_config=ViTConfig(dim=64, depth=4, num_heads=2,
                                      pretrain_img_size=70),
                 dtype=jnp.float32, attn_impl="xla")
    rng = np.random.default_rng(11)
    i1 = jnp.asarray(rng.integers(0, 255, (1, 70, 84, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.integers(0, 255, (1, 70, 84, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(6), i1, i2)["params"]
    low, up = model.apply({"params": params}, i1, i2)
    g = np.load(os.path.join(GOLDEN_DIR, "waft_tiny_seed6.npz"))
    scale = max(np.max(np.abs(g["flow_up"])), 1e-3)
    assert np.max(np.abs(np.asarray(low) - g["flow_low"])) / scale < 1e-3
    assert np.max(np.abs(np.asarray(up) - g["flow_up"])) / scale < 1e-3


def test_vda_tiny_matches_golden():
    from monocular_depth_estimation_trt_tpu.models.video_depth_anything import (
        VideoDepthAnything,
    )
    from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig

    model = VideoDepthAnything(
        vit_config=ViTConfig(dim=64, depth=4, num_heads=2,
                             pretrain_img_size=70),
        head_features=16, head_out_channels=(8, 16, 32, 32),
        out_indices=(0, 1, 2, 3), num_heads=2,
        dtype=jnp.float32, attn_impl="xla",
    )
    rng = np.random.default_rng(11)
    # advance the rng past the waft golden draws (shared generation script)
    rng.integers(0, 255, (1, 70, 84, 3))
    rng.integers(0, 255, (1, 70, 84, 3))
    clip = jnp.asarray(rng.standard_normal((1, 3, 70, 70, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(8), clip)["params"]
    d = model.apply({"params": params}, clip)
    g = np.load(os.path.join(GOLDEN_DIR, "vda_tiny_seed8.npz"))["depth"]
    scale = max(np.max(np.abs(g)), 1e-3)
    assert np.max(np.abs(np.asarray(d) - g)) / scale < 1e-3
