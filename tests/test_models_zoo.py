"""Shape/contract tests for the model zoo (tiny configs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig


def test_depth_anything_v3_contract(rng):
    from monocular_depth_estimation_trt_tpu.models.depth_anything_v3 import (
        DualDPTHead,
    )

    head = DualDPTHead(
        in_channels=64, features=16, out_channels=(8, 16, 32, 32), dtype=jnp.float32
    )
    feats = [
        (jnp.asarray(rng.standard_normal((1, 25, 64)), jnp.float32), jnp.zeros((1, 64)))
    ] * 4
    params = head.init(jax.random.PRNGKey(0), feats, (5, 5))["params"]
    depth, sky = head.apply({"params": params}, feats, (5, 5))
    assert depth.shape == (1, 70, 70)
    assert sky.shape == (1, 70, 70)


def test_depth_pro_split_merge_roundtrip(rng):
    from monocular_depth_estimation_trt_tpu.models.depth_pro import (
        merge_overlapping,
        split_overlapping,
    )

    # feature-space consistency: splitting a map into overlapping windows and
    # merging with seam-cropping reproduces the original exactly
    x = jnp.asarray(rng.standard_normal((1, 96, 96, 4)).astype(np.float32))
    windows = split_overlapping(x, 24, 18)  # 5x5 windows, stride 18
    assert windows.shape == (25, 24, 24, 4)
    merged = merge_overlapping(windows, 5, 18)
    assert merged.shape == x.shape
    assert np.allclose(np.asarray(merged), np.asarray(x))


def test_depth_pro_patch_counts():
    from monocular_depth_estimation_trt_tpu.models.depth_pro import split_overlapping

    x0 = jnp.zeros((1, 1536, 1536, 3))
    x1 = jnp.zeros((1, 768, 768, 3))
    assert split_overlapping(x0, 384, 288).shape[0] == 25
    assert split_overlapping(x1, 384, 192).shape[0] == 9


@pytest.mark.slow
def test_depth_pro_tiny_forward(rng):
    """Scaled-down DepthPro graph: exercise pyramid/split/merge/decoder/fov
    wiring at the ratio-preserving 512px tiny preset (DepthProConfig)."""
    import monocular_depth_estimation_trt_tpu.models.depth_pro as dp

    cfg = dp.DepthProConfig(
        img_size=512, window=128, stride0=96, stride1=64,
        vit_config=ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16,
                             pretrain_img_size=128),
        hook_block_ids=(0, 1),
    )
    model = dp.DepthPro(
        decoder_features=16, dims_encoder=(8, 16, 32, 32), dtype=jnp.float32,
        attn_impl="xla", cfg=cfg,
    )
    x = jnp.asarray(rng.standard_normal((1, 512, 512, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    cid, fov = model.apply({"params": params}, x)
    assert cid.shape == (1, 512, 512)
    assert fov.shape == (1,)
    assert np.isfinite(np.asarray(cid)).all()
