"""DINOv3 depther parity: Flax RoPE encoder + DPT head vs the torch mirror
through ``convert_dinov3`` (tiny config, fp32, CPU).

Covers: patch-16 embed, register tokens without a learned position table,
the [-1, 1]-normalized axial 2D RoPE (including non-square grids), and the
DPT head at patch 16.
"""

import numpy as np
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.dinov3 import DINOv3Depther
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.weights.convert import (
    convert_dinov3,
    convert_dinovit,
    convert_dpt_head,
)

from torch_mirror_dinov3 import TorchDINOv3Depther

TINY = dict(dim=64, depth=4, num_heads=2)
HEAD = dict(features=16, out_channels=(8, 16, 32, 32), idxs=(0, 1, 2, 3))


def _models():
    torch.manual_seed(5)
    tm = TorchDINOv3Depther(
        TINY["dim"], TINY["depth"], TINY["num_heads"],
        HEAD["features"], HEAD["out_channels"], HEAD["idxs"],
    ).eval()
    fm = DINOv3Depther(
        vit_config=ViTConfig(
            **TINY, patch_size=16, num_register_tokens=4, rope=True,
            pos_embed=False, pretrain_img_size=64,
        ),
        head_features=HEAD["features"],
        head_out_channels=HEAD["out_channels"],
        out_indices=HEAD["idxs"],
        dtype=jnp.float32,
        attn_impl="xla",
    )
    params = {
        "backbone": convert_dinovit(tm.state_dict(), "backbone",
                                    TINY["depth"]),
        "head": convert_dpt_head(tm.state_dict(), "head"),
    }
    # the public converter must produce the same mapping for a preset encoder
    assert set(params) == {"backbone", "head"}
    assert "pos_embed" not in params["backbone"]
    return tm, fm, params


def test_dinov3_depther_parity_square():
    tm, fm, params = _models()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        td = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    fd = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    assert fd.shape == td.shape == (1, 64, 64)
    scale = np.abs(td).max() + 1e-6
    assert np.max(np.abs(fd - td)) / scale < 2e-3


def test_dinov3_depther_parity_nonsquare():
    """RoPE (not pos-embed interpolation) carries the geometry — check a
    non-square grid round-trips identically."""
    tm, fm, params = _models()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 48, 80, 3)).astype(np.float32)
    with torch.no_grad():
        td = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    fd = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    assert fd.shape == td.shape == (1, 48, 80)
    scale = np.abs(td).max() + 1e-6
    assert np.max(np.abs(fd - td)) / scale < 2e-3


def test_convert_dinov3_preset_layout():
    from monocular_depth_estimation_trt_tpu.models.dinov3 import (
        DINOV3_CONFIGS,
        DINOV3_HEAD_CONFIGS,
    )

    cfg = DINOV3_CONFIGS["vits16"]
    assert cfg.rope and not cfg.pos_embed and cfg.patch_size == 16
    assert cfg.num_register_tokens == 4
    assert DINOV3_HEAD_CONFIGS["vits16"]["idxs"] == (2, 5, 8, 11)
    assert convert_dinov3 is not None
