"""Depth Pro parity: Flax vs torch mirror through convert_depth_pro.

Gates the full multi-scale machinery end to end at a ratio-preserving tiny
geometry (img 512, 128px windows, 5x5 + 3x3 + 1 views through one shared
ViT pass — the exact split/merge/stride ratios of the production 1536
preset): overlapping split, raw intermediate hooks, seam-cropped merges,
project+upsample blocks, low-res image-encoder fusion, multires fusion
decoder, upconv head, and the FoV network.
"""

import numpy as np
import torch

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.depth_pro import (
    DepthPro,
    DepthProConfig,
)
from monocular_depth_estimation_trt_tpu.models.vit import ViTConfig
from monocular_depth_estimation_trt_tpu.weights.convert import convert_depth_pro

from torch_mirror_depth_pro import TorchDepthPro

VIT = dict(dim=32, depth=3, num_heads=2)
GEO = dict(img_size=512, window=128, stride0=96, stride1=64)
HOOKS = (0, 1)
DIMS = (8, 16, 32, 32)
FEATS = 16


def test_depth_pro_parity(rng):
    torch.manual_seed(37)
    tm = TorchDepthPro(
        img_size=GEO["img_size"], window=GEO["window"],
        stride0=GEO["stride0"], stride1=GEO["stride1"],
        vit_dim=VIT["dim"], vit_depth=VIT["depth"], vit_heads=VIT["num_heads"],
        vit_patch=16, hook_ids=HOOKS,
        decoder_features=FEATS, dims_encoder=DIMS,
    )
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    tm.eval()

    cfg = DepthProConfig(
        img_size=GEO["img_size"], window=GEO["window"],
        stride0=GEO["stride0"], stride1=GEO["stride1"],
        vit_config=ViTConfig(dim=VIT["dim"], depth=VIT["depth"],
                             num_heads=VIT["num_heads"], patch_size=16,
                             pretrain_img_size=GEO["window"]),
        hook_block_ids=HOOKS,
    )
    fm = DepthPro(decoder_features=FEATS, dims_encoder=DIMS,
                  dtype=jnp.float32, attn_impl="xla", cfg=cfg)
    params = convert_depth_pro(tm.state_dict(), vit_depth=VIT["depth"])

    x = rng.standard_normal(
        (1, GEO["img_size"], GEO["img_size"], 3)
    ).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_cid, ref_fov = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    cid, fov = fm.apply({"params": params}, jnp.asarray(x))

    cid = np.asarray(cid)
    assert cid.shape == tuple(ref_cid.shape)
    err = np.max(np.abs(cid - ref_cid.numpy())) / max(
        np.max(np.abs(ref_cid.numpy())), 1e-6
    )
    assert err < 2e-3, f"cid rel err {err:.2e}"
    assert abs(float(fov[0]) - float(ref_fov[0])) < 2e-3 * max(
        abs(float(ref_fov[0])), 1.0
    )
