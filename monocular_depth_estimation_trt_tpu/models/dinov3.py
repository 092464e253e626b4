"""DINOv3 backbone family + DPT depther.

Capability parity with reference ``later/DINOv3/``: ``infer2.py:31-39`` runs
the bare backbone (``dinov3_vits16`` at 1024^2, antialiased resize +
ImageNet normalize); ``infer.py:25-37`` runs the hub depther
(``dinov3_*_dd`` = backbone + DPT head) producing a (B, 1, H, W) depth map
rendered with the Spectral colormap (``infer.py:39-45``).

DINOv3 architectural deltas vs DINOv2, expressed as :class:`ViTConfig`
options on the shared encoder (``models/vit.py``):

* patch 16;
* 2D axial RoPE on patch tokens in every attention layer (coordinates
  normalized to [-1, 1] — resolution-free), NO interpolated learned
  position table (``rope=True, pos_embed=False``);
* 4 register tokens; LayerScale; SwiGLU FFN on the 7B tier.

The exact upstream layout is frozen by ``tests/torch_mirror_dinov3.py``
(confidence: medium — the reference gitignores the upstream repo), and
``weights/convert.py::convert_dinov3`` consumes that layout.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.dpt import DPTHead
from monocular_depth_estimation_trt_tpu.models.vit import DinoViT, ViTConfig

# Backbone tiers (public DINOv3 release names, later/DINOv3/infer.py:26-28)
DINOV3_CONFIGS = {
    "vits16": ViTConfig(dim=384, depth=12, num_heads=6, patch_size=16,
                        num_register_tokens=4, rope=True, pos_embed=False,
                        pretrain_img_size=1024),
    "vitl16": ViTConfig(dim=1024, depth=24, num_heads=16, patch_size=16,
                        num_register_tokens=4, rope=True, pos_embed=False,
                        pretrain_img_size=1024),
    "vit7b16": ViTConfig(dim=4096, depth=40, num_heads=32, patch_size=16,
                         num_register_tokens=4, rope=True, pos_embed=False,
                         ffn="swiglu", pretrain_img_size=1024),
}

DINOV3_HEAD_CONFIGS = {
    "vits16": dict(features=64, out_channels=(48, 96, 192, 384),
                   idxs=(2, 5, 8, 11)),
    "vitl16": dict(features=256, out_channels=(256, 512, 1024, 1024),
                   idxs=(4, 11, 17, 23)),
    "vit7b16": dict(features=384, out_channels=(1536, 1536, 1536, 1536),
                    idxs=(9, 19, 29, 39)),
}


class DINOv3Depther(nn.Module):
    """DINOv3 encoder + DPT depth head (the hub ``dinov3_*_dd`` contract:
    preprocessed (B, H, W, 3), H/W multiples of 16 -> depth (B, H, W) >= 0).
    """

    encoder: str = "vitl16"
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # test-size overrides (None -> encoder presets)
    vit_config: Any = None
    head_features: Any = None
    head_out_channels: Any = None
    out_indices: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.vit_config or DINOV3_CONFIGS[self.encoder]
        head_cfg = DINOV3_HEAD_CONFIGS.get(self.encoder, {})
        features_dim = self.head_features or head_cfg["features"]
        out_channels = tuple(self.head_out_channels or head_cfg["out_channels"])
        out_indices = self.out_indices or head_cfg["idxs"]
        ph, pw = x.shape[1] // cfg.patch_size, x.shape[2] // cfg.patch_size

        feats = DinoViT(
            cfg, out_indices=out_indices, dtype=self.dtype,
            attn_impl=self.attn_impl, name="backbone",
        )(x)
        depth = DPTHead(
            in_channels=cfg.dim, features=features_dim,
            out_channels=out_channels, patch_size=cfg.patch_size,
            final_act="relu", dtype=self.dtype, name="head",
        )(feats, (ph, pw))
        return depth
