"""Depth Anything V3 (DA3METRIC-LARGE serving contract).

Capability parity with reference ``Depth_Anything_V3/``: input (B, 518, 518, 3)
ImageNet-normalized single view; outputs metric ``depth`` (B, H, W) plus a
``sky`` mask (B, H, W) (reference ``onnx_export.py`` wrapper returns both,
``output_names=['depth','sky']``; postprocess/benchmark identical to the DA-V2
template, ``Depth_Anything_V3/onnx2trt.py:100-200``).

Architecture note: DA3 uses a plain DINOv2-style transformer backbone with a
dual-branch dense prediction head (depth + sky). The upstream
``depth_anything_3`` package is not vendored in the reference (gitignored), so
this module reimplements the serving contract on our DINOv2-L encoder with a
dual-output DPT head: shared fusion pyramid, separate output convs per branch
— the same compute/memory profile (ViT-L encoder dominates). Weight-level
parity requires the upstream checkpoint through ``weights/convert.py``'s
generic mappings once available.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.dpt import (
    DPTHead,
    FeatureFusionBlock,
    PixelShuffleUpsample,
    _bilinear_ac,
)
from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
    HEAD_CONFIGS,
    INTERMEDIATE_LAYER_IDX,
)
from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS, DinoViT


class DualDPTHead(nn.Module):
    """DPT fusion pyramid with two dense output branches (depth, sky)."""

    in_channels: int
    features: int = 256
    out_channels: Any = (256, 512, 1024, 1024)
    patch_size: int = 14
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features, patch_hw):
        ph, pw = patch_hw
        oc = list(self.out_channels)

        levels = []
        for i, feat in enumerate(features):
            tokens = feat[0] if isinstance(feat, (tuple, list)) else feat
            b, n, d = tokens.shape
            x = tokens.reshape(b, ph, pw, d).astype(self.dtype)
            x = nn.Conv(oc[i], (1, 1), dtype=self.dtype, name=f"project_{i}")(x)
            if i == 0:
                x = PixelShuffleUpsample(oc[0], 4, self.dtype, name="resize_0")(x)
            elif i == 1:
                x = PixelShuffleUpsample(oc[1], 2, self.dtype, name="resize_1")(x)
            elif i == 3:
                x = nn.Conv(
                    oc[3], (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                    name="resize_3",
                )(x)
            levels.append(x)

        rn = [
            nn.Conv(
                self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                name=f"layer{i + 1}_rn",
            )(x)
            for i, x in enumerate(levels)
        ]
        l1, l2, l3, l4 = rn
        p4 = FeatureFusionBlock(self.features, self.dtype, name="refinenet4")(
            l4, size=l3.shape[1:3]
        )
        p3 = FeatureFusionBlock(self.features, self.dtype, name="refinenet3")(
            p4, l3, size=l2.shape[1:3]
        )
        p2 = FeatureFusionBlock(self.features, self.dtype, name="refinenet2")(
            p3, l2, size=l1.shape[1:3]
        )
        p1 = FeatureFusionBlock(self.features, self.dtype, name="refinenet1")(p2, l1)

        out = nn.Conv(
            self.features // 2, (3, 3), padding=1, dtype=self.dtype, name="output_conv1"
        )(p1)
        out = _bilinear_ac(out, (ph * self.patch_size, pw * self.patch_size))

        def branch(name):
            y = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name=f"{name}_conv0")(out)
            y = nn.relu(y)
            return nn.Conv(1, (1, 1), dtype=self.dtype, name=f"{name}_conv2")(y)

        depth = branch("depth")[..., 0].astype(jnp.float32)
        sky = branch("sky")[..., 0].astype(jnp.float32)
        return depth, sky


import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DA3Config:
    """Tiny-config override for tests (no global table mutation)."""

    vit_config: Any = None
    features: Optional[int] = None
    out_channels: Optional[Tuple[int, ...]] = None
    out_indices: Optional[Tuple[int, ...]] = None


class DepthAnythingV3(nn.Module):
    """Input (B, H, W, 3) normalized; returns (depth (B,H,W) metric meters,
    sky (B,H,W) in [0,1])."""

    encoder: str = "vitl"
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # int8 w8a8 serving for the backbone Dense layers (ops/quant.py)
    quant: str = "none"
    cfg: DA3Config = DA3Config()

    @nn.compact
    def __call__(self, x: jax.Array):
        vit_cfg = self.cfg.vit_config or VIT_CONFIGS[self.encoder]
        head_cfg = (
            {"features": self.cfg.features,
             "out_channels": self.cfg.out_channels}
            if self.cfg.features is not None
            else HEAD_CONFIGS[self.encoder]
        )
        ph, pw = x.shape[1] // vit_cfg.patch_size, x.shape[2] // vit_cfg.patch_size

        out_indices = self.cfg.out_indices or INTERMEDIATE_LAYER_IDX[self.encoder]
        features = DinoViT(
            vit_cfg,
            out_indices=out_indices,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
            name="backbone",
        )(x)
        depth, sky = DualDPTHead(
            in_channels=vit_cfg.dim,
            features=head_cfg["features"],
            out_channels=head_cfg["out_channels"],
            dtype=self.dtype,
            name="head",
        )(features, (ph, pw))
        # metric depth via exp (DA3 predicts log-depth); sky via sigmoid
        return jnp.exp(depth), nn.sigmoid(sky)
