"""Depth Anything V2 — DINOv2 encoder + DPT head, relative and metric depth.

Capability parity with reference ``Depth_Anything_V2/`` (model configs at
``infer.py:46-57``; metric variant with max_depth 20 (hypersim) / 80 (vkitti)
at ``infer_metric.py:54-58``). Also the architecture behind Distill Any Depth
(small/base, reference ``Distill_Any_Depth/infer.py:50-58``) and Depth
Anything AC (reference ``Depth_Anything_AC/infer.py``), which are served as
encoder/head configs of this module with their own checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.dpt import DPTHead
from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS, DinoViT

# features / out_channels per encoder (reference Depth_Anything_V2/infer.py:48-53)
HEAD_CONFIGS = {
    "vits": dict(features=64, out_channels=(48, 96, 192, 384)),
    "vitb": dict(features=128, out_channels=(96, 192, 384, 768)),
    "vitl": dict(features=256, out_channels=(256, 512, 1024, 1024)),
    "vitg": dict(features=384, out_channels=(1536, 1536, 1536, 1536)),
}

# DINOv2 intermediate layers tapped by the DPT head (upstream DA-V2 dpt.py)
INTERMEDIATE_LAYER_IDX = {
    "vits": (2, 5, 8, 11),
    "vitb": (2, 5, 8, 11),
    "vitl": (4, 11, 17, 23),
    "vitg": (9, 19, 29, 39),
}


class DepthAnythingV2(nn.Module):
    """Input: preprocessed images (B, H, W, 3), H/W multiples of 14.
    Output: depth (B, H, W) — relative (>=0) or metric (meters)."""

    encoder: str = "vits"
    metric: bool = False
    max_depth: float = 20.0
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # int8 w8a8 encoder serving (ops/quant.py): "none" | "calib" | "serve".
    # The DPT head stays bf16 (conv-dominated, small fraction of FLOPs).
    quant: str = "none"
    # Optional explicit overrides (tests / non-preset variants); None -> the
    # encoder presets above.
    vit_config: Any = None
    head_features: Any = None
    head_out_channels: Any = None
    out_indices: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        vit_cfg = self.vit_config or VIT_CONFIGS[self.encoder]
        head_cfg = HEAD_CONFIGS.get(self.encoder, {})
        features_dim = self.head_features or head_cfg["features"]
        out_channels = self.head_out_channels or head_cfg["out_channels"]
        out_indices = self.out_indices or INTERMEDIATE_LAYER_IDX[self.encoder]
        ph, pw = x.shape[1] // vit_cfg.patch_size, x.shape[2] // vit_cfg.patch_size

        features = DinoViT(
            vit_cfg,
            out_indices=out_indices,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
            name="pretrained",
        )(x)

        depth = DPTHead(
            in_channels=vit_cfg.dim,
            features=features_dim,
            out_channels=out_channels,
            final_act="sigmoid" if self.metric else "relu",
            dtype=self.dtype,
            name="depth_head",
        )(features, (ph, pw))

        if self.metric:
            return depth * self.max_depth
        # upstream applies relu after the head (already >=0 from the head's
        # final relu; kept for exact parity)
        return nn.relu(depth)
