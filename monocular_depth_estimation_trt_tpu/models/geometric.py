"""Camera-aware monocular 3D models: UniDepth V2 and UniK3D serving contracts.

Reference contracts:

* UniDepth V2 (``Uni_Depth_V2/onnx_export.py:52-53``): input ``rgbs``
  (1, 518, 518, 3) ImageNet-normalized -> ``pts_3d`` (1, H, W, 3),
  ``confidence`` (1, H, W), ``intrinsics`` (1, 3, 3). Postprocess: bilinear
  (align_corners=False) resize of points to the original size, depth = z,
  intrinsics rescaled (``onnx2trt.py:78-94,172-176``).
* UniK3D (``UniK3D/onnx_export.py:25-43``): same input -> ``pts_3d`` =
  unit rays x predicted distance, ``confidence``.

Architecture: both upstreams are DINOv2 encoders (with register tokens) +
camera-conditioned dense decoders. This module implements that shape:
DinoViT multi-layer features -> DPT fusion neck -> heads for log-depth /
log-distance and confidence, a camera head from the cls token predicting
pinhole intrinsics (UniDepth) or generic unit rays via intrinsics (UniK3D),
and on-device unprojection. Cost profile matches (the ViT encoder dominates);
weight-level parity requires upstream checkpoints via ``weights/convert.py``.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
    HEAD_CONFIGS,
    INTERMEDIATE_LAYER_IDX,
)
from monocular_depth_estimation_trt_tpu.models.dpt import (
    FeatureFusionBlock,
    PixelShuffleUpsample,
    _bilinear_ac,
)
from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS, DinoViT
from monocular_depth_estimation_trt_tpu.ops.camera import pixel_grid


class DPTNeck(nn.Module):
    """Shared DPT fusion pyramid returning a dense feature map at half
    input resolution (patch*14/2 grid upsampled to patch*14 by heads)."""

    features: int
    out_channels: Sequence[int]
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
                x = nn.Conv(oc[3], (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name="resize_3")(x)
            levels.append(x)
        rn = [
            nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name=f"layer{i + 1}_rn")(x)
            for i, x in enumerate(levels)
        ]
        l1, l2, l3, l4 = rn
        p4 = FeatureFusionBlock(self.features, self.dtype, name="refinenet4")(
            l4, size=l3.shape[1:3])
        p3 = FeatureFusionBlock(self.features, self.dtype, name="refinenet3")(
            p4, l3, size=l2.shape[1:3])
        p2 = FeatureFusionBlock(self.features, self.dtype, name="refinenet2")(
            p3, l2, size=l1.shape[1:3])
        p1 = FeatureFusionBlock(self.features, self.dtype, name="refinenet1")(p2, l1)
        return p1  # (B, ph*4*2, pw*4*2, features)


class PinholeCameraHead(nn.Module):
    """cls token -> pinhole intrinsics (fx, fy, cx, cy), softplus-positive,
    expressed in input-resolution pixels."""

    input_hw: Tuple[int, int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, cls_token: jax.Array) -> jax.Array:
        h, w = self.input_hw
        x = nn.Dense(256, dtype=self.dtype, name="fc1")(cls_token)
        x = nn.gelu(x)
        x = nn.Dense(4, dtype=self.dtype, name="fc2")(x.astype(jnp.float32))
        x = x.astype(jnp.float32)
        fx = jax.nn.softplus(x[:, 0]) * w
        fy = jax.nn.softplus(x[:, 1]) * h
        cx = jax.nn.sigmoid(x[:, 2]) * w
        cy = jax.nn.sigmoid(x[:, 3]) * h
        b = cls_token.shape[0]
        zeros = jnp.zeros((b,), jnp.float32)
        ones = jnp.ones((b,), jnp.float32)
        K = jnp.stack(
            [
                jnp.stack([fx, zeros, cx], axis=-1),
                jnp.stack([zeros, fy, cy], axis=-1),
                jnp.stack([zeros, zeros, ones], axis=-1),
            ],
            axis=-2,
        )
        return K  # (B, 3, 3)


class GeometricDepthModel(nn.Module):
    """UniDepth-V2 / UniK3D family.

    mode="unidepth": pts_3d from pinhole unprojection of predicted depth;
    mode="unik3d":   pts_3d = unit rays (from predicted K) * distance.

    Input (B, H, W, 3) normalized; returns dict with ``pts_3d`` (B, H, W, 3),
    ``confidence`` (B, H, W), ``intrinsics`` (B, 3, 3).
    """

    encoder: str = "vitb"
    mode: str = "unidepth"
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array):
        vit_cfg = VIT_CONFIGS[self.encoder]
        # upstream UniDepth/UniK3D use DINOv2 with 4 register tokens
        import dataclasses

        vit_cfg = dataclasses.replace(vit_cfg, num_register_tokens=4)
        head_cfg = HEAD_CONFIGS[self.encoder]
        b, H, W, _ = x.shape
        ph, pw = H // vit_cfg.patch_size, W // vit_cfg.patch_size

        feats = DinoViT(
            vit_cfg,
            out_indices=INTERMEDIATE_LAYER_IDX[self.encoder],
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="pixel_encoder",
        )(x)

        dense = DPTNeck(
            head_cfg["features"], head_cfg["out_channels"], self.dtype, name="neck"
        )(feats, (ph, pw))
        dense = _bilinear_ac(dense, (H, W))

        value = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="value_conv0")(dense)
        value = nn.relu(value)
        value = nn.Conv(1, (1, 1), dtype=self.dtype, name="value_conv1")(value)
        value = jnp.exp(jnp.clip(value[..., 0].astype(jnp.float32), -10.0, 10.0))

        conf = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="conf_conv0")(dense)
        conf = nn.relu(conf)
        conf = nn.Conv(1, (1, 1), dtype=self.dtype, name="conf_conv1")(conf)
        confidence = jax.nn.sigmoid(conf[..., 0].astype(jnp.float32))

        K = PinholeCameraHead((H, W), self.dtype, name="camera")(feats[-1][1])

        u, v = pixel_grid(H, W)
        fx, fy = K[:, 0, 0], K[:, 1, 1]
        cx, cy = K[:, 0, 2], K[:, 1, 2]
        rx = (u[None] - cx[:, None, None]) / fx[:, None, None]
        ry = (v[None] - cy[:, None, None]) / fy[:, None, None]
        rz = jnp.ones_like(rx)
        rays = jnp.stack([rx, ry, rz], axis=-1)  # (B, H, W, 3)

        if self.mode == "unik3d":
            # unit rays x euclidean distance (UniK3D/onnx_export.py:25-43)
            rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
            pts_3d = rays * value[..., None]
        else:
            # pinhole unprojection of metric depth (z = depth)
            pts_3d = rays * value[..., None]

        return {"pts_3d": pts_3d, "confidence": confidence, "intrinsics": K}
