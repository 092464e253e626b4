"""MoGe-2 family: affine-invariant point map + normal + mask + metric scale.

Serving contracts (reference ``MoGe_2/onnx_export.py:55-69`` and
``Metric_Anything/onnx_export.py:73-74`` — Metric Anything's
student_pointmap IS the MoGe-2 architecture, reference
``Metric_Anything/infer.py:12-14``):

* input: (1, H, W, 3) ImageNet-normalized image at an aspect-preserving
  resolution (e.g. 291x518 / 388x518), plus a static token budget;
* outputs: ``points`` (1, H, W, 3) affine-invariant point map, ``normal``
  (1, H, W, 3) unit normals, ``mask`` (1, H, W) validity in [0, 1],
  ``metric_scale`` (1,);
* postprocess: ``recover_focal_shift`` -> intrinsics -> z-shifted depth ->
  re-unprojected points -> metric scaling -> inf-masking (reference
  ``MoGe_2/onnx2trt.py:169-206``), implemented on device in the pipeline.

Architecture: DINOv2 encoder over a 14-multiple grid sized to the token
budget, DPT-style neck, separate dense heads (points / normal / mask) and a
cls-token metric-scale head; dense outputs are bilinearly mapped back to the
requested resolution (the upstream also decodes at the token grid and
resamples). Weight-level parity requires upstream checkpoints.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
    HEAD_CONFIGS,
    INTERMEDIATE_LAYER_IDX,
)
from monocular_depth_estimation_trt_tpu.models.geometric import DPTNeck
from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS, DinoViT
from monocular_depth_estimation_trt_tpu.ops.resize import resize


def grid_for_tokens(h: int, w: int, num_tokens: int, patch: int = 14) -> Tuple[int, int]:
    """Aspect-preserving (grid_h, grid_w) with grid_h*grid_w ~= num_tokens."""
    aspect = w / h
    gh = max(int(round(math.sqrt(num_tokens / aspect))), 1)
    gw = max(int(round(gh * aspect)), 1)
    return gh, gw


class MoGe2(nn.Module):
    """Returns dict(points, normal, mask, metric_scale) at input resolution."""

    encoder: str = "vits"
    num_tokens: int = 1800
    predict_normal: bool = True
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array):
        vit_cfg = VIT_CONFIGS[self.encoder]
        head_cfg = HEAD_CONFIGS[self.encoder]
        b, H, W, _ = x.shape
        gh, gw = grid_for_tokens(H, W, self.num_tokens, vit_cfg.patch_size)
        # resize to the token grid's pixel resolution (multiple of 14)
        xin = resize(x, (gh * vit_cfg.patch_size, gw * vit_cfg.patch_size),
                     method="linear")

        feats = DinoViT(
            vit_cfg,
            out_indices=INTERMEDIATE_LAYER_IDX[self.encoder],
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="backbone",
        )(xin)

        dense = DPTNeck(
            head_cfg["features"], head_cfg["out_channels"], self.dtype, name="neck"
        )(feats, (gh, gw))
        dense = resize(dense, (H, W), method="linear")

        def head(name, ch):
            y = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                        name=f"{name}_conv0")(dense)
            y = nn.relu(y)
            return nn.Conv(ch, (1, 1), dtype=self.dtype, name=f"{name}_conv1")(y)

        points = head("points", 3).astype(jnp.float32)
        # z is predicted through exp to stay positive pre-shift (MoGe uses a
        # similar positive-depth parametrization)
        points = jnp.concatenate(
            [points[..., :2], jnp.exp(jnp.clip(points[..., 2:], -10, 10))], axis=-1
        )

        out = {"points": points}
        if self.predict_normal:
            normal = head("normal", 3).astype(jnp.float32)
            out["normal"] = normal / jnp.maximum(
                jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-8
            )
        mask = head("mask", 1).astype(jnp.float32)
        out["mask"] = jax.nn.sigmoid(mask[..., 0])

        cls_token = feats[-1][1]
        s = nn.Dense(256, dtype=self.dtype, name="scale_fc1")(cls_token)
        s = nn.gelu(s)
        s = nn.Dense(1, dtype=self.dtype, name="scale_fc2")(s)
        out["metric_scale"] = jnp.exp(
            jnp.clip(s[:, 0].astype(jnp.float32), -10, 10)
        )
        return out
