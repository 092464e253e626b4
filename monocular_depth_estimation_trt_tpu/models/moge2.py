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

Architecture (reconstruction of the upstream MoGe-2 head — upstream is
gitignored in the reference; topology rebuilt from the MoGe papers/repo
structure, with a torch mirror in ``tests/torch_mirror_geometric.py`` fixing
the state-dict layout for ``weights/convert.py::convert_moge2``):

* ``backbone``: DINOv2 over a 14-multiple grid sized to the token budget;
  4 intermediate taps.
* ``head``: per-tap 1x1 projections summed at the patch grid, then three
  deconv (2x2 stride-2) upsample stages with a residual conv block each
  (the upstream Head's ``projects`` + ``upsample_blocks``), then branch
  output stacks for points (3ch, z through exp), normal (3ch, normalized)
  and mask (1ch, sigmoid), all bilinearly mapped to the requested
  resolution.
* ``scale_head``: 2-layer MLP on the cls token -> exp -> metric scale.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
    INTERMEDIATE_LAYER_IDX,
)
from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS, DinoViT
from monocular_depth_estimation_trt_tpu.ops.resize import resize


def grid_for_tokens(h: int, w: int, num_tokens: int, patch: int = 14) -> Tuple[int, int]:
    """Aspect-preserving (grid_h, grid_w) with grid_h*grid_w ~= num_tokens."""
    aspect = w / h
    gh = max(int(round(math.sqrt(num_tokens / aspect))), 1)
    gw = max(int(round(gh * aspect)), 1)
    return gh, gw


class ResidualConvBlock(nn.Module):
    """relu-conv-relu-conv + skip (the upstream head's residual block)."""

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        return x + h


class MoGeHead(nn.Module):
    """projects + upsample pyramid + branch outputs (upstream ``head``)."""

    num_levels: int
    proj_dim: int
    up_dims: Tuple[int, ...]
    predict_normal: bool
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, patch_hw: Tuple[int, int], out_hw: Tuple[int, int]):
        gh, gw = patch_hw
        x = 0.0
        for i, (patch_tokens, _cls) in enumerate(feats):
            t = nn.Dense(self.proj_dim, dtype=self.dtype, name=f"project_{i}")(
                patch_tokens
            )
            x = x + t
        x = x.reshape(x.shape[0], gh, gw, self.proj_dim)

        from monocular_depth_estimation_trt_tpu.models.dpt import (
            PixelShuffleUpsample,
        )

        for j, dim in enumerate(self.up_dims):
            x = PixelShuffleUpsample(dim, 2, self.dtype,
                                     name=f"upsample_{j}_deconv")(x)
            x = ResidualConvBlock(dim, self.dtype, name=f"upsample_{j}_res")(x)

        def branch(name: str, ch: int) -> jax.Array:
            y = nn.Conv(self.up_dims[-1], (3, 3), padding=1, dtype=self.dtype,
                        name=f"{name}_conv0")(x)
            y = nn.relu(y)
            return nn.Conv(ch, (1, 1), dtype=self.dtype, name=f"{name}_conv1")(y)

        outs = {}
        points = branch("points", 3).astype(jnp.float32)
        outs["points"] = points
        if self.predict_normal:
            outs["normal"] = branch("normal", 3).astype(jnp.float32)
        outs["mask"] = branch("mask", 1).astype(jnp.float32)

        # map dense outputs back to the requested resolution
        def to_out(y):
            return resize(y, out_hw, method="linear")

        return {k: to_out(v) for k, v in outs.items()}


@dataclasses.dataclass(frozen=True)
class MoGeConfig:
    """Tiny-config override for tests (avoids global table mutation)."""

    vit_config: Any = None
    proj_dim: Optional[int] = None
    up_dims: Optional[Tuple[int, ...]] = None
    out_indices: Optional[Tuple[int, ...]] = None


class MoGe2(nn.Module):
    """Returns dict(points, normal, mask, metric_scale) at input resolution."""

    encoder: str = "vits"
    num_tokens: int = 1800
    predict_normal: bool = True
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # int8 w8a8 serving for the backbone Dense layers (ops/quant.py)
    quant: str = "none"
    cfg: MoGeConfig = MoGeConfig()

    @nn.compact
    def __call__(self, x: jax.Array):
        vit_cfg = self.cfg.vit_config or VIT_CONFIGS[self.encoder]
        out_indices = self.cfg.out_indices or INTERMEDIATE_LAYER_IDX[self.encoder]
        proj_dim = self.cfg.proj_dim or 512
        up_dims = self.cfg.up_dims or (256, 128, 64)
        b, H, W, _ = x.shape
        gh, gw = grid_for_tokens(H, W, self.num_tokens, vit_cfg.patch_size)
        # resize to the token grid's pixel resolution (multiple of 14)
        xin = resize(x, (gh * vit_cfg.patch_size, gw * vit_cfg.patch_size),
                     method="linear")

        feats = DinoViT(
            vit_cfg,
            out_indices=out_indices,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
            name="backbone",
        )(xin)

        dense = MoGeHead(
            num_levels=len(feats),
            proj_dim=proj_dim,
            up_dims=tuple(up_dims),
            predict_normal=self.predict_normal,
            dtype=self.dtype,
            name="head",
        )(feats, (gh, gw), (H, W))

        points = dense["points"]
        # z is predicted through exp to stay positive pre-shift (MoGe's
        # positive-depth parametrization)
        points = jnp.concatenate(
            [points[..., :2], jnp.exp(jnp.clip(points[..., 2:], -10, 10))], axis=-1
        )

        out = {"points": points}
        if self.predict_normal:
            normal = dense["normal"]
            out["normal"] = normal / jnp.maximum(
                jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-8
            )
        out["mask"] = jax.nn.sigmoid(dense["mask"][..., 0])

        cls_token = feats[-1][1]
        s = nn.Dense(256, dtype=self.dtype, name="scale_fc1")(cls_token)
        s = nn.gelu(s, approximate=False)
        s = nn.Dense(1, dtype=self.dtype, name="scale_fc2")(s)
        out["metric_scale"] = jnp.exp(
            jnp.clip(s[:, 0].astype(jnp.float32), -10, 10)
        )
        return out
