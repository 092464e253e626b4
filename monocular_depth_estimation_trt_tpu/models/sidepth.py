"""SIDepth — scale-invariant monocular depth via SSI depth.

Capability parity with reference ``later/SIDepth/`` (README-only staging
dir: "2d image -> depth", upstream compphoto/SIDepth, SIGGRAPH 2024
"Scale-Invariant Monocular Depth Estimation via SSI Depth"). The published
two-stage design: first estimate scale-AND-shift-invariant (SSI) depth with
an off-the-shelf relative estimator, then a second network conditioned on
the image and the SSI estimate resolves the shift ambiguity and emits
scale-invariant (SI) depth — metric up to one global scale.

Reconstruction (confidence: medium — the reference vendors no code; the
topology is frozen by the torch mirror in ``tests/torch_mirror_sidepth.py``,
which defines the state-dict layout ``weights/convert.py::convert_sidepth``
consumes):

* stage 1 (SSI): DINOv2 + DPT relative disparity from the RGB alone;
* stage 2 (SI): a second DINOv2 whose patch embed consumes FOUR channels
  ``[rgb, ssi/max(ssi)]`` + a DPT head predicting log SI depth,
  ``depth = exp(clip(r, -6, 6))`` — the conditioning network the paper adds
  on top of the SSI estimate.

TPU-first: both ViTs and the normalization fuse into one jitted program
(the same composition pattern as ``models/prior_depth.py``).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
    HEAD_CONFIGS,
    INTERMEDIATE_LAYER_IDX,
)
from monocular_depth_estimation_trt_tpu.models.dpt import DPTHead
from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS, DinoViT


class SIDepth(nn.Module):
    """Preprocessed image (B, H, W, 3), H/W multiples of 14 ->
    dict(ssi (B, H, W) relative disparity, depth (B, H, W) SI depth)."""

    encoder: str = "vits"
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # test-size overrides (None -> encoder presets)
    vit_config: Any = None
    head_features: Any = None
    head_out_channels: Any = None
    out_indices: Any = None

    @nn.compact
    def __call__(self, image: jax.Array) -> Dict[str, jax.Array]:
        vit_cfg = self.vit_config or VIT_CONFIGS[self.encoder]
        head_cfg = HEAD_CONFIGS.get(self.encoder, {})
        features_dim = self.head_features or head_cfg["features"]
        out_channels = tuple(self.head_out_channels or head_cfg["out_channels"])
        out_indices = self.out_indices or INTERMEDIATE_LAYER_IDX[self.encoder]
        ph = image.shape[1] // vit_cfg.patch_size
        pw = image.shape[2] // vit_cfg.patch_size

        # stage 1: SSI relative disparity from the RGB alone
        ssi_feats = DinoViT(
            vit_cfg, out_indices=out_indices, dtype=self.dtype,
            attn_impl=self.attn_impl, name="ssi",
        )(image)
        ssi = DPTHead(
            in_channels=vit_cfg.dim, features=features_dim,
            out_channels=out_channels, final_act="relu", dtype=self.dtype,
            name="ssi_head",
        )(ssi_feats, (ph, pw))  # (B, H, W)

        # stage 2: SI network conditioned on [rgb, ssi/max]
        ssi32 = ssi.astype(jnp.float32)
        norm = ssi32 / (jnp.max(ssi32, axis=(1, 2), keepdims=True) + 1e-6)
        cond = jnp.concatenate(
            [image.astype(jnp.float32), norm[..., None]], axis=-1
        )
        si_feats = DinoViT(
            vit_cfg, out_indices=out_indices, dtype=self.dtype,
            attn_impl=self.attn_impl, name="si",
        )(cond.astype(self.dtype))
        r = DPTHead(
            in_channels=vit_cfg.dim, features=features_dim,
            out_channels=out_channels, final_act="none", dtype=self.dtype,
            name="si_head",
        )(si_feats, (ph, pw))
        depth = jnp.exp(jnp.clip(r.astype(jnp.float32), -6.0, 6.0))
        return {"ssi": ssi32, "depth": depth}
