"""MapAnything — multi-view metric 3D reconstruction.

Capability parity with reference ``later/Map_Anything/infer.py:30-68``:
``model.infer(views)`` returns, per view, the full metric output set —
``pts3d`` (world), ``pts3d_cam``, ``depth_z``, ``depth_along_ray``,
``ray_directions``, ``intrinsics``, ``camera_poses`` (OpenCV cam2world 4x4),
``cam_trans``/``cam_quats``, ``conf``, ``mask``, ``non_ambiguous_mask``
(+logits), ``metric_scaling_factor``, and ``img_no_norm``.

Reconstruction (confidence: medium — the upstream repo is gitignored; the
layout is frozen by ``tests/torch_mirror_map_anything.py``): upstream
MapAnything factors geometry exactly as rays x depth-along-ray x scale with
a multi-view alternating-attention transformer. Reused here:

* the VGGT :class:`~models.vggt.Aggregator` (frame/global alternating
  attention, 2D RoPE) as the multi-view trunk;
* one 6-channel DPT head predicting [ray (3, unit, forward-facing),
  log depth-along-ray, confidence, mask logits] per view;
* the VGGT :class:`~models.vggt.CameraHead` for cam2world pose encodings
  (XYZW quaternion + translation + fov);
* a scalar metric-scale head on the mean camera token (``exp`` activation).

Everything downstream (pts3d_cam = ray * dar, world composition, intrinsics
from fov) is closed-form in the registry forward — no host math.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.dpt import DPTHead
from monocular_depth_estimation_trt_tpu.models.vggt import (
    Aggregator,
    CameraHead,
    VGGTConfig,
    apply_view_dpt,
)


class MapAnythingDenseHead(nn.Module):
    """6-channel DPT over aggregated tokens -> per-view ray directions
    (unit, +z forward), depth-along-ray, confidence (expp1), mask logits."""

    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, agg_tokens, patch_hw, num_special: int):
        ph, pw = patch_hw
        dpt = DPTHead(
            in_channels=agg_tokens[0].shape[-1],
            features=self.features,
            out_channels=self.out_channels,
            final_act="none",
            num_outputs=6,
            dtype=self.dtype,
            name="dpt",
        )
        out, b, s = apply_view_dpt(dpt, agg_tokens, patch_hw, num_special)
        H, W = ph * dpt.patch_size, pw * dpt.patch_size
        ray = jnp.concatenate(
            [out[..., 0:2], nn.softplus(out[..., 2:3]) + 1e-3], axis=-1
        )
        ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        dar = jnp.exp(jnp.clip(out[..., 3], -10.0, 10.0))
        conf = 1.0 + jnp.exp(jnp.clip(out[..., 4], -10.0, 10.0))
        logits = out[..., 5]
        return (
            ray.reshape(b, s, H, W, 3),
            dar.reshape(b, s, H, W),
            conf.reshape(b, s, H, W),
            logits.reshape(b, s, H, W),
        )


class MapAnything(nn.Module):
    """views (B, S, H, W, 3) normalized -> dict(ray_directions,
    depth_along_ray, conf, mask_logits, pose_enc, metric_scaling_factor).

    ``pose_enc`` decodes as **cam2world** for this model (upstream returns
    cam2world poses; the VGGT pipeline's is world2cam)."""

    cfg: VGGTConfig = VGGTConfig()
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # int8 w8a8 serving for the VGGT aggregator (ops/quant.py); the dense/
    # camera/scale heads stay full-precision
    quant: str = "none"

    @nn.compact
    def __call__(self, views: jax.Array) -> Dict[str, jax.Array]:
        agg, patch_hw = Aggregator(self.cfg, self.dtype, self.attn_impl,
                                   quant=self.quant, name="aggregator")(views)
        num_special = 1 + self.cfg.num_register_tokens
        ray, dar, conf, logits = MapAnythingDenseHead(
            features=self.cfg.head_features,
            out_channels=self.cfg.head_out_channels,
            dtype=self.dtype, name="dense_head",
        )(agg, patch_hw, num_special)
        pose_enc = CameraHead(
            2 * self.cfg.dim, num_heads=self.cfg.num_heads,
            dtype=self.dtype, name="camera_head",
        )(agg[-1])
        # one metric scale per scene from the mean camera token
        cam_tokens = agg[-1][:, :, 0]  # (B, S, 2dim)
        pooled = jnp.mean(cam_tokens.astype(jnp.float32), axis=1)
        h = nn.Dense(256, dtype=jnp.float32, name="scale_fc1")(pooled)
        msf = nn.Dense(1, dtype=jnp.float32, name="scale_fc2")(nn.gelu(h))
        msf = jnp.exp(jnp.clip(msf[..., 0], -10.0, 10.0))  # (B,)
        return {
            "ray_directions": ray,
            "depth_along_ray": dar,
            "conf": conf,
            "mask_logits": logits,
            "pose_enc": pose_enc,
            "metric_scaling_factor": msf,
        }
