"""Camera-aware monocular 3D models: UniDepth V2 and UniK3D.

Reference contracts:

* UniDepth V2 (``Uni_Depth_V2/onnx_export.py:52-53``): input ``rgbs``
  (1, 518, 518, 3) ImageNet-normalized -> ``pts_3d`` (1, H, W, 3),
  ``confidence`` (1, H, W), ``intrinsics`` (1, 3, 3). Postprocess: bilinear
  (align_corners=False) resize of points to the original size, depth = z,
  intrinsics rescaled (``onnx2trt.py:78-94,172-176``).
* UniK3D (``UniK3D/onnx_export.py:25-43``): same input -> ``pts_3d`` =
  unit rays x predicted distance, ``confidence``.

Architecture (reconstruction of the upstream decoders — the upstream repos
are gitignored in the reference, so the topology here is rebuilt from the
UniDepth V2 / UniK3D papers and export wrappers, and every module has a torch
mirror in ``tests/torch_mirror_geometric.py`` that fixes the state-dict
layout the converter (``weights/convert.py::convert_geometric``) consumes):

* ``pixel_encoder``: DINOv2 ViT with 4 register tokens; 4 intermediate taps.
* ``input_adapter``: per-tap Linear to the decoder width, summed + LayerNorm
  (the upstream ``ListAdapter`` + layer-slice stacking,
  ``UniK3D/onnx_export.py:31-38``).
* ``camera``: learned query latents cross-attending to the image tokens, a
  self-attention block, and a linear head -> 4 pinhole parameters activated
  as fx = W/2*exp, fy = H/2*exp, cx = W*sigmoid, cy = H*sigmoid (UniDepth's
  self-promptable camera module).
* ray conditioning: unit rays from the predicted camera on patch centers,
  embedded with a degree-8 real spherical-harmonics basis (upstream
  ``rsh_cart_8``) and projected to the decoder width
  (``ops/spherical_harmonics.py``).
* ``depth_module``: ray-conditioned self-attention blocks over patch tokens,
  pixel-shuffle upsampling, and a 2-channel output head (log-value +
  confidence logit). UniDepth interprets the value as metric z-depth;
  UniK3D as euclidean distance along predicted unit rays.
* ``rays_module`` (UniK3D only): dense unit-ray field from the same
  conditioned tokens (upstream predicts a global angular SH field; the dense
  per-patch formulation keeps identical outputs and is one fused matmul
  stack on TPU).

Everything is channels-last, bf16 compute / fp32 softmax-LN, and jit-static.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
    INTERMEDIATE_LAYER_IDX,
)
from monocular_depth_estimation_trt_tpu.models.dpt import PixelShuffleUpsample
from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS, DinoViT
from monocular_depth_estimation_trt_tpu.ops.resize import resize_hw
from monocular_depth_estimation_trt_tpu.ops.spherical_harmonics import (
    num_sh_components,
    real_spherical_harmonics,
)

# Decoder widths per encoder size (upstream scales the decoder with the
# backbone; hidden = half the ViT width, head-dim 64).
DECODER_DIMS = {
    "vits": 256,
    "vitb": 384,
    "vitl": 512,
    "vitg": 512,
}

SH_DEGREE = 8  # upstream rsh_cart_8


class CrossAttentionBlock(nn.Module):
    """Pre-LN attention block; cross-attention when ``context`` is given,
    self-attention otherwise. Mirrored 1:1 in tests/torch_mirror_geometric.py."""

    dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if context is None:
            c = h
        else:
            c = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name="norm_context")(context)
        hd = self.dim // self.num_heads
        b, nq, _ = h.shape
        nk = c.shape[1]
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(h)
        kv = nn.Dense(self.dim * 2, dtype=self.dtype, name="kv")(c)
        q = q.reshape(b, nq, self.num_heads, hd)
        k, v = jnp.split(kv.reshape(b, nk, 2, self.num_heads, hd), 2, axis=2)
        k = k[:, :, 0]
        v = v[:, :, 0]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / np.sqrt(hd)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, nq, self.dim)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="proj")(o)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.dim * 4, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class CameraModule(nn.Module):
    """Learned camera-parameter latents -> pinhole intrinsics.

    Upstream UniDepth's camera module: parameter queries attend over the
    image tokens, pass through a self-attention block, and decode to the 4
    pinhole parameters (``Uni_Depth_V2/onnx_export.py:9`` wraps it into the
    exported graph)."""

    dim: int
    num_heads: int
    input_hw: Tuple[int, int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        b = tokens.shape[0]
        latents = self.param(
            "latents", nn.initializers.normal(0.02), (1, 4, self.dim)
        ).astype(self.dtype)
        x = jnp.broadcast_to(latents, (b, 4, self.dim))
        x = CrossAttentionBlock(self.dim, self.num_heads, self.dtype,
                                name="cross")(x, tokens)
        x = CrossAttentionBlock(self.dim, self.num_heads, self.dtype,
                                name="self")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        p = nn.Dense(1, dtype=self.dtype, name="out")(x)[..., 0]  # (B, 4)
        p = p.astype(jnp.float32)
        h, w = self.input_hw
        fx = 0.5 * w * jnp.exp(p[:, 0])
        fy = 0.5 * h * jnp.exp(p[:, 1])
        cx = w * jax.nn.sigmoid(p[:, 2])
        cy = h * jax.nn.sigmoid(p[:, 3])
        zeros = jnp.zeros_like(fx)
        ones = jnp.ones_like(fx)
        K = jnp.stack(
            [
                jnp.stack([fx, zeros, cx], axis=-1),
                jnp.stack([zeros, fy, cy], axis=-1),
                jnp.stack([zeros, zeros, ones], axis=-1),
            ],
            axis=-2,
        )
        return K  # (B, 3, 3) fp32


def patch_center_rays(K: jax.Array, input_hw: Tuple[int, int],
                      patch_hw: Tuple[int, int]) -> jax.Array:
    """Unit rays through patch centers for a batch of intrinsics.

    K: (B, 3, 3) fp32 -> (B, ph*pw, 3)."""
    H, W = input_hw
    ph, pw = patch_hw
    sy, sx = H / ph, W / pw
    u = (jnp.arange(pw, dtype=jnp.float32) + 0.5) * sx
    v = (jnp.arange(ph, dtype=jnp.float32) + 0.5) * sy
    uu = jnp.broadcast_to(u[None, :], (ph, pw)).reshape(-1)
    vv = jnp.broadcast_to(v[:, None], (ph, pw)).reshape(-1)
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    rx = (uu[None] - cx[:, None]) / fx[:, None]
    ry = (vv[None] - cy[:, None]) / fy[:, None]
    rz = jnp.ones_like(rx)
    rays = jnp.stack([rx, ry, rz], axis=-1)
    return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)


class RayEmbedding(nn.Module):
    """SH(rays) -> decoder-width conditioning (upstream rsh_cart_8 + MLP)."""

    dim: int
    degree: int = SH_DEGREE
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, rays: jax.Array) -> jax.Array:
        sh = real_spherical_harmonics(rays, self.degree)  # fp32
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc1")(sh.astype(self.dtype))
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class DepthModule(nn.Module):
    """Ray-conditioned dense head: tokens -> (value, confidence) maps at
    quarter-patch-upsampled resolution (then bilinear to full)."""

    dim: int
    num_heads: int
    layers: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens: jax.Array, ray_emb: jax.Array,
                 patch_hw: Tuple[int, int], out_hw: Tuple[int, int]):
        ph, pw = patch_hw
        b = tokens.shape[0]
        x = tokens + ray_emb
        for i in range(self.layers):
            x = CrossAttentionBlock(self.dim, self.num_heads, self.dtype,
                                    name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        g = x.reshape(b, ph, pw, self.dim)
        g = PixelShuffleUpsample(self.dim // 2, 2, self.dtype, name="up1")(g)
        g = nn.gelu(
            nn.Conv(self.dim // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(g),
            approximate=False,
        )
        g = PixelShuffleUpsample(self.dim // 4, 2, self.dtype, name="up2")(g)
        g = nn.gelu(
            nn.Conv(self.dim // 4, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(g),
            approximate=False,
        )
        out = nn.Conv(2, (1, 1), dtype=self.dtype, name="out")(g)
        out = out.astype(jnp.float32)
        out = resize_hw(
            jnp.moveaxis(out, -1, 1).reshape(b * 2, ph * 4, pw * 4),
            out_hw, "linear", align_corners=False,
        ).reshape(b, 2, *out_hw)
        value = jnp.exp(jnp.clip(out[:, 0], -10.0, 10.0))
        confidence = jax.nn.sigmoid(out[:, 1])
        return value, confidence


class RaysModule(nn.Module):
    """Dense unit-ray field (UniK3D): conditioned tokens -> (B, H, W, 3)."""

    dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens: jax.Array, ray_emb: jax.Array,
                 patch_hw: Tuple[int, int], out_hw: Tuple[int, int]):
        ph, pw = patch_hw
        b = tokens.shape[0]
        x = tokens + ray_emb
        x = CrossAttentionBlock(self.dim, self.num_heads, self.dtype,
                                name="block_0")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        r = nn.Dense(3, dtype=self.dtype, name="out")(x).astype(jnp.float32)
        r = r.reshape(b, ph, pw, 3)
        r = resize_hw(
            jnp.moveaxis(r, -1, 1).reshape(b * 3, ph, pw),
            out_hw, "linear", align_corners=False,
        ).reshape(b, 3, *out_hw)
        r = jnp.moveaxis(r, 1, -1)
        return r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-6)


@dataclasses.dataclass(frozen=True)
class GeometricConfig:
    """Tiny-config override for tests (avoids global table mutation)."""

    vit_config: Any = None
    decoder_dim: Optional[int] = None
    out_indices: Optional[Tuple[int, ...]] = None


class GeometricDepthModel(nn.Module):
    """UniDepth-V2 / UniK3D family.

    mode="unidepth": pts_3d from pinhole unprojection of predicted z-depth;
    mode="unik3d":   pts_3d = predicted unit rays * euclidean distance.

    Input (B, H, W, 3) normalized; returns dict with ``pts_3d`` (B, H, W, 3),
    ``confidence`` (B, H, W), ``intrinsics`` (B, 3, 3).
    """

    encoder: str = "vitb"
    mode: str = "unidepth"
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # int8 w8a8 serving for the pixel-encoder Dense layers (ops/quant.py);
    # the camera/depth decoder cross-attention stays bf16
    quant: str = "none"
    cfg: GeometricConfig = GeometricConfig()

    @nn.compact
    def __call__(self, x: jax.Array):
        vit_cfg = self.cfg.vit_config or VIT_CONFIGS[self.encoder]
        # upstream UniDepth/UniK3D use DINOv2 with 4 register tokens
        vit_cfg = dataclasses.replace(vit_cfg, num_register_tokens=4)
        dim = self.cfg.decoder_dim or DECODER_DIMS[self.encoder]
        num_heads = max(dim // 64, 1)
        out_indices = self.cfg.out_indices or INTERMEDIATE_LAYER_IDX[self.encoder]
        b, H, W, _ = x.shape
        ph, pw = H // vit_cfg.patch_size, W // vit_cfg.patch_size

        feats = DinoViT(
            vit_cfg,
            out_indices=out_indices,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
            name="pixel_encoder",
        )(x)

        # input adapter: per-tap projection, summed (upstream ListAdapter +
        # slice stacking)
        tokens = 0.0
        for i, (patch_tokens, _cls) in enumerate(feats):
            tokens = tokens + nn.Dense(
                dim, dtype=self.dtype, name=f"adapter_{i}"
            )(patch_tokens)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                              name="adapter_norm")(tokens)

        K = CameraModule(dim, num_heads, (H, W), self.dtype, name="camera")(tokens)

        rays = patch_center_rays(K, (H, W), (ph, pw))  # (B, N, 3) fp32
        ray_emb = RayEmbedding(dim, SH_DEGREE, self.dtype, name="ray_embed")(rays)

        value, confidence = DepthModule(
            dim, num_heads, dtype=self.dtype, name="depth_module"
        )(tokens, ray_emb, (ph, pw), (H, W))

        if self.mode == "unik3d":
            # dense unit rays x euclidean distance (UniK3D/onnx_export.py:40-42)
            dense_rays = RaysModule(dim, num_heads, self.dtype,
                                    name="rays_module")(
                tokens, ray_emb, (ph, pw), (H, W)
            )
            pts_3d = dense_rays * value[..., None]
        else:
            # pinhole unprojection of metric z-depth (UniDepth V2)
            from monocular_depth_estimation_trt_tpu.ops.camera import pixel_grid

            u, v = pixel_grid(H, W)
            fx, fy = K[:, 0, 0], K[:, 1, 1]
            cx, cy = K[:, 0, 2], K[:, 1, 2]
            rx = (u[None] - cx[:, None, None]) / fx[:, None, None]
            ry = (v[None] - cy[:, None, None]) / fy[:, None, None]
            pts_3d = jnp.stack(
                [rx * value, ry * value, value], axis=-1
            )

        return {"pts_3d": pts_3d, "confidence": confidence, "intrinsics": K}
