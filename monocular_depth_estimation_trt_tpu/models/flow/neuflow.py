"""NeuFlow v2: efficient optical flow (global matching + lightweight refine).

Serving contract (reference ``NeuFlow/``): frame pair (B, 288, 512, 3) raw
0-255 -> ``flow`` (B, 288, 512, 2) (``onnx_export.py:65-66``). The reference
wrapper's corr blocks are single-level r=4 at 1/16 and 1/8
(``NeuFlow/wrapper.py:70-125``), matched here.

Architecture (NeuFlow v2, Zhang et al.): a light conv backbone to 1/8 and
1/16 features; global cross-view matching at 1/16 initializes flow
(softmax-correlation expectation, no argmax); RAFT-style windowed-correlation
refinement at 1/16 then 1/8 with small conv GRUs; learned 8x convex
upsampling. Implemented on the shared flow component library — correlation
window lookups use the separable MXU formulation (``ops/flow_sampler``).

Fidelity note: this follows the paper's stage structure but with a thinner
backbone/refiner than the exact upstream config, so its benchmark numbers
overstate the speedup relative to a weight-exact port — compare against the
RAFT family (3–4x) for the architecture-matched picture.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.flow.raft import (
    SepConvGRU,
    coords_grid,
    upsample_flow_convex,
)
from monocular_depth_estimation_trt_tpu.ops.flow_sampler import (
    build_corr_pyramid,
    corr_lookup_separable,
)


class ConvBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=8, dtype=self.dtype)(x)
        return nn.relu(x)


class Backbone(nn.Module):
    """1/8 and 1/16 feature maps."""

    dim: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(32, 2, self.dtype)(x)  # 1/2
        x = ConvBlock(48, 2, self.dtype)(x)  # 1/4
        f8 = ConvBlock(self.dim, 2, self.dtype)(x)  # 1/8
        f8 = ConvBlock(self.dim, 1, self.dtype)(f8)
        f16 = ConvBlock(self.dim, 2, self.dtype)(f8)  # 1/16
        f16 = ConvBlock(self.dim, 1, self.dtype)(f16)
        return f8, f16


class NeuFlow(nn.Module):
    """Returns flow at full input resolution (B, H, W, 2)."""

    dim: int = 96
    refine_iters_16: int = 4
    refine_iters_8: int = 4
    radius: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image1: jax.Array, image2: jax.Array) -> jax.Array:
        img1 = 2.0 * (image1.astype(self.dtype) / 255.0) - 1.0
        img2 = 2.0 * (image2.astype(self.dtype) / 255.0) - 1.0

        bb = Backbone(self.dim, self.dtype, name="backbone")
        both = jnp.concatenate([img1, img2], axis=0)
        f8, f16 = bb(both)
        f8_1, f8_2 = jnp.split(f8, 2, axis=0)
        f16_1, f16_2 = jnp.split(f16, 2, axis=0)

        b, h16, w16, c = f16_1.shape

        # --- global matching at 1/16: softmax-correlation expectation ---
        fa = f16_1.reshape(b, h16 * w16, c)
        fb = f16_2.reshape(b, h16 * w16, c)
        corr = jnp.einsum("bpc,bqc->bpq", fa, fb).astype(jnp.float32)
        corr = corr / jnp.sqrt(jnp.float32(c))
        prob = jax.nn.softmax(corr, axis=-1)
        grid = coords_grid(b, h16, w16).reshape(b, h16 * w16, 2)
        matched = jnp.einsum("bpq,bqc->bpc", prob, grid.astype(jnp.float32))
        flow16 = (matched - grid).reshape(b, h16, w16, 2)

        # --- refinement at 1/16 (single-level corr, r=4:
        # NeuFlow/wrapper.py:121-125) ---
        pyr16 = build_corr_pyramid(f16_1, f16_2, num_levels=1)
        coords0_16 = coords_grid(b, h16, w16)
        net16 = jnp.tanh(
            nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype, name="init16")(f16_1)
        )
        gru16 = SepConvGRU(self.dim, self.dtype, name="gru16")
        head16 = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype, name="head16")
        enc16 = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="enc16")
        for _ in range(self.refine_iters_16):
            corr_w = corr_lookup_separable(pyr16, coords0_16 + flow16, self.radius)
            inp = jnp.concatenate([corr_w.astype(self.dtype), flow16.astype(self.dtype)], axis=-1)
            inp = enc16(inp)
            net16 = gru16(net16, inp)
            flow16 = flow16 + head16(net16).astype(jnp.float32)

        # --- upsample to 1/8 and refine there ---
        b8, h8, w8, _ = f8_1.shape
        flow8 = 2.0 * jax.image.resize(flow16, (b, h8, w8, 2), "bilinear")
        pyr8 = build_corr_pyramid(f8_1, f8_2, num_levels=1)
        coords0_8 = coords_grid(b, h8, w8)
        net8 = jnp.tanh(
            nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype, name="init8")(f8_1)
        )
        gru8 = SepConvGRU(self.dim, self.dtype, name="gru8")
        head8 = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype, name="head8")
        mask_head = nn.Conv(64 * 9, (1, 1), dtype=self.dtype, name="mask8")
        enc8 = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="enc8")
        for _ in range(self.refine_iters_8):
            corr_w = corr_lookup_separable(pyr8, coords0_8 + flow8, self.radius)
            inp = jnp.concatenate([corr_w.astype(self.dtype), flow8.astype(self.dtype)], axis=-1)
            inp = enc8(inp)
            net8 = gru8(net8, inp)
            flow8 = flow8 + head8(net8).astype(jnp.float32)

        mask = 0.25 * mask_head(net8)
        return upsample_flow_convex(flow8, mask.astype(jnp.float32))
