"""NeuFlow v2: efficient optical flow (global matching + lightweight refine).

Serving contract (reference ``NeuFlow/``): frame pair (B, 288, 512, 3) raw
0-255 -> ``flow`` (B, 288, 512, 2) (``onnx_export.py:65-66``). The reference
wrapper's corr blocks are single-level r=4 at 1/16 and 1/8
(``NeuFlow/wrapper.py:70-125``), matched here.

Architecture (reconstruction of NeuFlow v2, Zhang et al. 2024 — the upstream
network is gitignored in the reference; only its corr blocks are visible in
the wrapper): a double-conv CNN backbone to 1/8 and 1/16 features (dim 128);
one bidirectional cross-attention layer at 1/16 (the paper's cross-feature
enhancement before matching); global matching by softmax-correlation
expectation; ConvGRU refinement at 1/16 (8 iters, single-level r=4 corr,
matching ``corr_block_s16``); feature-merged refinement at 1/8 (8 iters,
``corr_block_s8``); learned 8x convex upsampling. Correlation window lookups
use the separable MXU formulation (``ops/flow_sampler``).

Torch mirror: ``tests/torch_mirror_neuflow.py``; converter:
``weights/convert.py::convert_neuflow``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

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
    """conv-norm-relu x2 (the backbone's double-conv stage)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, dtype=self.dtype, name="conv1")(x)
        x = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(x)
        x = nn.GroupNorm(num_groups=8, epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        return nn.relu(x)


class Backbone(nn.Module):
    """1/8 and 1/16 feature maps (dim-wide double-conv stages)."""

    dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(64, 2, self.dtype, name="block1")(x)  # 1/2
        x = ConvBlock(96, 2, self.dtype, name="block2")(x)  # 1/4
        f8 = ConvBlock(self.dim, 2, self.dtype, name="block8")(x)  # 1/8
        f16 = ConvBlock(self.dim, 2, self.dtype, name="block16")(f8)  # 1/16
        return f8, f16


class CrossAttention(nn.Module):
    """One bidirectional cross-attention layer at 1/16 (global matching
    feature enhancement): each view's tokens attend to the other view."""

    dim: int = 128
    num_heads: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fa: jax.Array, fb: jax.Array):
        b, h, w, c = fa.shape
        n = h * w
        q_proj = nn.Dense(self.dim, dtype=self.dtype, name="q")
        k_proj = nn.Dense(self.dim, dtype=self.dtype, name="k")
        v_proj = nn.Dense(self.dim, dtype=self.dtype, name="v")
        out_proj = nn.Dense(self.dim, dtype=self.dtype, name="proj")
        norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")

        def attend(x, ctx):
            xq = q_proj(x.reshape(b, n, c))
            ck = k_proj(ctx.reshape(b, n, c))
            cv = v_proj(ctx.reshape(b, n, c))
            s = jnp.einsum("bqc,bkc->bqk", xq, ck).astype(jnp.float32)
            s = s / np.sqrt(self.dim)
            p = jax.nn.softmax(s, axis=-1).astype(cv.dtype)
            o = jnp.einsum("bqk,bkc->bqc", p, cv)
            y = x.reshape(b, n, c) + out_proj(o)
            return norm(y).reshape(b, h, w, c)

        return attend(fa, fb), attend(fb, fa)


class RefineStage(nn.Module):
    """ConvGRU refinement at one scale (single-level r=4 windowed corr —
    the wrapper's CorrBlockONNX(radius=4, levels=1))."""

    dim: int = 128
    iters: int = 8
    radius: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f1, pyr, flow):
        b, h, w, _ = f1.shape
        coords0 = coords_grid(b, h, w)
        net = jnp.tanh(
            nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                    name="init")(f1)
        )
        gru = SepConvGRU(self.dim, self.dtype, name="gru")
        enc = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="enc")
        head1 = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="head1")
        head2 = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype, name="head2")
        for _ in range(self.iters):
            corr_w = corr_lookup_separable(pyr, coords0 + flow, self.radius)
            inp = jnp.concatenate(
                [corr_w.astype(self.dtype), flow.astype(self.dtype)], axis=-1
            )
            net = gru(net, enc(inp))
            flow = flow + head2(nn.relu(head1(net))).astype(jnp.float32)
        return net, flow


class NeuFlow(nn.Module):
    """Returns flow at full input resolution (B, H, W, 2)."""

    dim: int = 128
    refine_iters_16: int = 8
    refine_iters_8: int = 8
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

        # cross-attention feature enhancement before global matching
        f16_1, f16_2 = CrossAttention(self.dim, dtype=self.dtype,
                                      name="cross_attn")(f16_1, f16_2)

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
        _, flow16 = RefineStage(self.dim, self.refine_iters_16, self.radius,
                                self.dtype, name="refine16")(f16_1, pyr16, flow16)

        # --- upsample to 1/8, merge with 1/8 features, refine there ---
        b8, h8, w8, _ = f8_1.shape
        flow8 = 2.0 * jax.image.resize(flow16, (b, h8, w8, 2), "bilinear")
        merged = nn.relu(
            nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                    name="merge8")(f8_1)
        )
        pyr8 = build_corr_pyramid(f8_1, f8_2, num_levels=1)
        net8, flow8 = RefineStage(self.dim, self.refine_iters_8, self.radius,
                                  self.dtype, name="refine8")(merged, pyr8, flow8)

        mask = 0.25 * nn.Conv(64 * 9, (1, 1), dtype=self.dtype,
                              name="mask8")(net8)
        return upsample_flow_convex(flow8, mask.astype(jnp.float32))
