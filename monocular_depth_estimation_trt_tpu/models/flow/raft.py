"""RAFT optical flow (TPU-native).

Capability parity with reference ``RAFT/`` — the ONNX wrapper there
(``RAFT/wrapper.py:128-191``) is the serving spec: raw 0-255 frame pair in,
normalization in-graph, 20 recurrent refinement iterations, outputs
``flow_low`` (H/8, W/8, 2) and ``flow_up`` (H, W, 2).

TPU-first differences from the reference's CUDA/ONNX formulation:
* the 20 GRU iterations are a ``jax.lax.scan`` (compiled once), not 20
  unrolled graph copies (the reference unrolls into ONNX,
  ``RAFT/onnx_export.py:47-58``);
* the all-pairs correlation volume is one big MXU matmul; window lookups are
  vectorized bilinear gathers (``ops/flow_sampler.py``, same math as the
  reference's gather rewrite ``RAFT/wrapper.py:11-70``);
* BatchNorm is folded to affine scale/bias at conversion time (inference
  standard), InstanceNorm is computed exactly (no params, matching
  ``nn.InstanceNorm2d(affine=False)``).

Architecture is standard RAFT (Teed & Deng, ECCV 2020): BasicEncoder feature
and context networks at 1/8 resolution, 4-level correlation pyramid r=4,
BasicMotionEncoder + SepConvGRU update block, learned convex upsampling.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.ops.flow_sampler import (
    build_corr_pyramid,
    corr_lookup_separable as corr_lookup,
)


class InstanceNorm(nn.Module):
    """nn.InstanceNorm2d(affine=False): per-sample per-channel normalize."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class FoldedBatchNorm(nn.Module):
    """Inference BatchNorm folded to scale/bias (converted from running
    stats: scale = gamma/sqrt(var+eps), bias = beta - mean*scale)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _norm(kind: str, features: int, name: str):
    if kind == "instance":
        return InstanceNorm(name=name)
    if kind == "batch":
        return FoldedBatchNorm(features, name=name)
    return lambda x: x


class ResidualBlock(nn.Module):
    planes: int
    norm: str
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, dtype=self.dtype, name="conv1")(x)
        y = _norm(self.norm, self.planes, "norm1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y)
        y = _norm(self.norm, self.planes, "norm2")(y)
        y = nn.relu(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        dtype=self.dtype, name="downsample")(x)
            x = _norm(self.norm, self.planes, "norm3")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int = 256
    norm: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, dtype=self.dtype,
                    name="conv1")(x)
        x = _norm(self.norm, 64, "norm1")(x)
        x = nn.relu(x)
        for i, (planes, stride) in enumerate([(64, 1), (96, 2), (128, 2)]):
            x = ResidualBlock(planes, self.norm, stride, self.dtype,
                              name=f"layer{i + 1}_0")(x)
            x = ResidualBlock(planes, self.norm, 1, self.dtype,
                              name=f"layer{i + 1}_1")(x)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv2")(x)


class BasicMotionEncoder(nn.Module):
    corr_planes: int = 4 * 81
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="convc1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=self.dtype, name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=self.dtype, name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype, name="convf2")(f))
        out = nn.relu(
            nn.Conv(126, (3, 3), padding=1, dtype=self.dtype, name="conv")(
                jnp.concatenate([c, f], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)  # 128


class SepConvGRU(nn.Module):
    """RAFT's separable-kernel ConvGRU.

    TPU layout note: the z and r gates read the SAME input, so they run as
    ONE conv with ``2*hidden`` output channels and a split — identical math
    to upstream's two convs (the converter concatenates the torch ``convz*``
    / ``convr*`` kernels along the output axis), but a single wider MXU
    matmul per direction instead of two half-width ones, and 2 fewer ops in
    the 20x-iterated scan body."""

    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        for tag, ks, pad in [("1", (1, 5), (0, 2)), ("2", (5, 1), (2, 0))]:
            hx = jnp.concatenate([h, x], axis=-1)
            pad2 = ((pad[0], pad[0]), (pad[1], pad[1]))
            zr = nn.Conv(2 * self.hidden, ks, padding=pad2, dtype=self.dtype,
                         name=f"convzr{tag}")(hx)
            z = nn.sigmoid(zr[..., : self.hidden])
            r = nn.sigmoid(zr[..., self.hidden :])
            q = nn.tanh(
                nn.Conv(self.hidden, ks, padding=pad2, dtype=self.dtype,
                        name=f"convq{tag}")(jnp.concatenate([r * h, x], axis=-1))
            )
            h = (1.0 - z) * h + z * q
        return h


class BasicUpdateBlock(nn.Module):
    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(dtype=self.dtype, name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden, self.dtype, name="gru")(net, x)
        # flow head
        d = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="flow_head_conv1")(net))
        delta = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                        name="flow_head_conv2")(d)
        # convex-upsampling mask head (scaled 0.25 as in RAFT)
        m = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="mask_conv0")(net))
        mask = 0.25 * nn.Conv(64 * 9, (1, 1), dtype=self.dtype, name="mask_conv2")(m)
        return net, mask, delta


class _RefinementStep(nn.Module):
    """One scanned refinement iteration: corr lookup + update block.

    carry = (net, coords1, mask); broadcast consts = (pyramid, inp, coords0).
    The convex-upsampling mask rides in the carry (only the final iteration's
    mask is consumed) so the compiled program keeps ONE (B,h,w,576) tensor
    instead of materializing an iters-stacked copy it would discard.
    """

    hidden: int = 128
    radius: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, consts):
        net, coords1, _ = carry
        pyramid, inp, coords0 = consts
        corr = corr_lookup(pyramid, coords1, self.radius).astype(self.dtype)
        flow = coords1 - coords0
        net, mask, delta = BasicUpdateBlock(self.hidden, self.dtype,
                                            name="block")(net, inp, corr, flow)
        coords1 = coords1 + delta
        return (net, coords1, mask), None


def coords_grid(b: int, h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """(B, h, w, 2) pixel coordinates (x, y)."""
    x = jnp.broadcast_to(jnp.arange(w, dtype=dtype)[None, :], (h, w))
    y = jnp.broadcast_to(jnp.arange(h, dtype=dtype)[:, None], (h, w))
    g = jnp.stack([x, y], axis=-1)
    return jnp.broadcast_to(g[None], (b, h, w, 2))


def upsample_flow_convex(flow: jax.Array, mask: jax.Array) -> jax.Array:
    """Learned convex 8x upsampling (RAFT ``upsample_flow``).
    flow (B,h,w,2), mask (B,h,w,576) -> (B,8h,8w,2)."""
    b, h, w, _ = flow.shape
    m = mask.reshape(b, h, w, 9, 64)
    m = jax.nn.softmax(m, axis=3)
    fl = 8.0 * flow
    padded = jnp.pad(fl, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [padded[:, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)],
        axis=3,
    )  # (B,h,w,9,2)
    up = jnp.einsum("bhwkq,bhwkc->bhwqc", m, patches)  # (B,h,w,64,2)
    up = up.reshape(b, h, w, 8, 8, 2).transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(b, 8 * h, 8 * w, 2)


class RAFT(nn.Module):
    """Input: two raw 0-255 images (B, H, W, 3); H, W multiples of 8.
    Returns (flow_low (B, H/8, W/8, 2), flow_up (B, H, W, 2))."""

    iters: int = 20
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image1: jax.Array, image2: jax.Array):
        # in-graph normalization (reference RAFT/wrapper.py:135-136)
        img1 = 2.0 * (image1.astype(self.dtype) / 255.0) - 1.0
        img2 = 2.0 * (image2.astype(self.dtype) / 255.0) - 1.0

        fnet = BasicEncoder(256, "instance", self.dtype, name="fnet")
        both = jnp.concatenate([img1, img2], axis=0)
        fmaps = fnet(both)
        fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)

        pyramid = build_corr_pyramid(
            fmap1.astype(jnp.float32), fmap2.astype(jnp.float32), self.corr_levels
        )

        cnet = BasicEncoder(self.hidden_dim + self.context_dim, "batch", self.dtype,
                            name="cnet")(img1)
        net0, inp = jnp.split(cnet, [self.hidden_dim], axis=-1)
        net0 = jnp.tanh(net0)
        inp = nn.relu(inp)

        b, h8, w8, _ = fmap1.shape
        coords0 = coords_grid(b, h8, w8, self.dtype)

        scan_update = nn.scan(
            _RefinementStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            out_axes=0,
            length=self.iters,
        )(self.hidden_dim, self.corr_radius, self.dtype, name="update_block")

        mask0 = jnp.zeros((b, h8, w8, 64 * 9), self.dtype)
        (net, coords1, mask), _ = scan_update(
            (net0, coords0, mask0), (pyramid, inp, coords0)
        )

        flow_low = coords1 - coords0
        flow_up = upsample_flow_convex(flow_low, mask)
        return flow_low, flow_up
