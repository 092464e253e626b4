"""MEMFOF: memory-efficient 3-frame bidirectional optical flow.

Serving contract (reference ``MEMFOF/wrapper.py:136-293``): input frame
triplet (B, 3, H, W, 3) raw 0-255 -> bidirectional flow (B, 2, H, W, 2)
(center->previous and center->next, reference ``onnx2trt.py:140``), refined
``iters=8`` times at 1/16 resolution with 16x learned convex upsampling, plus
an optional encoder feature-map cache reused across video steps
(``wrapper.py:210-232,277-281``).

Architecture mirrors the wrapper's forward exactly (SEA-RAFT-at-1/16 with
GMA attention — MEMFOF is built on SEA-RAFT-L):

* ``cnet`` over the channel-concatenated triplet (9ch) -> ``init_conv`` ->
  split (net, context), NO activations (``wrapper.py:185-187``);
* ``att``: single-head GMA attention map computed once from the context
  (``wrapper.py:188``);
* init prediction straight from ``flow_head(net)`` — 12 channels =
  [flow21(2), info21(4), flow23(2), info23(4)] (``wrapper.py:191-198``);
* ``fnet`` per frame at 1/16 with the cross-step ``fmap_cache``
  (``wrapper.py:210-232``); two all-pairs correlation pyramids
  (center->prev / center->next, levels=4 radius=4, ``wrapper.py:227-232``);
* per iteration: both correlation windows + both flows ->
  ``update_block(net, context, corr, flow, attention)`` (motion encoder +
  GMA aggregation + SepConvGRU), then ``flow_head`` deltas and
  ``0.25 * upsample_weight(net)`` (``wrapper.py:234-261``);
* final: two 16x convex upsamplings, one per direction, from the split
  weight halves (``wrapper.py:263-269``).

Torch mirror: ``tests/torch_mirror_memfof.py``; converter:
``weights/convert.py::convert_memfof``. TPU notes: correlation lookups are
the separable matmul form (``ops/flow_sampler.py``); the GMA attention at
1/16 (N=576 @288x512) is one small MXU matmul.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from monocular_depth_estimation_trt_tpu.models.flow.raft import (
    BasicEncoder,
    SepConvGRU,
    coords_grid,
)
from monocular_depth_estimation_trt_tpu.ops.flow_sampler import (
    build_corr_pyramid,
    corr_lookup_separable,
)


def upsample_convex_16(x: jax.Array, mask: jax.Array,
                       scale_values: float = 16.0) -> jax.Array:
    """16x learned convex upsampling: x (B,h,w,C), mask (B,h,w,9*256)."""
    b, h, w, c = x.shape
    m = mask.reshape(b, h, w, 9, 256)
    m = jax.nn.softmax(m, axis=3)
    fl = scale_values * x
    padded = jnp.pad(fl, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [padded[:, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)],
        axis=3,
    )
    up = jnp.einsum("bhwkq,bhwkc->bhwqc", m, patches)  # (B,h,w,256,C)
    up = up.reshape(b, h, w, 16, 16, c).transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(b, 16 * h, 16 * w, c)


class Down16Encoder(nn.Module):
    """Feature/context encoder to 1/16 (BasicEncoder trunk + one extra
    stride-2 conv)."""

    output_dim: int = 256
    norm: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f8 = BasicEncoder(self.output_dim, self.norm, self.dtype, name="enc8")(x)
        f16 = nn.Conv(self.output_dim, (3, 3), strides=(2, 2), padding=1,
                      dtype=self.dtype, name="down")(f8)
        return f16


class GMAAttention(nn.Module):
    """Single-head GMA attention map from context features
    (the wrapper's ``self.att(context)``)."""

    dim_head: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, context: jax.Array) -> jax.Array:
        b, h, w, _ = context.shape
        q = nn.Dense(self.dim_head, use_bias=False, dtype=self.dtype,
                     name="to_q")(context).reshape(b, h * w, self.dim_head)
        k = nn.Dense(self.dim_head, use_bias=False, dtype=self.dtype,
                     name="to_k")(context).reshape(b, h * w, self.dim_head)
        s = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32)
        s = s / np.sqrt(self.dim_head)
        return jax.nn.softmax(s, axis=-1)  # (B, N, N) fp32


class MotionEncoder(nn.Module):
    """SEA-RAFT motion encoder over (corr, bidirectional flow)."""

    cor_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow: jax.Array, corr: jax.Array) -> jax.Array:
        c = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="convc1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=self.dtype,
                            name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=self.dtype,
                            name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype,
                            name="convf2")(f))
        out = nn.relu(
            nn.Conv(128 - 4, (3, 3), padding=1, dtype=self.dtype, name="conv")(
                jnp.concatenate([c, f], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)  # (B,h,w,128)


class MEMFOFUpdateBlock(nn.Module):
    """update_block(net, context, corr, flow, attention) — motion encoder,
    GMA global aggregation, SepConvGRU."""

    dim: int = 128
    cor_planes: int = 2 * 4 * 81
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, context, corr, flow, attention):
        motion = MotionEncoder(self.cor_planes, self.dtype, name="encoder")(
            flow, corr
        )
        b, h, w, c = motion.shape
        v = nn.Dense(c, use_bias=False, dtype=self.dtype,
                     name="aggregator_to_v")(motion).reshape(b, h * w, c)
        glob = jnp.einsum(
            "bqk,bkc->bqc", attention.astype(v.dtype), v
        ).reshape(b, h, w, c)
        gamma = self.param("aggregator_gamma", nn.initializers.zeros, (1,))
        motion_global = motion + gamma.astype(motion.dtype) * glob
        x = jnp.concatenate([context, motion, motion_global], axis=-1)
        return SepConvGRU(self.dim, self.dtype, name="gru")(net, x)


class MEMFOF(nn.Module):
    """Returns dict(flow (B, 2, H, W, 2), info (B, 2, H, W, 4),
    fmap_cache tuple of 3)."""

    iters: int = 8
    dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jax.Array,  # (B, 3, H, W, 3) raw 0-255
        fmap_cache: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
    ):
        b, three, H, W, _ = images.shape
        x = 2.0 * (images.astype(self.dtype) / 255.0) - 1.0

        # context over concatenated triplet (wrapper.py:185-187; no act)
        ctx_in = jnp.concatenate([x[:, 0], x[:, 1], x[:, 2]], axis=-1)
        cnet = Down16Encoder(256, "instance", dtype=self.dtype, name="cnet")(ctx_in)
        cnet = nn.Conv(2 * self.dim, (3, 3), padding=1, dtype=self.dtype,
                       name="init_conv")(cnet)
        net, context = jnp.split(cnet, [self.dim], axis=-1)
        attention = GMAAttention(self.dim, self.dtype, name="att")(context)

        flow_head_c1 = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                               name="flow_head_conv1")
        flow_head_c2 = nn.Conv(12, (3, 3), padding=1, dtype=self.dtype,
                               name="flow_head_conv2")
        upw_c1 = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                         name="upsample_weight_conv1")
        upw_c2 = nn.Conv(2 * 256 * 9, (1, 1), dtype=self.dtype,
                         name="upsample_weight_conv2")

        def flow_head(n):
            return flow_head_c2(nn.relu(flow_head_c1(n))).astype(jnp.float32)

        def upsample_weight(n):
            return 0.25 * upw_c2(nn.relu(upw_c1(n))).astype(jnp.float32)

        # init prediction straight from the context net (wrapper.py:191-198)
        fu = flow_head(net)
        flow21, info21 = fu[..., 0:2], fu[..., 2:6]
        flow23, info23 = fu[..., 6:8], fu[..., 8:12]

        # feature network per frame at 1/16; per-frame cache entries may be
        # provided (video mode reuses two of three encodes per step,
        # wrapper.py:210-232)
        fnet = Down16Encoder(256, "instance", dtype=self.dtype, name="fnet")
        cache = list(fmap_cache) if fmap_cache is not None else [None, None, None]
        missing = [i for i in range(3) if cache[i] is None]
        if missing:
            frames = jnp.stack([x[:, i] for i in missing], axis=1)
            fm = fnet(frames.reshape(b * len(missing), H, W, 3))
            fm = fm.reshape(b, len(missing), *fm.shape[1:])
            for j, i in enumerate(missing):
                cache[i] = fm[:, j]
        f1, f2, f3 = cache

        pyr21 = build_corr_pyramid(f2.astype(jnp.float32), f1.astype(jnp.float32),
                                   self.corr_levels)
        pyr23 = build_corr_pyramid(f2.astype(jnp.float32), f3.astype(jnp.float32),
                                   self.corr_levels)

        h16, w16 = f2.shape[1], f2.shape[2]
        coords0 = coords_grid(b, h16, w16)

        update_block = MEMFOFUpdateBlock(
            self.dim, 2 * self.corr_levels * (2 * self.corr_radius + 1) ** 2,
            self.dtype, name="update_block",
        )

        for _ in range(self.iters):
            c21 = corr_lookup_separable(pyr21, coords0 + flow21, self.corr_radius)
            c23 = corr_lookup_separable(pyr23, coords0 + flow23, self.corr_radius)
            corr = jnp.concatenate([c21, c23], axis=-1).astype(self.dtype)
            flow16 = jnp.concatenate(
                [flow21, flow23], axis=-1
            ).astype(self.dtype)
            net = update_block(net, context, corr, flow16, attention)
            fu = flow_head(net)
            flow21 = flow21 + fu[..., 0:2]
            info21 = fu[..., 2:6]
            flow23 = flow23 + fu[..., 6:8]
            info23 = fu[..., 8:12]

        w16x = upsample_weight(net)
        flow_up_21 = upsample_convex_16(flow21, w16x[..., : 256 * 9])
        flow_up_23 = upsample_convex_16(flow23, w16x[..., 256 * 9 :])
        info_up_21 = upsample_convex_16(info21, w16x[..., : 256 * 9], 1.0)
        info_up_23 = upsample_convex_16(info23, w16x[..., 256 * 9 :], 1.0)
        return {
            "flow": jnp.stack([flow_up_21, flow_up_23], axis=1),
            "info": jnp.stack([info_up_21, info_up_23], axis=1),
            "fmap_cache": (f1, f2, f3),
        }
