"""MEMFOF: memory-efficient 3-frame bidirectional optical flow.

Serving contract (reference ``MEMFOF/wrapper.py:136-293``): input frame
triplet (B, 3, H, W, 3) raw 0-255 -> bidirectional flow (B, 2, H, W, 2)
(center->previous and center->next, reference ``onnx2trt.py:140``), refined
``iters=8`` times at 1/16 resolution with 16x learned convex upsampling, plus
an optional encoder feature-map cache reused across video steps
(``wrapper.py:210-232,277-281``).

Architecture follows the wrapper's structure (SEA-RAFT-style): a context
network over the concatenated triplet, a feature network at 1/16 per frame,
two all-pairs correlation pyramids (center vs prev / center vs next), one
update GRU consuming both correlation windows and both flows, a 12-channel
flow head (2 flow + 4 info per direction), and 16x convex upsampling.
The fmap cache is an explicit input/output (carried state in video mode).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.flow.raft import (
    BasicEncoder,
    SepConvGRU,
    coords_grid,
)
from monocular_depth_estimation_trt_tpu.ops.flow_sampler import (
    build_corr_pyramid,
    corr_lookup_separable,
)


def upsample_flow_convex_16(flow: jax.Array, mask: jax.Array) -> jax.Array:
    """16x learned convex upsampling: flow (B,h,w,2), mask (B,h,w,9*256)."""
    b, h, w, _ = flow.shape
    m = mask.reshape(b, h, w, 9, 256)
    m = jax.nn.softmax(m, axis=3)
    fl = 16.0 * flow
    padded = jnp.pad(fl, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [padded[:, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)],
        axis=3,
    )
    up = jnp.einsum("bhwkq,bhwkc->bhwqc", m, patches)  # (B,h,w,256,2)
    up = up.reshape(b, h, w, 16, 16, 2).transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(b, 16 * h, 16 * w, 2)


class Down16Encoder(nn.Module):
    """Feature/context encoder to 1/16 (BasicEncoder + one extra stride)."""

    output_dim: int = 256
    norm: str = "instance"
    in_frames: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f8 = BasicEncoder(self.output_dim, self.norm, self.dtype, name="enc8")(x)
        f16 = nn.Conv(self.output_dim, (3, 3), strides=(2, 2), padding=1,
                      dtype=self.dtype, name="down")(f8)
        return f16


class MEMFOF(nn.Module):
    """Returns dict(flow (B, 2, H, W, 2), fmap_cache tuple of 3)."""

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

        # context over concatenated triplet (wrapper: cnet(cat(i0,i1,i2)))
        ctx_in = jnp.concatenate([x[:, 0], x[:, 1], x[:, 2]], axis=-1)
        cnet = Down16Encoder(2 * self.dim, "batch", dtype=self.dtype,
                             name="cnet")(ctx_in)
        net, context = jnp.split(cnet, 2, axis=-1)
        net = jnp.tanh(net)
        context = nn.relu(context)

        # feature network per frame at 1/16; per-frame cache entries may be
        # provided (video mode reuses two of three encodes per step, the
        # reference's fmap_cache pattern, MEMFOF/wrapper.py:210-232)
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

        flow_head = nn.Conv(12, (3, 3), padding=1, dtype=self.dtype,
                            name="flow_head")
        up_weight = nn.Conv(2 * 256 * 9, (3, 3), padding=1, dtype=self.dtype,
                            name="upsample_weight")
        gru = SepConvGRU(self.dim, self.dtype, name="gru")
        corr_enc = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="corr_enc")
        inp_proj = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="inp_proj")

        # init flow from context (wrapper: flow_head(net) before iterating)
        init = flow_head(net).astype(jnp.float32)
        flow21 = init[..., 0:2]
        flow23 = init[..., 6:8]

        for _ in range(self.iters):
            c21 = corr_lookup_separable(pyr21, coords0 + flow21, self.corr_radius)
            c23 = corr_lookup_separable(pyr23, coords0 + flow23, self.corr_radius)
            corr = jnp.concatenate([c21, c23], axis=-1).astype(self.dtype)
            inp = jnp.concatenate(
                [corr_enc(corr), context,
                 flow21.astype(self.dtype), flow23.astype(self.dtype)], axis=-1
            )
            inp = inp_proj(inp)
            net = gru(net, inp)
            upd = flow_head(net).astype(jnp.float32)
            flow21 = flow21 + upd[..., 0:2]
            flow23 = flow23 + upd[..., 6:8]

        w = 0.25 * up_weight(net).astype(jnp.float32)
        flow_up_21 = upsample_flow_convex_16(flow21, w[..., : 256 * 9])
        flow_up_23 = upsample_flow_convex_16(flow23, w[..., 256 * 9 :])
        flow = jnp.stack([flow_up_21, flow_up_23], axis=1)  # (B, 2, H, W, 2)
        return {"flow": flow, "fmap_cache": (f1, f2, f3)}
