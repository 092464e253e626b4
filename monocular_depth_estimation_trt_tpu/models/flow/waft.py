"""WAFT — Warping-Alone Field Transforms for optical flow.

Capability parity with reference ``later/WAFT/`` (README-only staging dir:
"2d image -> optical flow", upstream princeton-vl/WAFT, arXiv:2506.21526).
WAFT's published idea: replace RAFT's 4D correlation volume with direct
*warping* — each refinement iteration warps the second image's features by
the current flow and feeds the warped/target feature pair to a recurrent
update block, on top of a pretrained Depth-Anything ViT backbone.

Reconstruction (confidence: medium — the reference vendors no code, so the
topology is frozen by the torch mirror in ``tests/torch_mirror_waft.py``,
which defines the state-dict layout ``weights/convert.py::convert_waft``
consumes):

* backbone: DINOv2 (DA-V2's encoder) over BOTH frames in one batched pass,
  two intermediate taps concatenated;
* feature/context necks: 1x1 projection + 2x pixel-shuffle to a 1/7-grid
  128-channel map (feature: shared across frames; context: frame-1 only,
  split into GRU state ``net``/input ``inp`` RAFT-style);
* update loop (no correlation volume): warp ``f2`` by the current flow with
  the shared zero-pad bilinear sampler, motion input =
  ``[f1, warped, f1*warped, flow]`` -> 2-conv warp encoder -> SepConvGRU ->
  delta-flow head; convex-upsampling mask head on the final iteration;
* learned convex 7x upsampling straight to input resolution.

TPU-first design: the iteration body is an ``nn.scan`` (ONE compiled step,
mask carried — not stacked), warping is the four-gather bilinear formulation
that lowers to vectorized gathers (``ops/flow_sampler.py``), and the
elementwise "warp correlation" ``f1 * warped`` replaces the gather-heavy
cost-volume lookup entirely — the op mix is convs + one sampler per step.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.config import IMAGENET_MEAN, IMAGENET_STD
from monocular_depth_estimation_trt_tpu.models.dpt import PixelShuffleUpsample
from monocular_depth_estimation_trt_tpu.models.flow.raft import (
    SepConvGRU,
    coords_grid,
)
from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS, DinoViT
from monocular_depth_estimation_trt_tpu.ops.flow_sampler import (
    bilinear_sample_nhwc,
)

UP = 7  # flow-grid stride: ViT patch 14 / pixel-shuffle 2


def upsample_flow_convex_k(flow: jax.Array, mask: jax.Array, k: int) -> jax.Array:
    """Learned convex kx upsampling (RAFT's ``upsample_flow`` generalized).
    flow (B,h,w,2), mask (B,h,w,9*k*k) -> (B,k*h,k*w,2)."""
    b, h, w, _ = flow.shape
    m = mask.reshape(b, h, w, 9, k * k)
    m = jax.nn.softmax(m, axis=3)
    fl = float(k) * flow
    padded = jnp.pad(fl, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [padded[:, dy: dy + h, dx: dx + w, :] for dy in range(3) for dx in range(3)],
        axis=3,
    )  # (B,h,w,9,2)
    up = jnp.einsum("bhwkq,bhwkc->bhwqc", m, patches)  # (B,h,w,k*k,2)
    up = up.reshape(b, h, w, k, k, 2).transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(b, k * h, k * w, 2)


class WarpUpdateBlock(nn.Module):
    """One warp-refine update: motion encoding from the warped feature pair
    (no cost volume) -> SepConvGRU -> delta flow. The convex-upsampling mask
    head lives OUTSIDE the scan (on the final hidden state) — the torch
    mirror computes it every iteration but only the last one is consumed, so
    hoisting it drops (iters-1) dead 441-channel head evaluations with
    identical output."""

    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, f1, warped, flow):
        cost = f1 * warped  # elementwise warp correlation
        x = jnp.concatenate([f1, warped, cost, flow], axis=-1)
        m = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=self.dtype,
                            name="enc_conv1")(x))
        m = nn.relu(nn.Conv(126, (3, 3), padding=1, dtype=self.dtype,
                            name="enc_conv2")(m))
        motion = jnp.concatenate([m, flow], axis=-1)  # 128
        net = SepConvGRU(self.hidden, self.dtype, name="gru")(
            net, jnp.concatenate([inp, motion], axis=-1)
        )
        d = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                            name="flow_head_conv1")(net))
        delta = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype,
                        name="flow_head_conv2")(d)
        return net, delta


class _WAFTStep(nn.Module):
    """Scanned iteration: warp f2 by the current flow + update.
    carry = (net, flow); consts = (inp, f1, f2, gx, gy)."""

    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, consts):
        net, flow = carry
        inp, f1, f2, gx, gy = consts
        warped = bilinear_sample_nhwc(
            f2, gx + flow[..., 0], gy + flow[..., 1]
        ).astype(self.dtype)
        net, delta = WarpUpdateBlock(self.hidden, self.dtype,
                                     name="block")(net, inp, f1, warped, flow)
        return (net, flow + delta), None


class WAFT(nn.Module):
    """Input: two raw 0-255 images (B, H, W, 3); H, W multiples of 14.
    Returns (flow_low (B, H/7, W/7, 2), flow_up (B, H, W, 2))."""

    iters: int = 8
    hidden: int = 128
    encoder: str = "vits"
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    vit_config: Any = None  # test-size override

    @nn.compact
    def __call__(self, image1: jax.Array, image2: jax.Array):
        cfg = self.vit_config or VIT_CONFIGS[self.encoder]
        b, H, W, _ = image1.shape
        ph, pw = H // cfg.patch_size, W // cfg.patch_size
        h, w = 2 * ph, 2 * pw  # 1/7 flow grid

        x = jnp.concatenate([image1, image2], axis=0).astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

        mid = cfg.depth // 2 - 1
        taps = DinoViT(cfg, out_indices=(mid, cfg.depth - 1), dtype=self.dtype,
                       attn_impl=self.attn_impl, name="pretrained")(x)
        tok = jnp.concatenate([t[0] for t in taps], axis=-1)  # (2B, N, 2D)
        grid = tok.reshape(2 * b, ph, pw, tok.shape[-1]).astype(self.dtype)

        feat = nn.Conv(256, (1, 1), dtype=self.dtype, name="feat_proj")(grid)
        feat = PixelShuffleUpsample(128, 2, self.dtype, name="feat_up")(feat)
        f1, f2 = feat[:b], feat[b:]

        ctx = nn.Conv(256, (1, 1), dtype=self.dtype, name="ctx_proj")(grid[:b])
        ctx = PixelShuffleUpsample(256, 2, self.dtype, name="ctx_up")(ctx)
        net = nn.tanh(ctx[..., : self.hidden])
        inp = nn.relu(ctx[..., self.hidden:])

        g = coords_grid(b, h, w, jnp.float32)
        gx, gy = g[..., 0], g[..., 1]
        flow0 = jnp.zeros((b, h, w, 2), jnp.float32)

        step = nn.scan(
            _WAFTStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            out_axes=0,
            length=self.iters,
        )(self.hidden, self.dtype, name="step")
        (net, flow), _ = step((net, flow0), (inp, f1, f2, gx, gy))

        # convex-mask head ONCE on the final hidden state (== the torch
        # mirror's last-iteration mask)
        mk = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                             name="mask_conv0")(net))
        mask = 0.25 * nn.Conv(UP * UP * 9, (1, 1), dtype=self.dtype,
                              name="mask_conv2")(mk)

        flow_up = upsample_flow_convex_k(
            flow.astype(jnp.float32), mask.astype(jnp.float32), UP
        )
        return flow, flow_up
