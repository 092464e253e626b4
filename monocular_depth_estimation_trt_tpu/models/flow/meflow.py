"""MeFlow: memory-efficient optical flow via alternating 1D correlations.

Serving contract (reference ``MeFlow/``): frame pair (B, 288, 512, 3) raw
0-255 -> ``flow_low`` (1/8) and ``flow_up`` (full res), 20 refinement
iterations (``onnx_export.py:53-54``).

Structure mirrors the reference wrapper's forward exactly
(``MeFlow/wrapper.py:238-305`` — MeFlow is RAFT-structured):

* ``fnet``/``cnet``: RAFT BasicEncoders (instance / batch norm);
* 1D window attention on fmap2 (``Attention1DOnnx``, wrapper.py:11-57):
  query/key 1x1 convs + a (2r+1) window softmax along one axis; applied
  per scale AFTER avg-pooling (wrapper.py:249-259);
* cross-direction pairing: the HORIZONTAL correlation samples the
  VERTICALLY-attended fmap2 and vice versa (wrapper.py:261-262);
* per iteration BOTH 17-tap 1D profiles (main 2r+1 taps + 2 taps from each
  end of two pooled scales, wrapper.py:219-228) are concatenated (34ch) and
  fed to ONE RAFT update block (wrapper.py:279-290);
* learned 8x convex upsampling of the final flow.

TPU-first formulation: the per-pixel 1D correlation taps
``<f1[p], f2(x_p+d, y_p)>`` are exactly 1-axis bilinear samples of the
all-pairs correlation matrices (full-res and the two pooled scales), so we
build those three matrices with MXU matmuls once and sample with the
separable hat-weight contraction (one matmul per axis — no gathers, no
grouped-conv one-hot tricks). The window attention's key/value windows are
static shifts (pad + slice stacking).

Torch mirror: ``tests/torch_mirror_meflow.py`` (implements the wrapper's
gather-based sampling independently); converter:
``weights/convert.py::convert_meflow``.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.flow.raft import (
    BasicEncoder,
    BasicUpdateBlock,
    coords_grid,
    upsample_flow_convex,
)
from monocular_depth_estimation_trt_tpu.ops.flow_sampler import avg_pool2x2


def _corr_matrix(f1: jax.Array, f2: jax.Array) -> jax.Array:
    """(B,H,W,C) x (B,h2,w2,C) -> (B*H*W, h2, w2) scaled all-pairs corr."""
    b, h, w, c = f1.shape
    _, h2, w2, _ = f2.shape
    corr = jnp.einsum(
        "bpc,bqc->bpq",
        f1.reshape(b, h * w, c).astype(jnp.float32),
        f2.reshape(b, h2 * w2, c).astype(jnp.float32),
    ) / jnp.sqrt(jnp.float32(c))
    return corr.reshape(b * h * w, h2, w2)


def _hat(grid_size: int, pos: jax.Array) -> jax.Array:
    """pos (n, T) -> hat weights (n, T, grid_size), zero outside."""
    g = jnp.arange(grid_size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(g[None, None, :] - pos[:, :, None]))


def corr_1d_lookup(
    corr: jax.Array, coords: jax.Array, offsets: jax.Array, scale: float,
    horizontal: bool,
) -> jax.Array:
    """Sample 1D taps from a correlation slab set.

    corr (n, h2, w2); coords (B,H,W,2) level-0 pixel coords; offsets (T,)
    applied along x (horizontal) or y AFTER the coordinate downscale
    (reference ``x_base / 2 + delta``, wrapper.py:186-191); returns
    (B, H, W, T)."""
    b, h, w, _ = coords.shape
    n = b * h * w
    c = coords.reshape(n, 2).astype(jnp.float32) / scale
    _, h2, w2 = corr.shape
    if horizontal:
        tx = c[:, 0:1] + offsets[None, :]
        ty = c[:, 1:2]
    else:
        tx = c[:, 0:1]
        ty = c[:, 1:2] + offsets[None, :]
    Ry = _hat(h2, ty)  # (n, Ty, h2)
    Rx = _hat(w2, tx)  # (n, Tx, w2)
    tmp = jnp.einsum("nsh,nhw->nsw", Ry, corr)  # (n, Ty, w2)
    out = jnp.einsum("ntw,nsw->nst", Rx, tmp)  # (n, Ty, Tx)
    t = offsets.shape[0]
    # one of Ty/Tx is 1
    return out.reshape(b, h, w, t)


def meflow_corr(
    pyr: Tuple[jax.Array, jax.Array, jax.Array],
    coords: jax.Array,
    radius: int,
    horizontal: bool,
) -> jax.Array:
    """17-tap alternating 1D correlation profile
    (reference ``MeFlow/wrapper.py:219-228`` tap layout:
    [d2 first 2, d1 first 2, main 2r+1, d1 last 2, d2 last 2])."""
    c0, c1, c2 = pyr
    d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    ends = jnp.concatenate([d[0:2], d[-2:]])  # 4 taps
    main = corr_1d_lookup(c0, coords, d, 1.0, horizontal)
    d1 = corr_1d_lookup(c1, coords, ends, 2.0, horizontal)
    d2 = corr_1d_lookup(c2, coords, ends, 4.0, horizontal)
    return jnp.concatenate(
        [d2[..., 0:2], d1[..., 0:2], main, d1[..., 2:4], d2[..., 2:4]], axis=-1
    )


class Window1DAttention(nn.Module):
    """1D window self-attention (reference ``Attention1DOnnx``): queries
    attend to a (2r+1) window of keys along one axis, values are the raw
    feature windows; windows are static shifts (pad + slice), no gathers."""

    channels: int
    horizontal: bool = True
    r: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature: jax.Array) -> jax.Array:
        b, h, w, c = feature.shape
        q = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="query")(feature)
        k = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="key")(feature)

        t = 2 * self.r + 1
        if self.horizontal:
            pad = ((0, 0), (0, 0), (self.r, self.r), (0, 0))
            k_pad = jnp.pad(k, pad)
            v_pad = jnp.pad(feature, pad)
            k_win = jnp.stack([k_pad[:, :, i : i + w] for i in range(t)], axis=3)
            v_win = jnp.stack([v_pad[:, :, i : i + w] for i in range(t)], axis=3)
        else:
            pad = ((0, 0), (self.r, self.r), (0, 0), (0, 0))
            k_pad = jnp.pad(k, pad)
            v_pad = jnp.pad(feature, pad)
            k_win = jnp.stack([k_pad[:, i : i + h] for i in range(t)], axis=3)
            v_win = jnp.stack([v_pad[:, i : i + h] for i in range(t)], axis=3)
        # (B, H, W, T, C)
        scores = jnp.einsum("bhwc,bhwtc->bhwt", q, k_win).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(self.channels))
        p = jax.nn.softmax(scores, axis=-1).astype(feature.dtype)
        return jnp.einsum("bhwt,bhwtc->bhwc", p, v_win)


class _MeFlowStep(nn.Module):
    """One scanned refinement iteration: both 1D correlation profiles ->
    ONE RAFT update block (the wrapper's loop body, wrapper.py:279-290).

    carry = (net, flow, mask); consts = (pyr_h, pyr_v, inp, coords0).
    """

    dim: int = 128
    radius: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, consts):
        net, flow, _ = carry
        pyr_h, pyr_v, inp, coords0 = consts
        corr_h = meflow_corr(pyr_h, coords0 + flow, self.radius, True)
        corr_v = meflow_corr(pyr_v, coords0 + flow, self.radius, False)
        corr = jnp.concatenate([corr_h, corr_v], axis=-1).astype(self.dtype)
        net, mask, delta = BasicUpdateBlock(self.dim, self.dtype,
                                            name="update_block")(
            net, inp, corr, flow.astype(self.dtype)
        )
        return (net, flow + delta.astype(jnp.float32), mask), None


class MeFlow(nn.Module):
    """Returns (flow_low (B,H/8,W/8,2), flow_up (B,H,W,2)).

    ``use_scan`` trades throughput for compile time: the scanned loop builds
    in seconds; the unrolled loop builds once (persistent cache) and runs
    faster (XLA specializes and pipelines across iterations) — like the
    reference's unrolled ONNX graph (TRT build: 197 min, MeFlow/README.md:84).
    """

    iters: int = 20
    dim: int = 128
    radius: int = 4
    use_scan: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image1: jax.Array, image2: jax.Array):
        img1 = 2.0 * (image1.astype(self.dtype) / 255.0) - 1.0
        img2 = 2.0 * (image2.astype(self.dtype) / 255.0) - 1.0

        fnet = BasicEncoder(128, "instance", self.dtype, name="fnet")
        both = jnp.concatenate([img1, img2], axis=0)
        fm = fnet(both)
        f1, f2 = jnp.split(fm, 2, axis=0)

        # 1D attention per scale AFTER pooling (wrapper.py:249-259); the same
        # attn modules are shared across scales
        attn_h = Window1DAttention(128, True, self.radius, self.dtype,
                                   name="attn_h")
        attn_v = Window1DAttention(128, False, self.radius, self.dtype,
                                   name="attn_v")
        f2_d1 = avg_pool2x2(f2)
        f2_d2 = avg_pool2x2(f2_d1)

        # cross-direction pairing (wrapper.py:261-262): horizontal corr reads
        # the vertically-attended features, vertical corr the horizontal ones
        pyr_h = (
            _corr_matrix(f1, attn_v(f2)),
            _corr_matrix(f1, attn_v(f2_d1)),
            _corr_matrix(f1, attn_v(f2_d2)),
        )
        pyr_v = (
            _corr_matrix(f1, attn_h(f2)),
            _corr_matrix(f1, attn_h(f2_d1)),
            _corr_matrix(f1, attn_h(f2_d2)),
        )

        cnet = BasicEncoder(2 * self.dim, "batch", self.dtype, name="cnet")(img1)
        net, inp = jnp.split(cnet, 2, axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)

        b, h8, w8, _ = f1.shape
        coords0 = coords_grid(b, h8, w8)
        flow = jnp.zeros_like(coords0)
        mask0 = jnp.zeros((b, h8, w8, 64 * 9), self.dtype)

        if self.use_scan:
            scan_step = nn.scan(
                _MeFlowStep,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=nn.broadcast,
                out_axes=0,
                length=self.iters,
            )(self.dim, self.radius, self.dtype, name="step")
            (net, flow, mask), _ = scan_step(
                (net, flow, mask0), (pyr_h, pyr_v, inp, coords0)
            )
        else:
            step = _MeFlowStep(self.dim, self.radius, self.dtype, name="step")
            mask = mask0
            for _ in range(self.iters):
                (net, flow, mask), _ = step(
                    (net, flow, mask), (pyr_h, pyr_v, inp, coords0)
                )

        flow_up = upsample_flow_convex(flow, mask.astype(jnp.float32))
        return flow, flow_up
