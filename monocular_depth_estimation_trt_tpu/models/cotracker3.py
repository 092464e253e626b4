"""CoTracker3 — online grid point tracking over sliding windows.

Capability parity with reference ``later/CoTracker3/infer.py``: the online
model is initialized with ``(video_chunk, is_first_step=True, grid_size)``
and then called on chunks of ``2 * step`` frames, returning
``pred_tracks (B, T, N, 2)`` and ``pred_visibility (B, T, N, 1)``
(``infer.py:22-28``; ``cotracker.step = window // 2``).

Reconstruction (confidence: medium — the reference wraps a torch.hub model;
the layout is frozen by ``tests/torch_mirror_cotracker.py``), following the
published CoTracker design:

* stride-4 conv encoder per frame;
* per-track features sampled at the query points on the first frame;
* iterative transformer updates: multi-scale correlation between the track
  feature and a (2r+1)^2 window around the current estimate, factorized
  attention (over time per track, then over tracks per frame), then heads
  emitting coordinate / visibility / track-feature deltas;
* sliding-window online inference with the overlap seeded from the previous
  window (:class:`CoTrackerOnlineSession` in ``registry.py``).

TPU-first: the window and grid are static shapes; the 4 refinement
iterations share one set of modules (unrolled under jit); correlation
sampling reuses the zero-padded bilinear gather of ``ops/flow_sampler``
(``RAFT/wrapper.py:36-70`` semantics).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.ops.flow_sampler import (
    bilinear_sample_nhwc,
)


class TrackerEncoder(nn.Module):
    """Per-frame stride-4 feature extractor, output (B, H/4, W/4, dim)."""

    dim: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        x = nn.relu(nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                            dtype=self.dtype, name="conv1")(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype,
                            name="conv2")(x))
        x = nn.relu(nn.Conv(96, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name="conv3")(x))
        x = nn.relu(nn.Conv(96, (3, 3), padding=1, dtype=self.dtype,
                            name="conv4")(x))
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="conv5")(x)


def _window_offsets(radius: int):
    k = 2 * radius + 1
    dy = jnp.arange(k, dtype=jnp.float32) - radius
    dx = jnp.arange(k, dtype=jnp.float32) - radius
    oy, ox = jnp.meshgrid(dy, dx, indexing="ij")
    return ox.reshape(-1), oy.reshape(-1)  # (k*k,)


def corr_features(
    fmaps: jax.Array, coords: jax.Array, track_feat: jax.Array,
    levels: int = 4, radius: int = 3,
) -> jax.Array:
    """Multi-scale correlation between each track's feature and windows
    around its current position.

    fmaps (BT, h, w, C) stride-4 features; coords (BT, N, 2) feature-grid
    (x, y); track_feat (BT, N, C). Returns (BT, N, levels*(2r+1)^2) fp32.
    """
    ox, oy = _window_offsets(radius)
    outs = []
    fm = fmaps
    c = fmaps.shape[-1]
    for lvl in range(levels):
        scale = 2.0**lvl
        x = coords[..., 0:1] / scale + ox[None, None]
        y = coords[..., 1:2] / scale + oy[None, None]
        patches = bilinear_sample_nhwc(fm, x, y)  # (BT, N, K, C)
        corr = jnp.einsum(
            "bnkc,bnc->bnk", patches.astype(jnp.float32),
            track_feat.astype(jnp.float32),
        ) / jnp.sqrt(jnp.float32(c))
        outs.append(corr)
        if lvl + 1 < levels:
            fm = nn.avg_pool(fm, (2, 2), strides=(2, 2))
    return jnp.concatenate(outs, axis=-1)


class FactorizedBlock(nn.Module):
    """Pre-norm attention over time (per track), then over tracks (per
    frame), then an MLP — the CoTracker factorized transformer block."""

    dim: int
    num_heads: int = 8
    dtype: Any = jnp.bfloat16

    def _attn(self, x, prefix):
        b, n, d = x.shape
        hd = d // self.num_heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, name=f"{prefix}_qkv")(x)
        q, k, v = jnp.moveaxis(
            qkv.reshape(b, n, 3, self.num_heads, hd), 2, 0
        )
        att = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32)
        att = jax.nn.softmax(att / jnp.sqrt(jnp.float32(hd)), axis=-1)
        o = jnp.einsum("bhnm,bmhd->bnhd", att.astype(v.dtype), v)
        return nn.Dense(d, dtype=self.dtype,
                        name=f"{prefix}_proj")(o.reshape(b, n, d))

    @nn.compact
    def __call__(self, x: jax.Array):
        """x: (B, T, N, D)."""
        b, t, n, d = x.shape
        # time attention: tokens (B*N, T, d)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_time")(x)
        h = h.swapaxes(1, 2).reshape(b * n, t, d)
        h = self._attn(h, "time")
        x = x + h.reshape(b, n, t, d).swapaxes(1, 2)
        # track attention: tokens (B*T, N, d)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_track")(x)
        h = self._attn(h.reshape(b * t, n, d), "track")
        x = x + h.reshape(b, t, n, d)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_mlp")(x)
        h = nn.Dense(4 * d, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.Dense(d, dtype=self.dtype, name="mlp_fc2")(nn.gelu(h, approximate=False))
        return x + h


class CoTracker3(nn.Module):
    """One window: frames (B, T, H, W, 3) in [0, 1], queries (B, N, 2) pixel
    (x, y) on frame 0 -> dict(tracks (B, T, N, 2) pixels, visibility
    (B, T, N, 1) in [0, 1]).

    ``init_coords``/``init_vis`` (B, T, N, 2)/(B, T, N) seed the estimates
    (sliding-window continuation); ``track_feat`` (B, N, C) overrides the
    frame-0 feature sample (tracks born in an earlier window).
    """

    dim: int = 128
    d_model: int = 256
    iters: int = 4
    blocks: int = 3
    levels: int = 4
    radius: int = 3
    num_heads: int = 8
    stride: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        frames: jax.Array,
        queries: jax.Array,
        init_coords: Any = None,
        init_vis: Any = None,
        track_feat: Any = None,
    ) -> Dict[str, jax.Array]:
        b, t, H, W, _ = frames.shape
        n = queries.shape[1]
        fmaps = TrackerEncoder(self.dim, self.dtype, name="encoder")(
            frames.reshape(b * t, H, W, 3) * 2.0 - 1.0
        )  # (B*T, h, w, C)
        h, w = fmaps.shape[1:3]

        q_grid = queries / self.stride  # feature-grid coords
        if track_feat is None:
            f0 = fmaps.reshape(b, t, h, w, self.dim)[:, 0]
            track_feat = bilinear_sample_nhwc(
                f0, q_grid[..., 0], q_grid[..., 1]
            )  # (B, N, C)
        if init_coords is None:
            coords = jnp.broadcast_to(q_grid[:, None], (b, t, n, 2))
        else:
            coords = init_coords / self.stride
        vis = (jnp.zeros((b, t, n), jnp.float32) if init_vis is None
               else init_vis.astype(jnp.float32))

        # shared update modules (one set, reused across iterations)
        k2 = self.levels * (2 * self.radius + 1) ** 2
        in_proj = nn.Dense(self.d_model, dtype=self.dtype, name="in_proj")
        blocks = [
            FactorizedBlock(self.d_model, self.num_heads, self.dtype,
                            name=f"block_{i}")
            for i in range(self.blocks)
        ]
        head_coord = nn.Dense(2, dtype=jnp.float32, name="head_coord")
        head_vis = nn.Dense(1, dtype=jnp.float32, name="head_vis")
        head_feat = nn.Dense(self.dim, dtype=self.dtype, name="head_feat")

        tf_rep = jnp.repeat(track_feat, t, axis=0)  # (B*T, N, C) view
        for _ in range(self.iters):
            corr = corr_features(
                fmaps, coords.reshape(b * t, n, 2), tf_rep,
                self.levels, self.radius,
            )  # (B*T, N, k2) fp32
            rel = (coords - coords[:, :1]) / jnp.asarray(
                [w, h], jnp.float32
            )  # displacement from the query frame, normalized
            tokens = jnp.concatenate(
                [
                    corr.reshape(b, t, n, k2),
                    rel,
                    vis[..., None],
                    jnp.broadcast_to(
                        track_feat[:, None].astype(jnp.float32),
                        (b, t, n, self.dim),
                    ),
                ],
                axis=-1,
            )  # (B, T, N, k2 + 3 + dim)
            z = in_proj(tokens.astype(self.dtype))
            for blk in blocks:
                z = blk(z)
            coords = coords + head_coord(z.astype(jnp.float32))
            vis = vis + head_vis(z.astype(jnp.float32))[..., 0]
            df = head_feat(jnp.mean(z, axis=1))  # (B, N, C)
            track_feat = track_feat + df.astype(track_feat.dtype)
            tf_rep = jnp.repeat(track_feat, t, axis=0)

        return {
            "tracks": coords * self.stride,
            "visibility": nn.sigmoid(vis)[..., None],
            "track_feat": track_feat,
        }
