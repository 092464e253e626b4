"""Video Depth Anything — temporally consistent video depth.

Capability parity with reference ``later/Video_Depth_Anything/`` (README-only
staging dir: "video -> video depth", run via ``run.py --encoder vitl`` on
32-frame windows; the reference never wired it into TRT). Architecture per
the published model (arXiv:2501.12375, cited in the reference README): a
Depth-Anything-V2 DINOv2 encoder applied per frame + a spatiotemporal DPT
head in which temporal attention layers are inserted after each fusion
stage, trained on 32-frame windows; super-long videos run as overlapping
windows stitched with a per-window scale/shift alignment.

Reconstruction (confidence: medium — the upstream repo is not vendored by
the reference, so the exact topology is frozen by the torch mirror in
``tests/torch_mirror_vda.py``, which defines the state-dict layout
``weights/convert.py::convert_vda`` consumes):

* encoder: DA-V2 DINOv2 (same 4 intermediate taps as DA-V2);
* head: DA-V2 DPT pyramid with a pre-norm residual temporal attention block
  (MHA over the frame axis + MLP, sinusoidal temporal position encoding)
  applied to each refinenet output ``path4..path1``;
* output: conv stack identical to DA-V2, ReLU (relative disparity; the
  metric checkpoints share the graph and emit depth in meters).

TPU-first design: the whole T-frame window is ONE jitted program — frames
fold into the batch axis for the encoder (a single large MXU pass instead of
the reference's per-frame torch loop), temporal attention runs as batched
matmuls over the tiny T axis, and window stitching (least-squares scale/shift
on the overlap + linear cross-fade) is jitted device math in
:func:`align_windows`.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
    HEAD_CONFIGS,
    INTERMEDIATE_LAYER_IDX,
)
from monocular_depth_estimation_trt_tpu.models.dpt import (
    FeatureFusionBlock,
    PixelShuffleUpsample,
    _bilinear_ac,
)
from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS, DinoViT

# upstream run.py serving constants (32-frame training window, 10-frame
# stitching overlap for super-long videos)
WINDOW = 32
OVERLAP = 10


def temporal_pos_encoding(t: int, dim: int, dtype=jnp.float32) -> jax.Array:
    """Standard sinusoidal position encoding over the frame axis (T, dim)."""
    pos = np.arange(t, dtype=np.float32)[:, None]
    i = np.arange(dim // 2, dtype=np.float32)[None, :]
    freq = pos / np.power(10000.0, 2.0 * i / dim)
    pe = np.zeros((t, dim), np.float32)
    pe[:, 0::2] = np.sin(freq)
    pe[:, 1::2] = np.cos(freq)
    return jnp.asarray(pe, dtype)


class TemporalAttentionBlock(nn.Module):
    """Pre-norm residual attention over the FRAME axis.

    Input (B, T, H, W, C): every spatial location attends over its own T
    timesteps — (B*H*W) independent length-T sequences, batched matmuls on
    the MXU (T is tiny, so no flash kernel needed). LayerNorm/softmax in
    fp32, projections in the compute dtype.
    """

    dim: int
    num_heads: int = 8
    mlp_ratio: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        hd = c // self.num_heads
        tok = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b * h * w, t, c)
        tok = tok + temporal_pos_encoding(t, c, tok.dtype)[None]

        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(
            tok.astype(jnp.float32)
        ).astype(self.dtype)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv.reshape(-1, t, 3, self.num_heads, hd), 3, axis=2)
        q, k, v = (u[:, :, 0].swapaxes(1, 2) for u in (q, k, v))  # (BN, H, T, hd)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn / np.sqrt(hd), axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v).swapaxes(1, 2).reshape(-1, t, c)
        tok = tok + nn.Dense(c, dtype=self.dtype, name="proj")(o)

        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(
            tok.astype(jnp.float32)
        ).astype(self.dtype)
        y = nn.Dense(self.mlp_ratio * c, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        tok = tok + nn.Dense(c, dtype=self.dtype, name="fc2")(y)

        return tok.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)


class VDAHead(nn.Module):
    """DA-V2 DPT head + a temporal attention block after each fusion stage.

    Conv component names match :class:`models.dpt.DPTHead` so
    ``convert_dpt_head`` applies unchanged; the temporal blocks are
    ``temporal_4 .. temporal_1`` (stage they follow).
    """

    in_channels: int
    features: int = 64
    out_channels: Tuple[int, ...] = (48, 96, 192, 384)
    patch_size: int = 14
    num_heads: int = 8
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features, patch_hw: Tuple[int, int],
                 n_frames: int) -> jax.Array:
        ph, pw = patch_hw
        oc = list(self.out_channels)
        T = n_frames

        levels = []
        for i, feat in enumerate(features):
            tokens = feat[0] if isinstance(feat, (tuple, list)) else feat
            bt, n, d = tokens.shape
            x = tokens.reshape(bt, ph, pw, d).astype(self.dtype)
            x = nn.Conv(oc[i], (1, 1), dtype=self.dtype, name=f"project_{i}")(x)
            if i == 0:
                x = PixelShuffleUpsample(oc[0], 4, self.dtype, name="resize_0")(x)
            elif i == 1:
                x = PixelShuffleUpsample(oc[1], 2, self.dtype, name="resize_1")(x)
            elif i == 3:
                x = nn.Conv(oc[3], (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name="resize_3")(x)
            levels.append(x)

        rn = [
            nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name=f"layer{i + 1}_rn")(x)
            for i, x in enumerate(levels)
        ]
        l1, l2, l3, l4 = rn

        def temporal(path, idx):
            bt, hh, ww, cc = path.shape
            v = path.reshape(bt // T, T, hh, ww, cc)
            v = TemporalAttentionBlock(cc, self.num_heads, dtype=self.dtype,
                                       name=f"temporal_{idx}")(v)
            return v.reshape(bt, hh, ww, cc)

        path4 = FeatureFusionBlock(self.features, self.dtype, name="refinenet4")(
            l4, size=l3.shape[1:3]
        )
        path4 = temporal(path4, 4)
        path3 = FeatureFusionBlock(self.features, self.dtype, name="refinenet3")(
            path4, l3, size=l2.shape[1:3]
        )
        path3 = temporal(path3, 3)
        path2 = FeatureFusionBlock(self.features, self.dtype, name="refinenet2")(
            path3, l2, size=l1.shape[1:3]
        )
        path2 = temporal(path2, 2)
        path1 = FeatureFusionBlock(self.features, self.dtype, name="refinenet1")(
            path2, l1
        )
        path1 = temporal(path1, 1)

        out = nn.Conv(self.features // 2, (3, 3), padding=1, dtype=self.dtype,
                      name="output_conv1")(path1)
        out = _bilinear_ac(out, (ph * self.patch_size, pw * self.patch_size))
        out = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                      name="output_conv2_0")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), dtype=self.dtype, name="output_conv2_2")(out)
        return nn.relu(out[..., 0].astype(jnp.float32))


class VideoDepthAnything(nn.Module):
    """One window: preprocessed video (B, T, H, W, 3) -> depth (B, T, H', W').

    The T axis folds into the batch for the encoder (one large batched MXU
    pass) and unfolds only inside the head's temporal blocks.
    """

    encoder: str = "vits"
    num_heads: int = 8
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # test-size overrides (None -> encoder presets)
    vit_config: Any = None
    head_features: Any = None
    head_out_channels: Any = None
    out_indices: Any = None

    @nn.compact
    def __call__(self, video: jax.Array) -> jax.Array:
        vit_cfg = self.vit_config or VIT_CONFIGS[self.encoder]
        head_cfg = HEAD_CONFIGS.get(self.encoder, {})
        features_dim = self.head_features or head_cfg["features"]
        out_channels = self.head_out_channels or head_cfg["out_channels"]
        out_indices = self.out_indices or INTERMEDIATE_LAYER_IDX[self.encoder]

        b, t, H, W, _ = video.shape
        ph, pw = H // vit_cfg.patch_size, W // vit_cfg.patch_size
        frames = video.reshape(b * t, H, W, 3)

        feats = DinoViT(
            vit_cfg, out_indices=out_indices, dtype=self.dtype,
            attn_impl=self.attn_impl, name="pretrained",
        )(frames)
        depth = VDAHead(
            in_channels=vit_cfg.dim,
            features=features_dim,
            out_channels=tuple(out_channels),
            num_heads=self.num_heads,
            dtype=self.dtype,
            name="depth_head",
        )(feats, (ph, pw), t)
        return depth.reshape(b, t, depth.shape[-2], depth.shape[-1])


def align_scale_shift(pred, target) -> Tuple[float, float]:
    """Least-squares (a, b) minimizing ||a*pred + b - target||² over all
    elements of the overlap block. Host numpy (a few MB per window — cheaper
    than eager device ops over the remote TPU tunnel); closed form."""
    x = np.asarray(pred, np.float32).ravel()
    y = np.asarray(target, np.float32).ravel()
    n = x.size
    sx, sy = float(x.sum()), float(y.sum())
    sxx, sxy = float(x @ x), float(x @ y)
    det = n * sxx - sx * sx
    a = (n * sxy - sx * sy) / det if abs(det) > 1e-8 else 1.0
    b = (sy - a * sx) / n
    return a, b


def stitch_window(prev_tail, new, overlap: int) -> np.ndarray:
    """Scale/shift-align ``new`` (T_w, H, W) to the previous window using the
    first ``overlap`` frames (which re-predict the previous window's last
    ``overlap`` frames, ``prev_tail``), then cross-fade the overlap linearly.
    Returns the aligned window (same shape as ``new``); the caller keeps
    ``new[overlap:]`` plus the faded overlap."""
    prev_tail = np.asarray(prev_tail, np.float32)
    new = np.asarray(new, np.float32)
    a, b = align_scale_shift(new[:overlap], prev_tail)
    aligned = a * new + b
    wts = np.linspace(0.0, 1.0, overlap + 2, dtype=np.float32)[1:-1, None, None]
    faded = prev_tail * (1.0 - wts) + aligned[:overlap] * wts
    return np.concatenate([faded, aligned[overlap:]], axis=0)


def window_starts(n_frames: int, window: int, overlap: int) -> list:
    """Start indices of the overlapping windows covering ``n_frames``
    (upstream run.py slides by ``window - overlap``; the final window is
    right-aligned so no frame index exceeds the video)."""
    if n_frames <= window:
        return [0]
    step = window - overlap
    starts = list(range(0, n_frames - window, step))
    starts.append(n_frames - window)
    return starts
