"""Metric3D V2: canonical-camera metric depth + surface normals.

Reference contract (``Metric3D_V2/onnx_export.py:37-58``, ``infer.py:73-125``):
input (1, 616, 1064, 3) normalized in 0-255 space with keep-ratio mean-pad;
output ``pred_depth`` (1, 616, 1064) metric depth in the canonical camera
(focal 1000); postprocess unpads and applies the de-canonical focal scale.
The torch path also produces surface normals (``infer.py:128-138``).

Architecture (reconstruction of upstream Metric3D v2's ViT-L model — the
upstream repo is gitignored in the reference (it imports
``Metric3DExportModel`` after ``update_vit_sampling`` graph surgery,
``onnx_export.py:37-38``); topology rebuilt from the Metric3D v2 paper
(DINOv2-reg ViT backbone + RAFT-style iterative depth-normal decoder,
"RAFTDepthNormalDPT"), with a torch mirror in
``tests/torch_mirror_metric3d.py`` fixing the state-dict layout for
``weights/convert.py::convert_metric3d_v2``):

* ``encoder``: DINOv2 ViT with 4 register tokens, 4 intermediate taps;
* ``neck``: DPT projection + RefineNet fusion pyramid (the DPT5 trunk)
  producing a context map at 2x the patch grid (H/7);
* ``init_head`` -> initial (depth, normal) prediction at H/7;
* ``update``: ConvGRU refinement iterations — each embeds the current
  prediction, merges it with the context, updates the hidden state, and
  emits a (depth, normal) delta (the upstream RAFT-style loop);
* ``upsample``: learned convex 7x upsampling mask (RAFT's upsample_flow
  generalized to factor 7 and 4 channels) to full resolution;
* activations: depth = d_min + (d_max - d_min) * sigmoid (canonical range
  0.3-150 m), normals L2-normalized, confidence sigmoid from the hidden
  state.

TPU notes: the ViT-L encoder at 616x1064 (44x76 = 3344 patch tokens)
dominates the FLOPs; the GRU loop runs at 88x152 where the 3x3 convs are
MXU-tiled matmuls; the convex upsample is one einsum.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
    HEAD_CONFIGS,
    INTERMEDIATE_LAYER_IDX,
)
from monocular_depth_estimation_trt_tpu.models.dpt import (
    FeatureFusionBlock,
    PixelShuffleUpsample,
)
from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS, DinoViT

# canonical-space depth range (metric, at the 1000 px canonical focal)
DEPTH_RANGE = (0.3, 150.0)


def convex_upsample(x: jax.Array, mask: jax.Array, k: int) -> jax.Array:
    """Learned convex kx upsampling (RAFT ``upsample_flow`` generalized).

    x (B, h, w, C), mask (B, h, w, 9*k*k) -> (B, k*h, k*w, C).

    TPU-first layout (scripts/roofline_metric3d.py): the textbook
    einsum form — stack 9 shifted patches to (B,h,w,9,C) and contract
    ``bhwkq,bhwkc->bhwqc`` — puts the tiny dims (9, 49, 5) in the two
    trailing axes, so every op runs on nearly-empty (8,128) vregs and the
    whole stage measured 8.3 ms for 0.1 GFLOP (14% of its byte roof).
    Instead keep every tensor at (B, h, w, k*k) — k*k=49 lanes — and
    express the 9-tap convex combination as 9 shifted elementwise
    multiply-adds per channel: the softmax runs on 9 lane-aligned slices
    of the (B,h,w,9*k*k) conv output (no 5-D reshape), and the final
    pixel-shuffle is one (k,k) transpose per channel.

    The per-channel unroll emits 9*C slice/mul/add ops — tuned for the
    small C of depth heads (C <= 8: depth+normal+conf = 5 here, 2 for
    RAFT flow). Large C would blow up the HLO graph, so it asserts."""
    b, h, w, c = x.shape
    assert c <= 8, f"convex_upsample channel unroll is tuned for C<=8, got C={c}"
    kk = k * k
    # softmax over the 9 taps, computed on (B,h,w,kk) slices: tap j for all
    # k*k sub-pixels lives at lanes [j*kk, (j+1)*kk) of the mask conv output.
    # Project convention: softmax statistics in fp32 (bf16 compute elsewhere).
    taps = [mask[..., j * kk : (j + 1) * kk].astype(jnp.float32) for j in range(9)]
    mx = functools.reduce(jnp.maximum, taps)
    exps = [jnp.exp(t - mx) for t in taps]
    inv_den = 1.0 / functools.reduce(jnp.add, exps)
    weights = [(e * inv_den).astype(x.dtype) for e in exps]  # 9 x (B, h, w, kk)

    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    shifts = [(dy, dx) for dy in range(3) for dx in range(3)]
    chans = []
    for ci in range(c):
        acc = None
        for wj, (dy, dx) in zip(weights, shifts):
            term = wj * padded[:, dy : dy + h, dx : dx + w, ci : ci + 1]
            acc = term if acc is None else acc + term
        # pixel shuffle: (B,h,w,kk) -> (B,h,w,k,k) -> (B,h,k,w,k) -> (B,kh,kw)
        up = acc.reshape(b, h, w, k, k).transpose(0, 1, 3, 2, 4)
        chans.append(up.reshape(b, k * h, k * w))
    return jnp.stack(chans, axis=-1)


class ConvGRU(nn.Module):
    """3x3 convolutional GRU (the upstream update block's recurrent cell).

    TPU layout: the z and r gates read the SAME input, so they run as ONE
    conv with ``2*hidden`` outputs and a split — identical math to
    upstream's two convs (output channels of a conv are independent; the
    converter concatenates the torch ``convz``/``convr`` kernels along the
    output axis, the :func:`weights.convert._sep_gru` pattern RAFT/WAFT
    already use), but one N=256 MXU matmul instead of two N=128 ones in
    the 4x-unrolled refine loop. Gates keep fp32 statistics (project
    convention)."""

    hidden: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        hx = jnp.concatenate([h, x], axis=-1)
        zr = nn.Conv(2 * self.hidden, (3, 3), padding=1, dtype=self.dtype,
                     name="convzr")(hx).astype(jnp.float32)
        z = jax.nn.sigmoid(zr[..., : self.hidden]).astype(h.dtype)
        r = jax.nn.sigmoid(zr[..., self.hidden :]).astype(h.dtype)
        q = jnp.tanh(
            nn.Conv(self.hidden, (3, 3), padding=1, dtype=self.dtype,
                    name="convq")(
                jnp.concatenate([r * h, x], axis=-1)
            ).astype(jnp.float32)
        ).astype(h.dtype)
        return (1.0 - z) * h + z * q


class DPTNeck(nn.Module):
    """DPT projection + fusion trunk -> context features at 2x patch grid.

    Same component layout as the DA-V2 DPTHead trunk (projects / resize /
    scratch.layerN_rn / refinenetN) so upstream DPT-family checkpoints map
    with the existing converter rules; fusion stops at refinenet2's output
    (2x patch grid) where the upstream RAFT decoder runs."""

    features: int
    out_channels: Tuple[int, ...]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features, patch_hw: Tuple[int, int]) -> jax.Array:
        ph, pw = patch_hw
        oc = list(self.out_channels)
        levels = []
        for i, feat in enumerate(features):
            tokens = feat[0] if isinstance(feat, (tuple, list)) else feat
            b, n, d = tokens.shape
            x = tokens.reshape(b, ph, pw, d).astype(self.dtype)
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
        p4 = FeatureFusionBlock(self.features, self.dtype, name="refinenet4")(
            l4, size=l3.shape[1:3])
        p3 = FeatureFusionBlock(self.features, self.dtype, name="refinenet3")(
            p4, l3, size=l2.shape[1:3])
        p2 = FeatureFusionBlock(self.features, self.dtype, name="refinenet2")(
            p3, l2, size=(ph * 2, pw * 2))
        return p2  # (B, 2*ph, 2*pw, features)


@dataclasses.dataclass(frozen=True)
class Metric3DConfig:
    """Tiny-config override for tests (no global table mutation)."""

    vit_config: Any = None
    features: Optional[int] = None
    out_channels: Optional[Tuple[int, ...]] = None
    out_indices: Optional[Tuple[int, ...]] = None
    hidden: Optional[int] = None
    upsample_factor: int = 7


class Metric3DV2(nn.Module):
    """Returns dict(depth (B, H, W) canonical metric, normal (B, H, W, 3),
    confidence (B, H, W)). H, W must be multiples of patch*upsample/2 in the
    canonical 616x1064 config (ph=44, pw=76, refinement at 88x152, 7x convex
    upsample back to 616x1064)."""

    encoder: str = "vitl"
    iters: int = 4
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # int8 w8a8 serving for the ViT-L encoder Dense layers (ops/quant.py);
    # the RAFT-DPT decoder stays bf16 (conv/GRU-dominated)
    quant: str = "none"
    cfg: Metric3DConfig = Metric3DConfig()

    @nn.compact
    def __call__(self, x: jax.Array):
        vit_cfg = self.cfg.vit_config or VIT_CONFIGS[self.encoder]
        # Metric3D v2 uses the register-token DINOv2 ("vit_large_reg")
        vit_cfg = dataclasses.replace(vit_cfg, num_register_tokens=4)
        head_cfg = HEAD_CONFIGS[self.encoder] if self.cfg.features is None else {
            "features": self.cfg.features, "out_channels": self.cfg.out_channels,
        }
        out_indices = self.cfg.out_indices or INTERMEDIATE_LAYER_IDX[self.encoder]
        hidden = self.cfg.hidden or 128
        k = self.cfg.upsample_factor
        b, H, W, _ = x.shape
        ph, pw = H // vit_cfg.patch_size, W // vit_cfg.patch_size
        # refinement grid is 2x the patch grid; the k-fold convex upsample
        # must land back on (H, W): k == patch_size / 2 (7 for patch 14)
        assert 2 * ph * k == H and 2 * pw * k == W, (
            f"input {H}x{W} incompatible with patch {vit_cfg.patch_size} "
            f"and upsample factor {k}"
        )

        feats = DinoViT(
            vit_cfg,
            out_indices=out_indices,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
            name="encoder",
        )(x)

        ctx = DPTNeck(head_cfg["features"], tuple(head_cfg["out_channels"]),
                      self.dtype, name="neck")(feats, (ph, pw))

        # context split: GRU hidden init (tanh) + static input (relu)
        cnet = nn.Conv(2 * hidden, (3, 3), padding=1, dtype=self.dtype,
                       name="context_conv")(ctx)
        h0, inp = jnp.split(cnet, [hidden], axis=-1)
        h = jnp.tanh(h0.astype(jnp.float32)).astype(self.dtype)
        inp = nn.relu(inp)

        # initial prediction: 1 depth logit + 3 normal
        pred = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                       name="init_head")(ctx).astype(jnp.float32)

        gru = ConvGRU(hidden, self.dtype, name="gru")
        pred_enc = nn.Conv(hidden, (3, 3), padding=1, dtype=self.dtype,
                           name="pred_encoder")
        delta_head = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype,
                             name="delta_head")
        for _ in range(self.iters):
            e = nn.relu(pred_enc(pred.astype(self.dtype)))
            h = gru(h, jnp.concatenate([inp, e], axis=-1))
            pred = pred + delta_head(h).astype(jnp.float32)

        mask = nn.Conv(9 * k * k, (1, 1), dtype=self.dtype,
                       name="mask_head")(h)
        conf = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                       name="conf_head")(h).astype(jnp.float32)

        up = convex_upsample(
            jnp.concatenate([pred, conf], axis=-1).astype(self.dtype),
            mask, k,
        ).astype(jnp.float32)  # (B, H, W, 5)
        d_min, d_max = DEPTH_RANGE
        depth = d_min + (d_max - d_min) * jax.nn.sigmoid(up[..., 0])
        normal = up[..., 1:4]
        normal = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-6
        )
        confidence = jax.nn.sigmoid(up[..., 4])
        return {"depth": depth, "normal": normal, "confidence": confidence}
