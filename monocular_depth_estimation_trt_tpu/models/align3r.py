"""Align3R — pairwise depth/pointmap/pose for dynamic videos.

Capability parity with reference ``later/Align3R/`` (README-only staging
dir: "two 2d images -> depth, point cloud, Camera pose", upstream
jiah-cloud/Align3R, arXiv:2412.03079). Align3R's published design: a
DUSt3R-style two-view transformer — shared ViT encoder, twin decoders with
cross-attention between the views, pointmap+confidence heads in the FIRST
view's frame — conditioned on monocular depth priors (a frozen
Depth-Anything estimate per frame) injected into the decoder.

Reconstruction (confidence: medium — the reference vendors no code, so the
topology is frozen by the torch mirror in ``tests/torch_mirror_align3r.py``,
which defines the state-dict layout ``weights/convert.py::convert_align3r``
consumes):

* encoder: patch-16 ViT over BOTH frames in one batched pass (CroCo-style
  plain ViT — our DinoViT with patch_size=16, no registers);
* depth-prior injection: per-view prior depth map, per-image standardized,
  patch-16 conv-embedded and ADDED to that view's projected decoder input;
* twin decoders in lockstep: at layer i each view runs
  self-attention -> cross-attention to the OTHER view's layer-(i-1) tokens
  -> MLP (pre-LN, separate weights per view, DUSt3R asymmetry);
* heads: one DPT head per view (4 decoder taps) -> pts3d (sign-preserving
  inv_log) + confidence (expp1), both expressed in view 1's frame;
* pose: the registry runs the pair in BOTH orders inside one program and
  recovers the relative camera with confidence-weighted Procrustes
  (``ops/procrustes.py``) — closed-form on device, no RANSAC loop.

TPU-first: the two views share every encoder matmul (folded batch), the
decoders are a python-unrolled stack of fused attention blocks, and both
pair orders batch together, so serving is ONE jitted program.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.config import IMAGENET_MEAN, IMAGENET_STD
from monocular_depth_estimation_trt_tpu.models.dpt import DPTHead
from monocular_depth_estimation_trt_tpu.models.vit import DinoViT, ViTConfig


class CrossBlock(nn.Module):
    """DUSt3R decoder block: pre-LN self-attention, cross-attention to the
    other view, MLP. fp32 LN/softmax, compute-dtype matmuls."""

    dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16

    def _attn(self, q_tok, kv_tok, tag):
        c = self.dim
        hd = c // self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name=f"{tag}_q")(q_tok)
        kv = nn.Dense(2 * c, dtype=self.dtype, name=f"{tag}_kv")(kv_tok)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(u):
            return u.reshape(*u.shape[:-1], self.num_heads, hd).swapaxes(-3, -2)

        qh, kh, vh = heads(q), heads(k), heads(v)
        a = jnp.einsum("...qd,...kd->...qk", qh, kh).astype(jnp.float32)
        a = jax.nn.softmax(a / jnp.sqrt(hd).astype(jnp.float32), axis=-1)
        o = jnp.einsum("...qk,...kd->...qd", a.astype(self.dtype), vh)
        o = o.swapaxes(-3, -2).reshape(*q_tok.shape[:-1], c)
        return nn.Dense(c, dtype=self.dtype, name=f"{tag}_proj")(o)

    def _ln(self, x, name):
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=name)(
            x.astype(jnp.float32)
        ).astype(self.dtype)

    @nn.compact
    def __call__(self, x: jax.Array, other: jax.Array) -> jax.Array:
        h = self._ln(x, "norm1")
        x = x + self._attn(h, h, "self")
        x = x + self._attn(self._ln(x, "norm2"), self._ln(other, "norm_y"),
                           "cross")
        y = self._ln(x, "norm3")
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


def _pts_conf(out4: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """4-channel DPT output -> (pts3d inv_log, conf expp1)."""
    xyz = out4[..., :3]
    pts = jnp.sign(xyz) * jnp.expm1(jnp.clip(jnp.abs(xyz), 0.0, 10.0))
    conf = 1.0 + jnp.exp(jnp.clip(out4[..., 3], -10.0, 10.0))
    return pts, conf


class Align3R(nn.Module):
    """(img1, img2 raw 0-255 (B,H,W,3), prior1, prior2 (B,H,W)) ->
    dict(pts1, conf1, pts2, conf2) — pointmaps in view 1's frame at input
    resolution."""

    enc: ViTConfig = ViTConfig(dim=1024, depth=24, num_heads=16,
                               patch_size=16, pretrain_img_size=512)
    dec_dim: int = 768
    dec_depth: int = 12
    dec_heads: int = 12
    head_features: int = 128
    head_out_channels: Sequence[int] = (96, 192, 384, 768)
    out_indices: Any = None  # decoder taps for the DPT heads
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, img1, img2, prior1, prior2):
        b, H, W, _ = img1.shape
        p = self.enc.patch_size
        ph, pw = H // p, W // p
        # 4 evenly-spaced decoder taps for the DPT heads (last layer included)
        taps = tuple(self.out_indices) if self.out_indices else (
            self.dec_depth // 4 - 1, self.dec_depth // 2 - 1,
            3 * self.dec_depth // 4 - 1, self.dec_depth - 1,
        )

        x = jnp.concatenate([img1, img2], axis=0).astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        enc_tokens = DinoViT(
            self.enc, out_indices=(self.enc.depth - 1,), dtype=self.dtype,
            attn_impl=self.attn_impl, name="encoder",
        )(x)[0][0]  # (2B, N, enc_dim)

        tok = nn.Dense(self.dec_dim, dtype=self.dtype, name="decoder_embed")(
            enc_tokens
        )

        # depth-prior injection: standardize per image, patch-16 conv embed,
        # add to the view's decoder input tokens
        pri = jnp.concatenate([prior1, prior2], axis=0)[..., None]
        pri = pri.astype(jnp.float32)
        mu = jnp.mean(pri, axis=(1, 2, 3), keepdims=True)
        sd = jnp.std(pri, axis=(1, 2, 3), keepdims=True) + 1e-6
        pri = ((pri - mu) / sd).astype(self.dtype)
        pri_tok = nn.Conv(self.dec_dim, (p, p), strides=(p, p),
                          dtype=self.dtype, name="prior_embed")(pri)
        tok = tok + pri_tok.reshape(2 * b, ph * pw, self.dec_dim)

        x1, x2 = tok[:b], tok[b:]
        taps1, taps2 = [], []
        for i in range(self.dec_depth):
            n1 = CrossBlock(self.dec_dim, self.dec_heads, self.dtype,
                            name=f"dec1_{i}")(x1, x2)
            n2 = CrossBlock(self.dec_dim, self.dec_heads, self.dtype,
                            name=f"dec2_{i}")(x2, x1)
            x1, x2 = n1, n2  # lockstep: cross reads the other view's PREVIOUS layer
            if i in taps:
                taps1.append((x1, None))
                taps2.append((x2, None))

        def head(feats, name):
            return DPTHead(
                in_channels=self.dec_dim, features=self.head_features,
                out_channels=tuple(self.head_out_channels), patch_size=p,
                final_act="none", num_outputs=4, dtype=self.dtype, name=name,
            )(feats, (ph, pw))

        pts1, conf1 = _pts_conf(head(taps1, "head1"))
        pts2, conf2 = _pts_conf(head(taps2, "head2"))
        return {"pts1": pts1, "conf1": conf1, "pts2": pts2, "conf2": conf2}
