"""Apple Depth Pro: multi-scale ViT patch encoder + DPT-style decoder + FoV head.

Capability parity with reference ``Depth_Pro/`` (model config at
``onnx_export.py:13-31`` — dinov2l16_384 patch/image/fov encoders, 256
decoder features; serving contract at ``onnx2trt.py:96-165``):

* input (1, 1536, 1536, 3) normalized with mean/std 0.5;
* outputs ``canonical_inverse_depth`` (1, 1536, 1536) and ``fov_deg`` (1,);
* postprocess ``f_px = 0.5 W / tan(0.5 fov)``, ``depth = 1/clamp(cid * W/f_px)``
  (implemented on device in ``ops/camera.py``).

Architecture (Depth Pro paper / apple ml-depth-pro): a 3-level image pyramid
(1536 / 768 / 384); the two finer levels are split into overlapping 384x384
patches (25 at full res with 25% overlap, 9 at half res with 50% overlap) and
batched with the 384 global view through ONE shared ViT-L/16@384 patch
encoder — a single (35, 577, 1024) batched transformer pass, ideal for the
MXU. Two intermediate taps (blocks 5, 11, raw) give high-res latents. Patch
features are merged back seam-free by cropping the overlap margins, projected
and upsampled into a 5-level pyramid (256@768, 256@384, 512@192, 1024@96,
1024@48 fused with a separate image encoder), decoded by a multires fusion
decoder to 256@768, and finished by an upconv head at 1536. The FoV head
pools decoder features with the fov encoder's global feature into one scalar.

Fidelity note: layer topology follows the published architecture; exact
upstream parity at the weight level depends on converting the
``depth_pro.pt`` checkpoint (not available in this environment).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.models.dpt import (
    FeatureFusionBlock,
    PixelShuffleUpsample,
    _bilinear_ac,
)
from monocular_depth_estimation_trt_tpu.models.vit import DinoViT, ViTConfig
from monocular_depth_estimation_trt_tpu.ops.resize import resize

VIT_L16_384 = ViTConfig(
    dim=1024, depth=24, num_heads=16, patch_size=16, pretrain_img_size=384
)

# raw intermediate hooks for high-res latents (apple ml-depth-pro
# hook_block_ids for the ViT-L preset)
HOOK_BLOCK_IDS = (5, 11)


def split_overlapping(x: jax.Array, patch: int, stride: int) -> jax.Array:
    """(B, H, W, C) -> (B*k*k, patch, patch, C), row-major windows."""
    b, h, w, c = x.shape
    k = (h - patch) // stride + 1
    rows = []
    for i in range(k):
        for j in range(k):
            rows.append(
                x[:, i * stride : i * stride + patch, j * stride : j * stride + patch]
            )
    return jnp.concatenate(rows, axis=0)


def merge_overlapping(feats: jax.Array, k: int, stride_f: int) -> jax.Array:
    """Inverse of :func:`split_overlapping` in feature space.

    feats: (k*k, h, h, C) per-window feature maps; windows overlap by
    ``h - stride_f`` features. The overlap margin ``p = (h - stride_f)/2`` is
    cropped from interior seams (Depth Pro's merge), giving a seamless
    (1, k*stride_f + 2p, ..., C) map.
    """
    kk, h, _, c = feats.shape
    assert kk == k * k
    p = (h - stride_f) // 2
    out_rows = []
    for i in range(k):
        row_tiles = []
        for j in range(k):
            f = feats[i * k + j]
            t = 0 if i == 0 else p
            b = h if i == k - 1 else h - p
            l = 0 if j == 0 else p
            r = h if j == k - 1 else h - p
            row_tiles.append(f[t:b, l:r])
        out_rows.append(jnp.concatenate(row_tiles, axis=1))
    return jnp.concatenate(out_rows, axis=0)[None]


class ProjectUpsample(nn.Module):
    """1x1 projection + n stride-2 transpose-conv upsamples (Depth Pro
    encoder feature blocks)."""

    dim_out: int
    upsamples: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim_out, (1, 1), use_bias=False, dtype=self.dtype,
                    name="proj")(x)
        for i in range(self.upsamples):
            x = PixelShuffleUpsample(self.dim_out, 2, self.dtype, name=f"up_{i}")(x)
        return x


class MultiresConvDecoder(nn.Module):
    """DPT-style multiresolution fusion: project each level to
    ``decoder_features`` then fuse coarse-to-fine."""

    decoder_features: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, levels: Sequence[jax.Array]):
        f = self.decoder_features
        projected = []
        for i, x in enumerate(levels):
            if x.shape[-1] != f:
                x = nn.Conv(f, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                            name=f"conv_{i}")(x)
            projected.append(x)
        # levels ordered fine -> coarse; fuse from coarsest up
        out = FeatureFusionBlock(f, self.dtype, name=f"fusion_{len(projected) - 1}")(
            projected[-1], size=projected[-2].shape[1:3]
        )
        for i in range(len(projected) - 2, 0, -1):
            out = FeatureFusionBlock(f, self.dtype, name=f"fusion_{i}")(
                out, projected[i], size=projected[i - 1].shape[1:3]
            )
        out = FeatureFusionBlock(f, self.dtype, name="fusion_0")(
            out, projected[0], size=projected[0].shape[1:3]
        )
        return out  # (1, 768, 768, f)


class FOVNetwork(nn.Module):
    """Field-of-view head: decoder features + fov-encoder global feature ->
    one scalar (degrees)."""

    features: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, decoder_feat: jax.Array, fov_global: jax.Array,
                 grid_hw: Tuple[int, int] = (24, 24)):
        f = self.features
        x = nn.Conv(f // 2, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                    name="down0")(decoder_feat)  # 768 -> 384
        x = nn.relu(x)
        # pool to the fov encoder grid and fuse
        x = resize(x, grid_hw, method="linear")
        g = nn.Dense(f // 2, dtype=self.dtype, name="fov_proj")(fov_global)
        x = x + g[:, None, None, :]
        x = nn.Conv(f // 4, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                    name="down1")(x)  # 24 -> 12
        x = nn.relu(x)
        x = nn.Conv(f // 8, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                    name="down2")(x)  # 12 -> 6
        x = nn.relu(x)
        # flatten in (C, H, W) order — torch checkpoints store the head
        # Linear against an NCHW flatten
        x = jnp.moveaxis(x, -1, 1).reshape(x.shape[0], -1)
        fov = nn.Dense(1, dtype=self.dtype, name="head")(x)
        return fov[:, 0].astype(jnp.float32)


import dataclasses


@dataclasses.dataclass(frozen=True)
class DepthProConfig:
    """Geometry of the multi-scale pyramid. The production preset is the
    upstream ViT-L/16@384 layout (1536 input, 384 windows, 25+9+1 views);
    tiny presets keep every ratio (window = 4x stride margins, 5x5 and 3x3
    grids) so the split/merge math is exercised identically in tests."""

    img_size: int = 1536
    window: int = 384
    stride0: int = 288  # full-res split stride (25 windows)
    stride1: int = 192  # half-res split stride (9 windows)
    vit_config: Any = None
    hook_block_ids: Tuple[int, int] = HOOK_BLOCK_IDS

    @property
    def vit(self):
        return self.vit_config or VIT_L16_384


class DepthPro(nn.Module):
    """Input (1, S, S, 3) normalized (mean/std 0.5), S = cfg.img_size.
    Returns (canonical_inverse_depth (1, S, S), fov_deg (1,))."""

    decoder_features: int = 256
    dims_encoder: Tuple[int, int, int, int] = (256, 512, 1024, 1024)
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # int8 w8a8 serving for both ViT encoders' Dense layers (ops/quant.py)
    quant: str = "none"
    cfg: DepthProConfig = DepthProConfig()

    @nn.compact
    def __call__(self, x: jax.Array):
        c = self.cfg
        assert x.shape[1] == c.img_size and x.shape[2] == c.img_size, x.shape
        d = self.dtype
        vit = c.vit
        g = c.window // vit.patch_size            # encoder grid (24)
        s0f = c.stride0 // vit.patch_size         # merge stride, full res (18)
        s1f = c.stride1 // vit.patch_size         # merge stride, half res (12)
        k0 = (c.img_size - c.window) // c.stride0 + 1       # 5
        k1 = (c.img_size // 2 - c.window) // c.stride1 + 1  # 3
        n0, n1 = k0 * k0, k1 * k1

        # --- image pyramid (on device; bilinear half-pixel like torch) ---
        x0 = x
        x1 = resize(x, (c.img_size // 2, c.img_size // 2), method="linear")
        x2 = resize(x, (c.window, c.window), method="linear")

        # --- overlapping patch split -> one batched encoder pass ---
        p0 = split_overlapping(x0, c.window, c.stride0)  # n0
        p1 = split_overlapping(x1, c.window, c.stride1)  # n1
        patches = jnp.concatenate([p0, p1, x2], axis=0)  # (n0+n1+1, w, w, 3)

        final_idx = vit.depth - 1
        taps = DinoViT(
            vit,
            out_indices=(*c.hook_block_ids, final_idx),
            raw_indices=c.hook_block_ids,
            dtype=d,
            attn_impl=self.attn_impl,
            quant=self.quant,
            name="patch_encoder",
        )(patches)
        (h0, _), (h1, _), (fin, _) = taps  # each (n0+n1+1, g*g, dim)

        def grid(t):  # tokens -> (B, g, g, C)
            return t.reshape(t.shape[0], g, g, t.shape[-1])

        latent0 = merge_overlapping(grid(h0[:n0]), k0, s0f)
        latent1 = merge_overlapping(grid(h1[:n0]), k0, s0f)
        f0 = merge_overlapping(grid(fin[:n0]), k0, s0f)
        f1 = merge_overlapping(grid(fin[n0 : n0 + n1]), k1, s1f)
        f_global = grid(fin[n0 + n1 :])  # (1, g, g, dim)

        # --- separate whole-image encoder at the window size ---
        img_taps = DinoViT(
            vit,
            out_indices=(final_idx,),
            dtype=d,
            attn_impl=self.attn_impl,
            quant=self.quant,
            name="image_encoder",
        )(x2)
        img_feat, img_cls = img_taps[0]
        img_feat = grid(img_feat)  # (1, g, g, dim)

        de = self.dims_encoder
        lvl0 = ProjectUpsample(de[0], 3, d, name="upsample_latent0")(latent0)  # 768
        lvl1 = ProjectUpsample(de[0], 2, d, name="upsample_latent1")(latent1)  # 384
        lvl2 = ProjectUpsample(de[1], 1, d, name="upsample0")(f0)  # 192
        lvl3 = ProjectUpsample(de[2], 1, d, name="upsample1")(f1)  # 96
        lvl4 = ProjectUpsample(de[3], 1, d, name="upsample2")(f_global)  # 48
        img_up = PixelShuffleUpsample(de[3], 2, d, name="upsample_lowres")(img_feat)
        lvl4 = nn.Conv(de[3], (1, 1), dtype=d, name="fuse_lowres")(
            jnp.concatenate([lvl4, img_up], axis=-1)
        )

        decoder_out = MultiresConvDecoder(self.decoder_features, d, name="decoder")(
            [lvl0, lvl1, lvl2, lvl3, lvl4]
        )  # (1, 768, 768, 256)

        # --- depth head: 768 -> 1536 ---
        y = nn.Conv(self.decoder_features // 2, (3, 3), padding=1, dtype=d,
                    name="head_conv0")(decoder_out)
        y = PixelShuffleUpsample(self.decoder_features // 2, 2, d, name="head_up")(y)
        y = nn.Conv(32, (3, 3), padding=1, dtype=d, name="head_conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), dtype=d, name="head_conv2")(y)
        canonical_inverse_depth = nn.relu(y)[..., 0].astype(jnp.float32)

        fov_deg = FOVNetwork(self.decoder_features, d, name="fov")(
            decoder_out, img_cls, (g, g)
        )
        return canonical_inverse_depth, fov_deg
