"""DPT decoder head (shared by the Depth Anything family and friends).

Faithful reimplementation of the DPTHead used by Depth Anything V2 (the
architecture behind reference ``Depth_Anything_V2/infer.py:46-57`` — four
intermediate ViT feature maps -> per-level 1x1 projections -> up/down resize
layers -> RefineNet-style fusion pyramid -> 2-conv output head), re-laid-out
channels-last for TPU.

Parity-critical details preserved exactly:
* resize layers are ConvTranspose(k=4,s=4) / ConvTranspose(k=2,s=2) /
  identity / Conv(3x3,s=2,p=1) — the non-overlapping transpose convs are
  implemented as einsum + pixel-shuffle (bit-identical, MXU-friendly);
* fusion upsampling is bilinear with ``align_corners=True``;
* residual conv units: relu -> conv -> relu -> conv -> +skip, no batchnorm;
* output head: conv3x3 -> bilinear(patch*14, align_corners=True) ->
  conv3x3 -> relu -> conv1x1 -> relu (relative) or sigmoid (metric).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.ops.resize import resample_matrix


def _bilinear_ac(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear align_corners=True resize on NHWC, as two matmuls.

    Runs in the activation dtype (bf16 on the MXU in production; fp32 in the
    fp32 parity tests) — the surrounding convs are the same dtype, so the
    resize adds no precision loss of its own."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == tuple(out_hw):
        return x
    wh = jnp.asarray(resample_matrix(h, out_hw[0], "linear", align_corners=True))
    ww = jnp.asarray(resample_matrix(w, out_hw[1], "linear", align_corners=True))
    y = jnp.einsum("oh,nhwc->nowc", wh.astype(x.dtype), x)
    y = jnp.einsum("pw,nowc->nopc", ww.astype(x.dtype), y)
    return y


class PixelShuffleUpsample(nn.Module):
    """ConvTranspose2d with stride == kernel_size (non-overlapping).

    Each input pixel expands into a (k x k) output block: an einsum over the
    channel dim followed by a reshape — exactly equivalent to the torch layer
    (weights convert from torch's (in, out, kh, kw))."""

    features: int
    k: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, cin = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.k, self.k, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # out[n, h*k+ki, w*k+ui, f] = sum_c x[n,h,w,c] * kernel[ki,ui,c,f]
        # == torch ConvTranspose2d(stride=k) with weight.permute(2,3,0,1).
        y = jnp.einsum("nhwc,kucf->nhkwuf", x, kernel.astype(self.dtype))
        y = y.reshape(b, h * self.k, w * self.k, self.features)
        return y + bias.astype(self.dtype)


class ResidualConvUnit(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = nn.relu(x)
        out = nn.Conv(
            self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1"
        )(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2"
        )(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        res: Optional[jax.Array] = None,
        size: Optional[Tuple[int, int]] = None,
    ) -> jax.Array:
        out = x
        if res is not None:
            out = out + ResidualConvUnit(self.features, self.dtype, name="resConfUnit1")(res)
        out = ResidualConvUnit(self.features, self.dtype, name="resConfUnit2")(out)
        if size is None:
            size = (out.shape[-3] * 2, out.shape[-2] * 2)
        out = _bilinear_ac(out, size)
        out = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(out)
        return out


class DPTHead(nn.Module):
    """Input: list of 4 (patch_tokens (B, N, D), cls (B, D)); output (B, H, W)
    at resolution (patch_h*14, patch_w*14)."""

    in_channels: int
    features: int = 64
    out_channels: Sequence[int] = (48, 96, 192, 384)
    patch_size: int = 14
    final_act: str = "relu"  # "relu" (relative) | "sigmoid" (metric)
    # >1: emit (B, H, W, C) from the final conv (VGGT's depth head packs
    # depth + confidence into one 2-channel DPT head, VGGT/onnx_export2.py)
    num_outputs: int = 1
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
                x = nn.Conv(
                    oc[3],
                    (3, 3),
                    strides=(2, 2),
                    padding=1,
                    dtype=self.dtype,
                    name="resize_3",
                )(x)
            levels.append(x)

        rn = []
        for i, x in enumerate(levels):
            rn.append(
                nn.Conv(
                    self.features,
                    (3, 3),
                    padding=1,
                    use_bias=False,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_rn",
                )(x)
            )
        l1, l2, l3, l4 = rn

        path4 = FeatureFusionBlock(self.features, self.dtype, name="refinenet4")(
            l4, size=l3.shape[1:3]
        )
        path3 = FeatureFusionBlock(self.features, self.dtype, name="refinenet3")(
            path4, l3, size=l2.shape[1:3]
        )
        path2 = FeatureFusionBlock(self.features, self.dtype, name="refinenet2")(
            path3, l2, size=l1.shape[1:3]
        )
        path1 = FeatureFusionBlock(self.features, self.dtype, name="refinenet1")(
            path2, l1
        )

        out = nn.Conv(
            self.features // 2, (3, 3), padding=1, dtype=self.dtype, name="output_conv1"
        )(path1)
        out = _bilinear_ac(out, (ph * self.patch_size, pw * self.patch_size))
        out = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype, name="output_conv2_0")(out)
        out = nn.relu(out)
        out = nn.Conv(self.num_outputs, (1, 1), dtype=self.dtype,
                      name="output_conv2_2")(out)
        if self.final_act == "relu":
            out = nn.relu(out)
        elif self.final_act == "sigmoid":
            out = nn.sigmoid(out)
        elif self.final_act == "none":
            pass
        if self.num_outputs > 1:
            return out.astype(jnp.float32)
        return out[..., 0].astype(jnp.float32)
