"""FlashDepth — streaming video depth with a Mamba temporal module.

Capability parity with reference ``later/FlashDepth/`` (Eyeline-Labs
FlashDepth: real-time streaming video depth at 2K). The reference wrapper
pins the serving contract (``later/FlashDepth/wrapper.py:9-25``): per-frame
forward = ``get_dpt_features(frame)`` -> ``final_head(features, ph, pw)`` ->
``clip(min=0)``, with a stateful ``self.mamba`` that is reset by
``start_new_sequence()`` and carries temporal state across frames; the infer
loop streams frames one at a time (``later/FlashDepth/infer.py:104-130``).

Reconstruction (confidence: medium — the upstream repo is gitignored by the
reference, so the topology is frozen by the torch mirror in
``tests/torch_mirror_flashdepth.py``, which defines the state-dict layout
``weights/convert.py::convert_flashdepth`` consumes):

* DINOv2 encoder + DA-V2 DPT fusion pyramid (FlashDepth is built on Depth
  Anything V2);
* a pre-norm residual Mamba (selective SSM) block applied to the bottleneck
  fusion output (``path4``, patch-grid resolution) — per-token temporal
  recurrence over the frame axis;
* final head = ``output_conv1`` -> bilinear x14 -> ``output_conv2`` with no
  final activation, then ``max(depth, 0)`` (the wrapper's clip).

TPU-first design: the recurrence is *functional* — the module is a
single-frame step ``(frame, state) -> (depth, state)`` and video clips run
through ``jax.lax.scan`` (:func:`flashdepth_video`), so XLA compiles ONE
step program and the temporal state (a few MB) stays device-resident. All
SSM math runs in fp32 (tiny tensors; numerical parity with the mirror), the
encoder/DPT in bf16 on the MXU.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

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
    _bilinear_ac,
)
from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS, DinoViT

State = Dict[str, jax.Array]


class MambaBlock(nn.Module):
    """One selective-SSM (Mamba-1) step over the frame axis.

    Tokens ``x`` (B, N, d_model) are updated independently per spatial
    position; the temporal dimension is the recurrence, carried in ``state``:

    * ``conv``: (B, N, d_conv-1, d_inner) — FIFO for the causal depthwise
      conv over time;
    * ``ssm``: (B, N, d_inner, d_state) fp32 — the SSM hidden state.

    Parameter names follow the official ``mamba_ssm`` module (in_proj,
    conv1d, x_proj, dt_proj, A_log, D, out_proj) so a real checkpoint maps
    1:1 through the converter.
    """

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, state: State) -> Tuple[jax.Array, State]:
        d_inner = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)
        x = x.astype(jnp.float32)

        xz = nn.Dense(2 * d_inner, use_bias=False, dtype=jnp.float32,
                      name="in_proj")(x)
        xi, z = jnp.split(xz, 2, axis=-1)

        # causal depthwise conv over TIME: window = d_conv-1 cached steps +
        # the current one (mamba_ssm Conv1d(groups=d_inner, k=d_conv))
        conv_w = self.param(
            "conv1d_kernel",
            nn.initializers.lecun_normal(),
            (self.d_conv, d_inner),
        )
        conv_b = self.param("conv1d_bias", nn.initializers.zeros, (d_inner,))
        window = jnp.concatenate(
            [state["conv"].astype(jnp.float32), xi[:, :, None]], axis=2
        )  # (B, N, d_conv, d_inner)
        xc = jnp.einsum("bnkd,kd->bnd", window, conv_w) + conv_b
        xc = nn.silu(xc)
        new_conv = window[:, :, 1:]

        # input-dependent SSM parameters
        dbc = nn.Dense(dt_rank + 2 * self.d_state, use_bias=False,
                       dtype=jnp.float32, name="x_proj")(xc)
        dt, B, C = jnp.split(dbc, [dt_rank, dt_rank + self.d_state], axis=-1)
        dt = nn.softplus(
            nn.Dense(d_inner, dtype=jnp.float32, name="dt_proj")(dt)
        )  # (B, N, d_inner)

        A_log = self.param(
            "A_log",
            lambda k, s: jnp.log(
                jnp.broadcast_to(jnp.arange(1, s[1] + 1, dtype=jnp.float32), s)
            ),
            (d_inner, self.d_state),
        )
        A = -jnp.exp(A_log.astype(jnp.float32))
        D = self.param("D", nn.initializers.ones, (d_inner,))

        h = state["ssm"].astype(jnp.float32)  # (B, N, d_inner, d_state)
        dA = jnp.exp(dt[..., None] * A)  # ZOH discretization
        dBx = dt[..., None] * B[:, :, None, :] * xc[..., None]
        h = dA * h + dBx
        y = jnp.einsum("bnds,bns->bnd", h, C) + D * xc
        y = y * nn.silu(z)
        out = nn.Dense(self.d_model, use_bias=False, dtype=jnp.float32,
                       name="out_proj")(y)
        return out, {"conv": new_conv, "ssm": h}


class TemporalDPTHead(nn.Module):
    """DA-V2 DPT head with a pre-norm residual Mamba block on the bottleneck
    fusion output (``path4``, patch-grid resolution — the cheapest level that
    still sees the full fused context). Component names match
    :class:`models.dpt.DPTHead` so the DA converter logic applies."""

    in_channels: int
    features: int = 64
    out_channels: Tuple[int, ...] = (48, 96, 192, 384)
    patch_size: int = 14
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, features, patch_hw: Tuple[int, int], state: State
    ) -> Tuple[jax.Array, State]:
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

        path4 = FeatureFusionBlock(self.features, self.dtype, name="refinenet4")(
            l4, size=l3.shape[1:3]
        )

        # temporal mixing: per-token Mamba over frames, pre-norm residual
        b, hh, ww, c = path4.shape
        tok = path4.reshape(b, hh * ww, c)
        t = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="temporal_norm")(tok.astype(jnp.float32))
        m, new_state = MambaBlock(
            c, self.d_state, self.d_conv, self.expand, name="mamba"
        )(t, state)
        path4 = (tok.astype(jnp.float32) + m).astype(self.dtype).reshape(
            b, hh, ww, c
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

        # final head (wrapper.py:22 final_head(dpt_features, ph, pw)); no
        # final activation — the wrapper clips at 0 outside
        out = nn.Conv(self.features // 2, (3, 3), padding=1, dtype=self.dtype,
                      name="output_conv1")(path1)
        out = _bilinear_ac(out, (ph * self.patch_size, pw * self.patch_size))
        out = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                      name="output_conv2_0")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), dtype=self.dtype, name="output_conv2_2")(out)
        return out[..., 0].astype(jnp.float32), new_state


class FlashDepth(nn.Module):
    """Single-frame temporal step: ``(frame, state) -> (depth, state)``.

    ``frame``: preprocessed (B, H, W, 3), H/W multiples of 14. A fresh state
    (= ``start_new_sequence()``, wrapper.py:13) comes from
    :func:`flashdepth_init_state`; video clips run via
    :func:`flashdepth_video`.
    """

    encoder: str = "vits"
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # test-size overrides (None -> encoder presets)
    vit_config: Any = None
    head_features: Any = None
    head_out_channels: Any = None
    out_indices: Any = None

    @nn.compact
    def __call__(
        self, frame: jax.Array, state: State
    ) -> Tuple[jax.Array, State]:
        vit_cfg = self.vit_config or VIT_CONFIGS[self.encoder]
        head_cfg = HEAD_CONFIGS.get(self.encoder, {})
        features_dim = self.head_features or head_cfg["features"]
        out_channels = self.head_out_channels or head_cfg["out_channels"]
        out_indices = self.out_indices or INTERMEDIATE_LAYER_IDX[self.encoder]
        ph = frame.shape[1] // vit_cfg.patch_size
        pw = frame.shape[2] // vit_cfg.patch_size

        feats = DinoViT(
            vit_cfg, out_indices=out_indices, dtype=self.dtype,
            attn_impl=self.attn_impl, name="pretrained",
        )(frame)
        depth, new_state = TemporalDPTHead(
            in_channels=vit_cfg.dim,
            features=features_dim,
            out_channels=tuple(out_channels),
            d_state=self.d_state,
            d_conv=self.d_conv,
            expand=self.expand,
            dtype=self.dtype,
            name="depth_head",
        )(feats, (ph, pw), state)
        # wrapper.py:23 torch.clip(pred_depth, min=0)
        return jnp.maximum(depth, 0.0), new_state


def flashdepth_init_state(
    model: FlashDepth, batch: int, patch_hw: Tuple[int, int]
) -> State:
    """Zero temporal state (upstream ``mamba.start_new_sequence()``)."""
    features = model.head_features or HEAD_CONFIGS[model.encoder]["features"]
    d_inner = model.expand * features
    n = patch_hw[0] * patch_hw[1]
    return {
        "conv": jnp.zeros((batch, n, model.d_conv - 1, d_inner), jnp.float32),
        "ssm": jnp.zeros((batch, n, d_inner, model.d_state), jnp.float32),
    }


def flashdepth_video(
    model: FlashDepth,
    params: Any,
    frames: jax.Array,
    state: Optional[State] = None,
) -> Tuple[jax.Array, State]:
    """Run a clip (B, S, H, W, 3) through one compiled step under
    ``lax.scan`` (the reference loops frames in Python with hidden module
    state, infer.py:104-130). Returns depths (B, S, H', W') + final state."""
    vit_cfg = model.vit_config or VIT_CONFIGS[model.encoder]
    ph = frames.shape[2] // vit_cfg.patch_size
    pw = frames.shape[3] // vit_cfg.patch_size
    if state is None:
        state = flashdepth_init_state(model, frames.shape[0], (ph, pw))

    def body(st, frame):
        depth, st2 = model.apply({"params": params}, frame, st)
        return st2, depth

    final_state, depths = jax.lax.scan(
        body, state, jnp.moveaxis(frames, 1, 0)
    )
    return jnp.moveaxis(depths, 0, 1), final_state
