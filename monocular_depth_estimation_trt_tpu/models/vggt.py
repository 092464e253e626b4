"""VGGT: multi-view geometry transformer (aggregator + depth/camera heads).

Reference serving contract (``VGGT/onnx_export2.py``, ``onnx2trt2.py``):
input (B, S, 518, 518, 3) normalized views; a ~1B-param aggregator produces
``aggregated_tokens_list`` — per-layer tokens (L_sel, B, S, 1374, 2048) — that
feed a DPT depth head (depth + confidence per view) and a camera head
(``pose_enc`` = [tx ty tz, qx qy qz qw, fov_h fov_w] per view — quaternion is
scalar-LAST, matching upstream VGGT's ``quat_to_mat`` XYZW convention). The reference
chains three TRT engines with device-to-device copies
(``onnx2trt2.py:155-208``); here the stages are jitted functions sharing
device-resident arrays (``runtime/pipeline.py``), or one fused program.

Architecture (VGGT, Wang et al. CVPR 2025):
* patch tokens from a DINOv2 ViT-L/14 feature extractor (1024-d);
* per view: 1369 patch tokens + 1 camera token + 4 register tokens = 1374;
* 24 alternating-attention blocks: each runs *frame* self-attention (tokens
  of one view attend within the view: batch B*S) then *global* attention
  (all views jointly: batch B, sequence S*1374), both with 2D RoPE on patch
  tokens; outputs of the two sub-blocks are concatenated (2048-d) per layer
  for the heads;
* DPT head over 4 selected layers -> depth + confidence; camera head =
  small transformer trunk on the camera token -> 9-d pose encoding.

The RoPE here is computed directly with broadcasted iotas — the reference
needed upstream graph surgery to remove ``cartesian_prod`` for ONNX export
(``VGGT/onnx_export.py:13-22``); no such workaround is needed in JAX.

TP sharding: the aggregator's attention/MLP weights match
``parallel.sharding.vit_tp_rules`` (qkv/fc1 column-, proj/fc2 row-parallel),
the one model in the zoo where multi-chip tensor parallelism pays off.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from monocular_depth_estimation_trt_tpu.models.dpt import DPTHead
from monocular_depth_estimation_trt_tpu.models.vit import DinoViT, LayerScale, Mlp
from monocular_depth_estimation_trt_tpu.ops.quant import make_dense


def rope_2d_freqs(ph: int, pw: int, head_dim: int, base: float = 100.0):
    """2D rotary position tables for a (ph, pw) patch grid.

    Half the head dims rotate with the y coordinate, half with x (standard
    2D axial RoPE). Returns (cos, sin) of shape (ph*pw, head_dim//2)."""
    d4 = head_dim // 4
    freqs = 1.0 / (base ** (np.arange(d4) / d4))  # (d4,)
    ys = jax.lax.broadcasted_iota(jnp.float32, (ph, pw), 0).reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (ph, pw), 1).reshape(-1)
    ang_y = ys[:, None] * freqs[None]  # (N, d4)
    ang_x = xs[:, None] * freqs[None]
    ang = jnp.concatenate([ang_y, ang_x], axis=-1)  # (N, d2)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(q: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """q: (..., N, d); rotate pairs (even, odd) by the per-position angles."""
    q1 = q[..., 0::2]
    q2 = q[..., 1::2]
    rq1 = q1 * cos - q2 * sin
    rq2 = q1 * sin + q2 * cos
    out = jnp.stack([rq1, rq2], axis=-1)
    return out.reshape(q.shape)


class RopeAttention(nn.Module):
    """Self-attention with 2D RoPE applied to patch tokens only (the leading
    ``special`` tokens — camera + registers — are left unrotated)."""

    dim: int
    num_heads: int
    num_special: int
    grid_hw: Tuple[int, int]
    dtype: Any = jnp.bfloat16
    # int8 w8a8 serving for qkv/proj (ops/quant.py); "none"|"calib"|"serve"
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array, views: int = 1,
                 causal: bool = False) -> jax.Array:
        b, n, _ = x.shape
        hd = self.dim // self.num_heads
        qkv = make_dense(self.quant, self.dim * 3, dtype=self.dtype,
                         name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q = jnp.swapaxes(q, 1, 2)  # (B, H, N, d)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)

        ph, pw = self.grid_hw
        n_per_view = self.num_special + ph * pw
        cos, sin = rope_2d_freqs(ph, pw, hd)
        cos = cos.astype(self.dtype)
        sin = sin.astype(self.dtype)

        def rotate(t):
            # t: (B, H, N, d) where N = views * n_per_view
            tv = t.reshape(b, self.num_heads, views, n_per_view, hd)
            special = tv[:, :, :, : self.num_special]
            patches = tv[:, :, :, self.num_special :]
            patches = apply_rope(patches, cos, sin)
            return jnp.concatenate([special, patches], axis=3).reshape(t.shape)

        q = rotate(q)
        k = rotate(k)

        if (not causal and jax.default_backend() == "tpu"
                and self.num_heads >= 12 and n >= 1024):
            from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
                flash_attention,
            )

            o = flash_attention(q, k, v)
        else:
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
            s = s / np.sqrt(hd)
            if causal and views > 1:
                # view-causal: tokens of view s attend only to views <= s
                # (StreamVGGT's streaming semantics — within a view attention
                # stays full)
                vid = jnp.arange(n) // n_per_view
                allowed = vid[:, None] >= vid[None, :]
                s = jnp.where(allowed[None, None], s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = jnp.swapaxes(o, 1, 2).reshape(b, n, self.dim)
        return make_dense(self.quant, self.dim, dtype=self.dtype,
                          name="proj")(o)


class AASubBlock(nn.Module):
    """One pre-norm transformer block with RoPE attention (frame or global)."""

    dim: int
    num_heads: int
    num_special: int
    grid_hw: Tuple[int, int]
    dtype: Any = jnp.bfloat16
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array, views: int = 1,
                 causal: bool = False) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = RopeAttention(self.dim, self.num_heads, self.num_special,
                          self.grid_hw, self.dtype, quant=self.quant,
                          name="attn")(h, views, causal)
        x = x + LayerScale(self.dim, 0.01, dtype=self.dtype, name="ls1")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = Mlp(self.dim, self.dim * 4, dtype=self.dtype, quant=self.quant,
                name="mlp")(h)
        x = x + LayerScale(self.dim, 0.01, dtype=self.dtype, name="ls2")(h)
        return x


@dataclasses.dataclass(frozen=True)
class VGGTConfig:
    dim: int = 1024
    depth: int = 24  # alternating-attention blocks (each = frame + global)
    num_heads: int = 16
    patch_size: int = 14
    num_register_tokens: int = 4
    head_layers: Tuple[int, ...] = (4, 11, 17, 23)
    encoder: str = "vitl"  # DINOv2 patch-feature extractor
    # Explicit ViT override for tiny test/dryrun configs (avoids mutating the
    # global VIT_CONFIGS table); None -> VIT_CONFIGS[encoder].
    vit_config: Any = None
    head_features: int = 256
    head_out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    # view-causal global attention (StreamVGGT semantics; the KV-cache
    # streaming path in models/streamvggt.py is exactly equivalent to this)
    causal: bool = False


class Aggregator(nn.Module):
    """Input: views (B, S, H, W, 3) normalized. Output: list of per-selected-
    layer tokens (B, S, 1374, 2*dim) (frame||global concat, the reference's
    ``aggregated_tokens_list``) plus (ph, pw)."""

    cfg: VGGTConfig = VGGTConfig()
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # int8 w8a8 serving for the DINOv2 extractor + alternating-attention
    # Dense layers (ops/quant.py) — ~1B params: int8 halves the weight
    # traffic AND doubles MXU TOPS on the compute-bound end
    quant: str = "none"

    @nn.compact
    def __call__(self, views: jax.Array):
        c = self.cfg
        b, s, H, W, _ = views.shape
        ph, pw = H // c.patch_size, W // c.patch_size
        flat = views.reshape(b * s, H, W, 3)

        # DINOv2 patch features (the VGGT patch embed is a full DINOv2 ViT)
        from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS

        vit_cfg = c.vit_config or VIT_CONFIGS[c.encoder]
        feats = DinoViT(
            vit_cfg,
            out_indices=(vit_cfg.depth - 1,),
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
            name="patch_embed",
        )(flat)
        patch_tokens = feats[0][0]  # (B*S, ph*pw, 1024)
        if patch_tokens.shape[-1] != c.dim:
            patch_tokens = make_dense(self.quant, c.dim, dtype=self.dtype,
                                      name="input_proj")(patch_tokens)

        camera_token = self.param(
            "camera_token", nn.initializers.normal(0.02), (1, 1, c.dim)
        ).astype(self.dtype)
        register_tokens = self.param(
            "register_tokens",
            nn.initializers.normal(0.02),
            (1, c.num_register_tokens, c.dim),
        ).astype(self.dtype)
        num_special = 1 + c.num_register_tokens

        tokens = jnp.concatenate(
            [
                jnp.broadcast_to(camera_token, (b * s, 1, c.dim)),
                jnp.broadcast_to(
                    register_tokens, (b * s, c.num_register_tokens, c.dim)
                ),
                patch_tokens,
            ],
            axis=1,
        )  # (B*S, 1374, dim)
        n_view = tokens.shape[1]

        head_set = set(c.head_layers)
        saved = {}
        x = tokens
        for i in range(c.depth):
            # frame attention: within each view
            x = AASubBlock(c.dim, c.num_heads, num_special, (ph, pw),
                           self.dtype, quant=self.quant,
                           name=f"frame_{i}")(x, views=1)
            frame_out = x
            # global attention: across all views of a batch element
            xg = x.reshape(b, s * n_view, c.dim)
            xg = AASubBlock(c.dim, c.num_heads, num_special, (ph, pw),
                            self.dtype, quant=self.quant,
                            name=f"global_{i}")(
                xg, views=s, causal=c.causal)
            x = xg.reshape(b * s, n_view, c.dim)
            if i in head_set:
                cat = jnp.concatenate([frame_out, x], axis=-1)  # (B*S, N, 2dim)
                saved[i] = cat.reshape(b, s, n_view, 2 * c.dim)
        # duplicates/order allowed, as in DinoViT intermediate taps
        outputs = [saved[i] for i in c.head_layers]
        return outputs, (ph, pw)


class CameraHead(nn.Module):
    """Iterative camera head (upstream VGGT ``camera_head.py`` design):
    the camera token passes through a trunk of transformer blocks whose
    input is adaLN-modulated by an embedding of the current pose estimate;
    each iteration emits a pose delta. Output pose encoding (B, S, 9):
    [tx ty tz, qx qy qz qw, fov_h fov_w] — quaternion scalar-last (upstream
    VGGT ``quat_to_mat`` XYZW; reference ``onnx2trt2.py:240``); activations
    trans/quat linear, fov relu (upstream ``activate_pose``). The quaternion
    is left unnormalized as upstream; ``extrinsics_from_quat_trans``
    normalizes during decoding."""

    dim: int = 2048
    trunk_depth: int = 4
    num_heads: int = 16
    num_iterations: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens: jax.Array,
                 key_mask: Any = None) -> jax.Array:
        # tokens: last aggregated layer (B, S, N, 2dim) -> camera token per
        # view; or pre-extracted camera tokens (B, S, 2dim) (streaming path).
        # key_mask (S,) bool: valid view slots (streaming ring buffer).
        cam = tokens[:, :, 0] if tokens.ndim == 4 else tokens  # (B, S, 2dim)
        b, s, _ = cam.shape
        pose_tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                   name="token_norm")(cam)

        embed_pose = nn.Dense(self.dim, dtype=self.dtype, name="embed_pose")
        modulation = nn.Dense(3 * self.dim, dtype=self.dtype,
                              name="poseLN_modulation")
        # elementwise_affine=False adaLN norm
        adaln = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                             dtype=self.dtype, name="adaln_norm")

        # create every trunk submodule ONCE (names are reused across the
        # refinement iterations — flax requires single construction)
        trunk_mods = []
        for i in range(self.trunk_depth):
            trunk_mods.append(dict(
                norm1=nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                   name=f"trunk_{i}_norm1"),
                qkv=nn.Dense(self.dim * 3, dtype=self.dtype,
                             name=f"trunk_{i}_qkv"),
                proj=nn.Dense(self.dim, dtype=self.dtype,
                              name=f"trunk_{i}_proj"),
                ls1=LayerScale(self.dim, 0.01, dtype=self.dtype,
                               name=f"trunk_{i}_ls1"),
                norm2=nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                   name=f"trunk_{i}_norm2"),
                mlp=Mlp(self.dim, self.dim * 4, dtype=self.dtype,
                        name=f"trunk_{i}_mlp"),
                ls2=LayerScale(self.dim, 0.01, dtype=self.dtype,
                               name=f"trunk_{i}_ls2"),
            ))
        pose_branch_fc1 = nn.Dense(self.dim // 2, dtype=self.dtype,
                                   name="pose_branch_fc1")
        pose_branch_fc2 = nn.Dense(9, dtype=self.dtype, name="pose_branch_fc2")

        hd = self.dim // self.num_heads

        def trunk(x):
            for m in trunk_mods:
                h = m["norm1"](x)
                qkv = m["qkv"](h)
                q, k, v = jnp.moveaxis(
                    qkv.reshape(b, s, 3, self.num_heads, hd), 2, 0
                )
                att = jnp.einsum("bshd,bthd->bhst", q, k).astype(
                    jnp.float32
                ) / np.sqrt(hd)
                if key_mask is not None:
                    att = jnp.where(key_mask[None, None, None, :], att,
                                    -jnp.inf)
                p = jax.nn.softmax(att, axis=-1).astype(v.dtype)
                o = jnp.einsum("bhst,bthd->bshd", p, v).reshape(b, s, self.dim)
                x = x + m["ls1"](m["proj"](o))
                x = x + m["ls2"](m["mlp"](m["norm2"](x)))
            return x

        pred = jnp.zeros((b, s, 9), jnp.float32)
        for _ in range(self.num_iterations):
            emb = nn.silu(embed_pose(pred.astype(self.dtype)))
            shift, scale, gate = jnp.split(modulation(emb), 3, axis=-1)
            mod = gate * (adaln(pose_tokens) * (1.0 + scale) + shift)
            x = trunk(pose_tokens + mod)
            delta = pose_branch_fc2(
                nn.gelu(pose_branch_fc1(x), approximate=False)
            ).astype(jnp.float32)
            pred = pred + delta

        # activate_pose: trans/quat linear, fov relu
        t, quat, fov = pred[..., :3], pred[..., 3:7], pred[..., 7:9]
        fov = nn.relu(fov)
        return jnp.concatenate([t, quat, fov], axis=-1)


def apply_view_dpt(dpt: DPTHead, agg_tokens, patch_hw, num_special: int):
    """Run a DPT trunk over multi-view aggregated tokens: fold (B, S) into
    the batch, drop the special tokens, and return the raw head output
    (B*S, ph*p, pw*p, C) plus (b, s) for the caller's reshape — the shared
    wrapper for every VGGT-family dense head (depth / point / MapAnything)."""
    ph, pw = patch_hw
    b, s = agg_tokens[0].shape[:2]
    feats = []
    for t in agg_tokens:
        patches = t[:, :, num_special:]  # (B, S, ph*pw, 2dim)
        feats.append(
            (patches.reshape(b * s, ph * pw, patches.shape[-1]), None)
        )
    return dpt(feats, (ph, pw)), b, s


class VGGTDepthHead(nn.Module):
    """Single DPT head over aggregated tokens -> 2 channels per view:
    depth (exp activation) + confidence (1 + exp, upstream ``expp1``) —
    the upstream VGGT depth head packs both into one head
    (``VGGT/onnx_export2.py:24-26`` output pair)."""

    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, agg_tokens, patch_hw, num_special: int):
        ph, pw = patch_hw
        dpt = DPTHead(
            in_channels=agg_tokens[0].shape[-1],
            features=self.features,
            out_channels=self.out_channels,
            final_act="none",
            num_outputs=2,
            dtype=self.dtype,
            name="dpt",
        )
        out, b, s = apply_view_dpt(dpt, agg_tokens, patch_hw, num_special)
        depth = jnp.exp(jnp.clip(out[..., 0], -10.0, 10.0))
        conf = 1.0 + jnp.exp(jnp.clip(out[..., 1], -10.0, 10.0))
        H, W = ph * dpt.patch_size, pw * dpt.patch_size
        return (
            depth.reshape(b, s, H, W),
            conf.reshape(b, s, H, W),
        )


class VGGTPointHead(nn.Module):
    """Upstream VGGT's second dense head: 4 channels per view — pts3d with
    the sign-preserving ``inv_log`` activation (xyz = sign(u)*(e^{|u|}-1))
    + confidence (``expp1``). STream3R reuses this head family causally
    (reference ``later/STream3R/README.md``: streaming images -> per-frame
    pointmaps)."""

    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, agg_tokens, patch_hw, num_special: int):
        ph, pw = patch_hw
        dpt = DPTHead(
            in_channels=agg_tokens[0].shape[-1],
            features=self.features,
            out_channels=self.out_channels,
            final_act="none",
            num_outputs=4,
            dtype=self.dtype,
            name="dpt",
        )
        out, b, s = apply_view_dpt(dpt, agg_tokens, patch_hw, num_special)
        xyz = out[..., :3]
        pts = jnp.sign(xyz) * jnp.expm1(jnp.clip(jnp.abs(xyz), 0.0, 10.0))
        conf = 1.0 + jnp.exp(jnp.clip(out[..., 3], -10.0, 10.0))
        H, W = ph * dpt.patch_size, pw * dpt.patch_size
        return pts.reshape(b, s, H, W, 3), conf.reshape(b, s, H, W)


def build_stage_pipeline(
    params,
    cfg: "VGGTConfig" = None,
    dtype: Any = jnp.bfloat16,
    attn_impl: str = "auto",
):
    """The reference's 3-engine chained pipeline (``VGGT/onnx2trt2.py:155-208``)
    as a :class:`~runtime.pipeline.DevicePipeline`: aggregator ->
    (depth_head, camera_head), intermediate tokens device-resident (the D2D
    chaining is implicit in JAX). Stages are independently jitted, so heads
    can be skipped/swapped per request — or call ``.fused()`` to let XLA
    schedule the whole graph as one program.

    ``params`` is the full VGGT param tree (keys aggregator / depth_head /
    camera_head).
    """
    from monocular_depth_estimation_trt_tpu.runtime.pipeline import (
        DevicePipeline,
        Stage,
    )

    cfg = cfg or VGGTConfig()
    num_special = 1 + cfg.num_register_tokens
    agg = Aggregator(cfg, dtype, attn_impl)
    dh = VGGTDepthHead(features=cfg.head_features,
                       out_channels=cfg.head_out_channels, dtype=dtype)
    ch = CameraHead(2 * cfg.dim, num_heads=cfg.num_heads, dtype=dtype)

    def agg_fn(views):
        outs, _ = agg.apply({"params": params["aggregator"]}, views)
        # single named output holding the tuple of per-layer token arrays
        return (tuple(outs),)

    def _patch_hw(tokens):
        n_patch = tokens[0].shape[2] - num_special
        side = int(round(n_patch**0.5))
        return side, side

    def depth_fn(tokens):
        return dh.apply(
            {"params": params["depth_head"]}, list(tokens), _patch_hw(tokens),
            num_special,
        )

    def camera_fn(tokens):
        return ch.apply({"params": params["camera_head"]}, tokens[-1])

    return DevicePipeline(
        [
            Stage("aggregator", agg_fn, ["views"], ["tokens"]),
            Stage("depth_head", depth_fn, ["tokens"], ["depth", "depth_conf"]),
            Stage("camera_head", camera_fn, ["tokens"], ["pose_enc"]),
        ]
    )


class VGGT(nn.Module):
    """Full model: views (B, S, H, W, 3) -> dict(depth, depth_conf, pose_enc).

    Matches the reference 3-engine pipeline outputs (``VGGT/onnx2trt2.py``).
    """

    cfg: VGGTConfig = VGGTConfig()
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    with_camera: bool = True
    with_point_head: bool = False
    # int8 w8a8 serving for the aggregator (ops/quant.py); the DPT/camera
    # heads stay bf16 (conv-dominated / tiny)
    quant: str = "none"

    @nn.compact
    def __call__(self, views: jax.Array):
        agg, patch_hw = Aggregator(self.cfg, self.dtype, self.attn_impl,
                                   quant=self.quant, name="aggregator")(views)
        num_special = 1 + self.cfg.num_register_tokens
        depth, conf = VGGTDepthHead(
            features=self.cfg.head_features,
            out_channels=self.cfg.head_out_channels,
            dtype=self.dtype, name="depth_head",
        )(agg, patch_hw, num_special)
        out = {"depth": depth, "depth_conf": conf}
        if self.with_point_head:
            pts, pconf = VGGTPointHead(
                features=self.cfg.head_features,
                out_channels=self.cfg.head_out_channels,
                dtype=self.dtype, name="point_head",
            )(agg, patch_hw, num_special)
            out["world_points"] = pts
            out["world_points_conf"] = pconf
        if self.with_camera:
            out["pose_enc"] = CameraHead(
                2 * self.cfg.dim, num_heads=self.cfg.num_heads,
                dtype=self.dtype, name="camera_head",
            )(agg[-1])
        return out
