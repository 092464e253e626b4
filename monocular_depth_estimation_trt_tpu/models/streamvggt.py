"""StreamVGGT: causal KV-cache streaming over the VGGT aggregator.

The reference could only export StreamVGGT's single-frame wrapper — its
KV-cache streaming inference is NOT exported (``StreamVGGT/onnx_export.py:
25-55``, single-frame only), so its TRT path recomputes everything per frame.
This module exceeds that: per new view, the frame-attention blocks run on the
view's own tokens and the global-attention blocks attend to cached keys/
values of previous views, so the per-step cost is ~independent of the window
length (one view's tokens through 2x24 blocks + one KV write per layer).

Exactness: stepping with the cache is EXACTLY the view-causal VGGT
(``VGGTConfig(causal=True)``) evaluated on the full sequence — gated by
``tests/test_streamvggt.py``. The cache is a fixed-capacity ring (static
shapes for XLA): once ``max_views`` is exceeded the oldest view's K/V slots
are overwritten, i.e. attention runs over a sliding window. RoPE is per-view
(2D over the patch grid), so evicting a view never invalidates other slots.

Parameter compatibility: submodule names match ``models/vggt.py`` exactly
(``aggregator/patch_embed``, ``aggregator/frame_i``, ``aggregator/global_i``,
``depth_head``, ``camera_head``), so ONE weight tree (and the
``convert_vggt`` output) serves both the joint and the streaming model.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from monocular_depth_estimation_trt_tpu.models.vggt import (
    AASubBlock,
    CameraHead,
    VGGTConfig,
    VGGTDepthHead,
    VGGTPointHead,
    apply_rope,
    rope_2d_freqs,
)
from monocular_depth_estimation_trt_tpu.models.vit import VIT_CONFIGS, DinoViT, LayerScale, Mlp
from monocular_depth_estimation_trt_tpu.ops.quant import make_dense


def init_stream_cache(cfg: VGGTConfig, batch: int, grid_hw: Tuple[int, int],
                      max_views: int, dtype=jnp.bfloat16) -> Dict:
    """Zeroed per-global-layer K/V ring buffers, the camera-token ring, and
    the step counter."""
    ph, pw = grid_hw
    n_view = 1 + cfg.num_register_tokens + ph * pw
    hd = cfg.dim // cfg.num_heads
    kv = {
        f"global_{i}": {
            "k": jnp.zeros((batch, cfg.num_heads, max_views * n_view, hd), dtype),
            "v": jnp.zeros((batch, cfg.num_heads, max_views * n_view, hd), dtype),
        }
        for i in range(cfg.depth)
    }
    return {
        "kv": kv,
        # aggregated camera token (frame||global concat) per window slot —
        # the camera head trunk attends across views, so the streaming path
        # re-runs it over the (tiny) buffered tokens each step
        "cam": jnp.zeros((batch, max_views, 2 * cfg.dim), jnp.float32),
        "t": jnp.zeros((), jnp.int32),
    }


class CachedRopeAttention(nn.Module):
    """RopeAttention with a KV ring cache (Dense names qkv/proj identical
    to models/vggt.py::RopeAttention)."""

    dim: int
    num_heads: int
    num_special: int
    grid_hw: Tuple[int, int]
    max_views: int
    dtype: Any = jnp.bfloat16
    # int8 w8a8 serving (ops/quant.py); shares the q8 scales calibrated on
    # the joint model (identical param paths)
    quant: str = "none"

    @nn.compact
    def __call__(self, h: jax.Array, cache_k, cache_v, t):
        b, n, _ = h.shape  # n = one view's tokens
        hd = self.dim // self.num_heads
        qkv = make_dense(self.quant, self.dim * 3, dtype=self.dtype,
                         name="qkv")(h)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q = jnp.swapaxes(q, 1, 2)  # (B, H, n, d)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)

        ph, pw = self.grid_hw
        cos, sin = rope_2d_freqs(ph, pw, hd)
        cos = cos.astype(self.dtype)
        sin = sin.astype(self.dtype)

        def rotate(tns):
            special = tns[:, :, : self.num_special]
            patches = apply_rope(tns[:, :, self.num_special :], cos, sin)
            return jnp.concatenate([special, patches], axis=2)

        q = rotate(q)
        k = rotate(k)

        # ring write: slot (t mod max_views), n tokens wide
        slot = (t % self.max_views) * n
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k.astype(cache_k.dtype), (0, 0, slot, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v.astype(cache_v.dtype), (0, 0, slot, 0))

        valid = jnp.minimum(t + 1, self.max_views) * n
        key_ok = jnp.arange(cache_k.shape[2]) < valid  # (C,)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, cache_k.astype(q.dtype))
        s = s.astype(jnp.float32) / np.sqrt(hd)
        s = jnp.where(key_ok[None, None, None, :], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, cache_v.astype(v.dtype))
        o = jnp.swapaxes(o, 1, 2).reshape(b, n, self.dim)
        o = make_dense(self.quant, self.dim, dtype=self.dtype,
                       name="proj")(o)
        return o, cache_k, cache_v


class CachedGlobalBlock(nn.Module):
    """AASubBlock with KV-cached global attention for ONE new view.

    Submodule names identical to AASubBlock (norm1/attn{qkv,proj}/ls1/
    norm2/mlp/ls2) so the parameter tree is shared with the joint model."""

    dim: int
    num_heads: int
    num_special: int
    grid_hw: Tuple[int, int]
    max_views: int
    dtype: Any = jnp.bfloat16
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array, cache_k, cache_v, t):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        o, cache_k, cache_v = CachedRopeAttention(
            self.dim, self.num_heads, self.num_special, self.grid_hw,
            self.max_views, self.dtype, quant=self.quant, name="attn",
        )(h, cache_k, cache_v, t)
        x = x + LayerScale(self.dim, 0.01, dtype=self.dtype, name="ls1")(o)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = Mlp(self.dim, self.dim * 4, dtype=self.dtype, quant=self.quant,
                name="mlp")(h)
        x = x + LayerScale(self.dim, 0.01, dtype=self.dtype, name="ls2")(h)
        return x, cache_k, cache_v


class StreamingVGGT(nn.Module):
    """One causal step: view (B, H, W, 3) + cache -> outputs for this view
    + updated cache. Parameter tree == models/vggt.py::VGGT."""

    cfg: VGGTConfig = VGGTConfig()
    max_views: int = 8
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    with_camera: bool = False
    # STream3R serving (later/STream3R): causal per-frame pointmaps via the
    # upstream point-head family on the same cached aggregator pass
    with_point_head: bool = False
    # int8 w8a8 streaming: identical param paths to the joint model mean the
    # q8 collection calibrated there serves here unchanged
    quant: str = "none"

    @nn.compact
    def __call__(self, view: jax.Array, cache: Dict):
        c = self.cfg
        b, H, W, _ = view.shape
        ph, pw = H // c.patch_size, W // c.patch_size
        num_special = 1 + c.num_register_tokens

        # scope "aggregator" to mirror the joint model's tree
        class _Agg(nn.Module):
            cfg: VGGTConfig
            max_views: int
            dtype: Any
            attn_impl: str
            quant: str = "none"

            @nn.compact
            def __call__(self, flat, cache):
                cc = self.cfg
                vit_cfg = cc.vit_config or VIT_CONFIGS[cc.encoder]
                feats = DinoViT(
                    vit_cfg,
                    out_indices=(vit_cfg.depth - 1,),
                    dtype=self.dtype,
                    attn_impl=self.attn_impl,
                    quant=self.quant,
                    name="patch_embed",
                )(flat)
                patch_tokens = feats[0][0]
                if patch_tokens.shape[-1] != cc.dim:
                    patch_tokens = make_dense(
                        self.quant, cc.dim, dtype=self.dtype,
                        name="input_proj")(patch_tokens)
                camera_token = self.param(
                    "camera_token", nn.initializers.normal(0.02), (1, 1, cc.dim)
                ).astype(self.dtype)
                register_tokens = self.param(
                    "register_tokens", nn.initializers.normal(0.02),
                    (1, cc.num_register_tokens, cc.dim),
                ).astype(self.dtype)
                bb = patch_tokens.shape[0]
                x = jnp.concatenate(
                    [
                        jnp.broadcast_to(camera_token, (bb, 1, cc.dim)),
                        jnp.broadcast_to(register_tokens,
                                         (bb, cc.num_register_tokens, cc.dim)),
                        patch_tokens,
                    ],
                    axis=1,
                )

                t = cache["t"]
                new_kv = {}
                head_set = set(cc.head_layers)
                saved = {}
                for i in range(cc.depth):
                    x = AASubBlock(cc.dim, cc.num_heads, num_special, (ph, pw),
                                   self.dtype, quant=self.quant,
                                   name=f"frame_{i}")(x, views=1)
                    frame_out = x
                    kv = cache["kv"][f"global_{i}"]
                    x, nk, nv = CachedGlobalBlock(
                        cc.dim, cc.num_heads, num_special, (ph, pw),
                        self.max_views, self.dtype, quant=self.quant,
                        name=f"global_{i}",
                    )(x, kv["k"], kv["v"], t)
                    new_kv[f"global_{i}"] = {"k": nk, "v": nv}
                    if i in head_set:
                        cat = jnp.concatenate([frame_out, x], axis=-1)
                        saved[i] = cat[:, None]  # (B, S=1, N, 2dim)
                outs = [saved[i] for i in cc.head_layers]
                # camera-token ring write (slot = t mod max_views)
                cam_tok = outs[-1][:, 0, 0].astype(jnp.float32)  # (B, 2dim)
                slot = t % self.max_views
                cam = jax.lax.dynamic_update_slice(
                    cache["cam"], cam_tok[:, None], (0, slot, 0)
                )
                return outs, {"kv": new_kv, "cam": cam, "t": t + 1}

        outs, new_cache = _Agg(c, self.max_views, self.dtype, self.attn_impl,
                               quant=self.quant,
                               name="aggregator")(view, cache)
        depth, conf = VGGTDepthHead(
            features=c.head_features, out_channels=c.head_out_channels,
            dtype=self.dtype, name="depth_head",
        )(outs, (ph, pw), num_special)
        out = {"depth": depth[:, 0], "depth_conf": conf[:, 0]}
        if self.with_point_head:
            pts, pconf = VGGTPointHead(
                features=c.head_features, out_channels=c.head_out_channels,
                dtype=self.dtype, name="point_head",
            )(outs, (ph, pw), num_special)
            out["world_points"] = pts[:, 0]
            out["world_points_conf"] = pconf[:, 0]
        if self.with_camera:
            # the camera head attends across views; run it over the buffered
            # camera tokens with the valid-slot mask and read this step's slot
            t_prev = cache["t"]
            valid = jnp.arange(self.max_views) < jnp.minimum(
                t_prev + 1, self.max_views
            )
            poses = CameraHead(
                2 * c.dim, num_heads=c.num_heads, dtype=self.dtype,
                name="camera_head",
            )(new_cache["cam"].astype(self.dtype), key_mask=valid)
            slot = t_prev % self.max_views
            out["pose_enc"] = jax.lax.dynamic_slice_in_dim(
                poses, slot, 1, axis=1
            )[:, 0]
        return out, new_cache
