"""DINOv2-style Vision Transformer encoder (Flax, channels-last, bf16-first).

This is the shared backbone behind most of the model zoo — Depth Anything
V2/V3/AC, Distill Any Depth, Depth Pro, UniDepth V2, UniK3D, Metric3D V2,
MoGe-2 all encode with DINOv2 ViTs (reference model table,
``README.md:36-49``; e.g. encoder configs in
``Depth_Anything_V2/infer.py:46-53``).

Architectural notes (faithful to DINOv2 so torch checkpoints convert 1:1):

* patch embed: 14x14 stride-14 conv; cls token; learned pos embed trained at
  518x518 (37x37 grid), bicubically interpolated for other input sizes;
* pre-norm blocks with LayerScale on both branches; exact (erf) GELU MLP;
  ViT-g uses a fused SwiGLU FFN;
* optional register tokens (DINOv2-reg checkpoints, used by UniDepth/UniK3D);
* ``get_intermediate_layers`` semantics match DINOv2: selected block outputs
  with the final LayerNorm applied, returned as (patch_tokens, cls_token) —
  what the DPT heads consume (reference DA-V2 pipeline).

TPU-first choices: NHWC patchify (native conv layout), tokens kept as
(B, N, D) matmuls on the MXU, attention via the Pallas flash kernel
(``ops/pallas/flash_attention.py``) with an XLA fallback on CPU.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from monocular_depth_estimation_trt_tpu.ops.quant import make_dense
from monocular_depth_estimation_trt_tpu.ops.resize import resample_matrix


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    dim: int
    depth: int
    num_heads: int
    patch_size: int = 14
    mlp_ratio: float = 4.0
    ffn: str = "mlp"  # "mlp" | "swiglu"
    num_register_tokens: int = 0
    pretrain_img_size: int = 518
    layerscale_init: float = 1e-5
    qkv_bias: bool = True
    # DINOv3-style position handling: 2D axial RoPE on patch tokens in every
    # attention layer instead of an interpolated learned table (reference
    # later/DINOv3/ — resolution-free by construction)
    rope: bool = False
    rope_base: float = 100.0
    pos_embed: bool = True

    @property
    def pretrain_grid(self) -> int:
        return self.pretrain_img_size // self.patch_size


# The four DINOv2 encoder sizes used across the zoo
# (reference Depth_Anything_V2/infer.py:48-53).
VIT_CONFIGS = {
    "vits": ViTConfig(dim=384, depth=12, num_heads=6),
    "vitb": ViTConfig(dim=768, depth=12, num_heads=12),
    "vitl": ViTConfig(dim=1024, depth=24, num_heads=16),
    "vitg": ViTConfig(dim=1536, depth=40, num_heads=24, ffn="swiglu"),
}


def swiglu_hidden(dim: int, mlp_ratio: float = 4.0) -> int:
    """DINOv2 SwiGLUFFNFused hidden width: 2/3 * 4d rounded up to 8."""
    h = int(dim * mlp_ratio)
    return (int(h * 2 / 3) + 7) // 8 * 8


def rope_2d_normalized(
    ph: int, pw: int, head_dim: int, base: float = 100.0
) -> Tuple[jax.Array, jax.Array]:
    """2D axial RoPE tables over a patch grid with coordinates normalized to
    [-1, 1] (resolution-independent, the DINOv3 convention). Half the head
    dims rotate with y, half with x. Returns (cos, sin), (ph*pw, head_dim//2).
    """
    d4 = head_dim // 4
    freqs = jnp.asarray(base ** (-np.arange(d4) / d4), jnp.float32)
    ys = (jax.lax.broadcasted_iota(jnp.float32, (ph, pw), 0).reshape(-1) + 0.5) / ph * 2 - 1
    xs = (jax.lax.broadcasted_iota(jnp.float32, (ph, pw), 1).reshape(-1) + 0.5) / pw * 2 - 1
    ang = jnp.pi * jnp.concatenate(
        [ys[:, None] * freqs[None], xs[:, None] * freqs[None]], axis=-1
    )
    return jnp.cos(ang), jnp.sin(ang)


def _apply_rope(t: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """t: (..., N, d); rotate (even, odd) pairs by per-position angles."""
    t1, t2 = t[..., 0::2], t[..., 1::2]
    out = jnp.stack([t1 * cos - t2 * sin, t1 * sin + t2 * cos], axis=-1)
    return out.reshape(t.shape)


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"  # "auto" | "flash" | "xla"
    quant: str = "none"  # "none" | "calib" | "serve" (ops/quant.py w8a8)

    @nn.compact
    def __call__(self, x: jax.Array, rope=None) -> jax.Array:
        """``rope``: optional ((cos, sin), num_prefix) — rotary tables for the
        trailing patch tokens; the ``num_prefix`` leading tokens (cls +
        registers) stay unrotated."""
        b, n, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = make_dense(self.quant, self.dim * 3, use_bias=self.qkv_bias,
                         dtype=self.dtype, name="qkv")(x)

        from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
            packed_supported,
        )

        # Packed-layout fast path: attention straight from the qkv matmul's
        # (B, N, 3*H*d) output to the proj matmul's (B, N, H*d) input. The
        # (B,H,N,d) path below pays ~6 HBM layout round-trips per layer
        # (measured 100+ MB/layer on ViT-L, scripts/roofline_vitl.py) on a
        # program already at the HBM roof — this path has none of them.
        # auto-routing (measured v5e, 2026-08 scripts/vits_attn_ab.py +
        # roofline_vitl.py): packed wins for the wide encoders (vitl full
        # 16.51 -> 14.79 ms; the layout chain it deletes is ~3 GB/frame),
        # but LOSES on vits (228.6 vs 249.7 FPS same-window) — at 6 heads /
        # 12 layers XLA's fully-fused attention beats the custom-call
        # boundary. Same >=12-head gate the flash kernel earned in round 3.
        use_packed = (
            self.attn_impl in ("packed", "auto")
            and rope is None
            and packed_supported(self.num_heads, head_dim, n)
            and (self.attn_impl == "packed"
                 or (jax.default_backend() == "tpu"
                     and self.num_heads >= 12))
        )
        if use_packed:
            from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
                flash_attention_packed,
            )

            o = flash_attention_packed(qkv, self.num_heads)
            return make_dense(self.quant, self.dim, use_bias=True,
                              dtype=self.dtype, name="proj")(o)

        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # (B, N, H, d) each
        q = jnp.swapaxes(q, 1, 2)  # (B, H, N, d)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)

        if rope is not None:
            (cos, sin), prefix = rope
            cos = cos.astype(q.dtype)
            sin = sin.astype(q.dtype)

            def rot(t):
                patches = _apply_rope(t[:, :, prefix:], cos, sin)
                return jnp.concatenate([t[:, :, :prefix], patches], axis=2)

            q, k = rot(q), rot(k)

        impl = self.attn_impl
        if impl == "auto":
            # Measured on v5e (2026-08 attn_bench.py runs):
            # ViT-L @N=1374 (16 heads):  flash (whole-N block) beats XLA
            # ViT-S @N=1374 (6 heads):   flash_q704 1.20 ms vs XLA 1.29 ms
            # Depth Pro (35x16, N=577):  flash_b4 2.69 ms vs XLA 3.70 ms —
            #   the batch-gridded kernel amortizes program overhead over a
            #   block of heads (scripts/attn_bench.py to re-measure).
            # Routing: flash for wide models on long sequences AND for the
            # many-small-heads windowed regime; XLA elsewhere (short/narrow
            # single-head-ish shapes, where its fusion wins).
            use_flash = jax.default_backend() == "tpu" and (
                (self.num_heads >= 12 and n >= 1024)
                or (b * self.num_heads >= 256 and n <= 1024)
            )
            impl = "flash" if use_flash else "xla"
        if impl == "flash":
            from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
                flash_attention,
            )

            o = flash_attention(q, k, v)
        else:
            from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
                attention_reference,
            )

            o = attention_reference(q, k, v)
        o = jnp.swapaxes(o, 1, 2).reshape(b, n, self.dim)
        return make_dense(self.quant, self.dim, use_bias=True,
                          dtype=self.dtype, name="proj")(o)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.bfloat16
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = make_dense(self.quant, self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return make_dense(self.quant, self.dim, dtype=self.dtype, name="fc2")(x)


class SwiGLU(nn.Module):
    """DINOv2 SwiGLUFFNFused (ViT-g)."""

    dim: int
    hidden: int
    dtype: Any = jnp.bfloat16
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x12 = make_dense(self.quant, 2 * self.hidden, dtype=self.dtype,
                         name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return make_dense(self.quant, self.dim, dtype=self.dtype,
                          name="w3")(nn.silu(x1) * x2)


class LayerScale(nn.Module):
    dim: int
    init: float = 1e-5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.constant(self.init), (self.dim,))
        return x * gamma.astype(self.dtype)


class Block(nn.Module):
    cfg: ViTConfig
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array, rope=None) -> jax.Array:
        c = self.cfg
        # LayerNorms accumulate in fp32 for numerical parity with torch.
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = Attention(
            c.dim,
            c.num_heads,
            c.qkv_bias,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
            name="attn",
        )(h, rope=rope)
        x = x + LayerScale(c.dim, c.layerscale_init, dtype=self.dtype, name="ls1")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        if c.ffn == "swiglu":
            h = SwiGLU(
                c.dim, swiglu_hidden(c.dim, c.mlp_ratio), dtype=self.dtype,
                quant=self.quant, name="mlp"
            )(h)
        else:
            h = Mlp(c.dim, int(c.dim * c.mlp_ratio), dtype=self.dtype,
                    quant=self.quant, name="mlp")(h)
        x = x + LayerScale(c.dim, c.layerscale_init, dtype=self.dtype, name="ls2")(h)
        return x


class DinoViT(nn.Module):
    """DINOv2 encoder returning selected intermediate layers.

    ``__call__(images)`` with images (B, H, W, 3) already preprocessed;
    returns a list of (patch_tokens (B, N, D), cls_token (B, D)) for
    ``out_indices``, each with the final LayerNorm applied (DINOv2
    ``get_intermediate_layers(norm=True)`` semantics, which is what
    DepthAnythingV2's DPT head consumes).
    """

    cfg: ViTConfig
    out_indices: Sequence[int] = ()
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    # int8 w8a8 serving mode for the transformer Dense layers (ops/quant.py):
    # "none" | "calib" (bf16 compute + absmax stats) | "serve" (int8 MXU)
    quant: str = "none"
    # apply the final LayerNorm to intermediate taps (DINOv2
    # get_intermediate_layers(norm=True)); Depth Pro hooks raw activations
    norm_out: bool = True
    # indices (normalized, i.e. non-negative) whose taps skip the final norm
    # even when norm_out=True (Depth Pro's backbone_highres_hooks)
    raw_indices: Sequence[int] = ()

    @nn.compact
    def __call__(self, x: jax.Array):
        c = self.cfg
        b, h, w, _ = x.shape
        ph, pw = h // c.patch_size, w // c.patch_size

        x = x.astype(self.dtype)
        x = nn.Conv(
            c.dim,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)  # (B, ph, pw, D)
        x = x.reshape(b, ph * pw, c.dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, c.dim)
        ).astype(self.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, c.dim)), x], axis=1)

        if c.pos_embed:
            n0 = c.pretrain_grid * c.pretrain_grid
            pos_embed = self.param(
                "pos_embed",
                nn.initializers.normal(stddev=0.02),
                (1, n0 + 1, c.dim),
            )
            x = x + interpolate_pos_embed(
                pos_embed, c.pretrain_grid, (ph, pw)
            ).astype(self.dtype)

        if c.num_register_tokens:
            reg = self.param(
                "register_tokens",
                nn.initializers.zeros,
                (1, c.num_register_tokens, c.dim),
            ).astype(self.dtype)
            x = jnp.concatenate(
                [x[:, :1], jnp.broadcast_to(reg, (b, c.num_register_tokens, c.dim)), x[:, 1:]],
                axis=1,
            )

        want = [
            i if i >= 0 else c.depth + i for i in (self.out_indices or (c.depth - 1,))
        ]
        final_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")

        rope = None
        if c.rope:
            hd = c.dim // c.num_heads
            rope = (
                rope_2d_normalized(ph, pw, hd, c.rope_base),
                1 + c.num_register_tokens,
            )

        saved = {}
        for i in range(c.depth):
            x = Block(c, dtype=self.dtype, attn_impl=self.attn_impl,
                      quant=self.quant, name=f"blocks_{i}")(x, rope=rope)
            if i in want:
                use_norm = self.norm_out and i not in self.raw_indices
                y = final_norm(x) if use_norm else x
                saved[i] = (y[:, 1 + c.num_register_tokens :], y[:, 0])
        # duplicates and arbitrary order allowed (matches DINOv2
        # get_intermediate_layers semantics)
        return [saved[i] for i in want]


def interpolate_pos_embed(
    pos_embed: jax.Array, pretrain_grid: int, grid_hw: Tuple[int, int]
) -> jax.Array:
    """Bicubic interpolation of the patch-position table to a new grid
    (DINOv2 ``interpolate_pos_encoding``: torch bicubic, antialias=False,
    half-pixel). Identity when the grid matches (the 518x518 fast path)."""
    ph, pw = grid_hw
    m = pretrain_grid
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:]
    if (ph, pw) == (m, m):
        return pos_embed
    dim = patch_pos.shape[-1]
    grid = patch_pos.reshape(m, m, dim).astype(jnp.float32)
    wh = jnp.asarray(resample_matrix(m, ph, "cubic"))
    ww = jnp.asarray(resample_matrix(m, pw, "cubic"))
    grid = jnp.einsum("oh,hwd->owd", wh, grid, precision=jax.lax.Precision.HIGHEST)
    grid = jnp.einsum("pw,owd->opd", ww, grid, precision=jax.lax.Precision.HIGHEST)
    out = grid.reshape(1, ph * pw, dim).astype(pos_embed.dtype)
    return jnp.concatenate([cls_pos, out], axis=1)
