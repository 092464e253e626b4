"""Fused attention Pallas kernel for the ViT/DINOv2 encoders.

This replaces what the TensorRT autotuner picks implicitly for the reference's
exported attention graphs (fused myelin attention kernels): one kernel that
computes ``softmax(q k^T / sqrt(d)) v`` per (batch*head, q-block) without ever
materializing the (N, N) score matrix in HBM. At the 518x518 working point the
encoders run N = 1370 tokens; a naive XLA lowering stores the score tensor
(heads x N^2, tens of MB per layer) to HBM twice — this kernel keeps scores in
VMEM.

Design (TPU-first):
* grid = (batch*heads, N/blk_q); K and V for one head fit comfortably in VMEM
  at these sequence lengths (N<=2048, d<=128), so each program streams one
  q-block against the full K/V — no online-softmax rescaling pass is needed,
  a single max/sum per row suffices (exact, not an approximation).
* matmuls run on the MXU in the input dtype (bf16) with fp32 accumulation;
  softmax runs on the VPU in fp32.
* sequence padding to the 128-lane boundary is handled with an additive mask
  baked from ``valid_len``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int):
    q = q_ref[0]  # (blk_q, d)
    k = k_ref[0]  # (N, d)
    v = v_ref[0]  # (N, d)
    n = k.shape[0]

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (blk_q, N) fp32
    s = s * scale
    if valid_len < n:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < valid_len, s, -jnp.inf)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / denom).astype(v.dtype)
    o = jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _attn_kernel_batched(
    q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int
):
    """Batch-gridded variant: one program computes FULL attention for a
    block of heads (blk_b, N, d). For many-small-head shapes (Depth Pro's
    35x16 windowed heads at N=577) the per-program grid overhead of the
    sequence-gridded kernel dominates; amortizing it over blk_b heads with
    batched MXU matmuls wins."""
    q = q_ref[...]  # (blk_b, N, d)
    k = k_ref[...]
    v = v_ref[...]
    n = k.shape[1]

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (blk_b, N, N) fp32
    s = s * scale
    if valid_len < n:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        s = jnp.where(col < valid_len, s, -jnp.inf)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / denom).astype(v.dtype)
    o = jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o.astype(o_ref.dtype)


def head_chunk(bh: int, n_pad: int, d_pad: int, itemsize: int = 2) -> int:
    """Heads per custom call in the long-sequence regime (else ``bh``).

    At huge N (VGGT global attention at S>=8 views -> N ~ 11k tokens) XLA
    stages the custom call's relayout'd operand in scoped VMEM; past ~16 MB
    per operand that staging itself OOMs ("kernel-vmem-stack-oom"). Chunking
    the head axis keeps every call's (chunk, N, d) operand within the proven
    budget. Short-N shapes (incl. batch>1 serving, measured-good unchunked)
    return ``bh`` untouched.
    """
    head_bytes = n_pad * d_pad * itemsize
    if n_pad < 4096 or bh * head_bytes <= 12 * 1024 * 1024:
        return bh
    max_heads = max(1, (10 * 1024 * 1024) // head_bytes)
    return max(
        (c for c in range(1, min(max_heads, bh) + 1) if bh % c == 0),
        default=1,
    )


def max_batch_block(bh: int, n_pad: int, d_pad: int, itemsize: int = 2) -> int:
    """Largest legal heads-per-program block under the VMEM budget: the fp32
    score tile blk_b*N^2*4B plus q/k/v/o tiles must stay well inside the
    ~16 MB of VMEM."""
    budget = 12 * 1024 * 1024
    for blk_b in (8, 4, 2):
        need = blk_b * (n_pad * n_pad * 4 + 4 * n_pad * d_pad * itemsize)
        if bh % blk_b == 0 and need <= budget:
            return blk_b
    return 1


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    blk_q: Optional[int] = None,
    blk_b: int = 1,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Multi-head attention, shapes ``(B, H, N, d)`` -> ``(B, H, N, d)``.

    Non-causal (ViT encoders are bidirectional). N and d may be arbitrary;
    padding to TPU tile boundaries is internal. ``blk_q=None`` resolves the
    blocking through the per-shape timing cache / measured defaults
    (``ops/pallas/autotune.py``; a negative cached value means the
    batch-gridded kernel with ``blk_b = -value``). ``blk_b > 1`` selects the
    batch-gridded kernel: whole-N attention for ``blk_b`` heads per program
    (the many-small-heads regime). On non-TPU backends the kernel runs in
    Pallas interpret mode (tests); production path is TPU.
    """
    b, h, n, d = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))

    n_pad = _round_up(n, 128)
    # pad d to a lane-friendly size but do NOT round 64 up to 128 — that
    # doubles QK^T and PV FLOPs for the common ViT head_dim=64
    d_pad = 64 if d <= 64 else _round_up(d, 128)
    if blk_q is None and blk_b == 1:
        from monocular_depth_estimation_trt_tpu.ops.pallas.autotune import (
            best_block,
        )

        blk_q = best_block(b * h, n_pad, d_pad, q.dtype)
        if blk_q < 0:  # batch-gridded winner from the timing cache
            blk_b, blk_q = -blk_q, n_pad
    if blk_b > 1:
        while (b * h) % blk_b:
            blk_b //= 2
    blk_q = min(blk_q or n_pad, n_pad)
    while n_pad % blk_q or blk_q % 8:
        blk_q //= 2
    blk_q = max(blk_q, 8)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, d_pad - d)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    qp = qp.reshape(b * h, n_pad, d_pad)
    kp = kp.reshape(b * h, n_pad, d_pad)
    vp = vp.reshape(b * h, n_pad, d_pad)

    def call(qc, kc, vc):
        bh = qc.shape[0]
        cost = pl.CostEstimate(
            flops=4 * bh * n_pad * n_pad * d_pad,
            bytes_accessed=4 * bh * n_pad * d_pad * q.dtype.itemsize,
            transcendentals=bh * n_pad * n_pad,
        )
        if blk_b > 1:
            bb = blk_b
            while bh % bb:
                bb //= 2
            out = pl.pallas_call(
                functools.partial(
                    _attn_kernel_batched, scale=scale, valid_len=n
                ),
                grid=(bh // bb,),
                in_specs=[
                    pl.BlockSpec((bb, n_pad, d_pad), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bb, n_pad, d_pad), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bb, n_pad, d_pad), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bb, n_pad, d_pad),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((bh, n_pad, d_pad), q.dtype),
                cost_estimate=cost,
                interpret=interpret,
            )(qc, kc, vc)
        else:
            out = pl.pallas_call(
                functools.partial(_attn_kernel, scale=scale, valid_len=n),
                grid=(bh, n_pad // blk_q),
                in_specs=[
                    pl.BlockSpec(
                        (1, blk_q, d_pad), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(
                        (1, n_pad, d_pad), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(
                        (1, n_pad, d_pad), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, blk_q, d_pad), lambda i, j: (i, j, 0),
                    memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((bh, n_pad, d_pad), q.dtype),
                cost_estimate=cost,
                interpret=interpret,
            )(qc, kc, vc)
        return out

    # Long-sequence guard: at huge N (VGGT global attention, S>=8 views ->
    # N ~ 11k tokens) XLA stages the custom call's relayout'd operand in
    # scoped VMEM; past ~16 MB per operand that staging itself OOMs
    # ("kernel-vmem-stack-oom"). Chunk the head axis so every custom call's
    # (bh_chunk, N, d) operand stays within the proven budget. Only the
    # long-N regime is chunked — short-N shapes (incl. batch>1 serving) are
    # measured-good unchunked.
    chunk = head_chunk(b * h, n_pad, d_pad, q.dtype.itemsize)
    if chunk < b * h and not interpret:
        qs = qp.reshape(-1, chunk, n_pad, d_pad)
        ks = kp.reshape(-1, chunk, n_pad, d_pad)
        vs = vp.reshape(-1, chunk, n_pad, d_pad)
        out = jax.lax.map(lambda t: call(*t), (qs, ks, vs))
        out = out.reshape(b * h, n_pad, d_pad)
    else:
        out = call(qp, kp, vp)

    out = out.reshape(b, h, n_pad, d_pad)
    return out[:, :, :n, :d]


def _attn_kernel_packed(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                        valid_len: int, head_dim: int):
    """Packed-layout kernel: one program = one q-block x one 128-lane block
    of the qkv matrix (= ``128 // head_dim`` heads). Blocks are lane-slices
    of the SAME (N_pad, 3*H*d) array — no transposed/padded per-head q/k/v
    tensors ever exist in HBM."""
    q = q_ref[...]  # (blk_q, 128)
    k = k_ref[...]  # (n_pad, 128)
    v = v_ref[...]
    n = k.shape[0]
    outs = []
    for h in range(q.shape[1] // head_dim):
        lo = h * head_dim
        qh = q[:, lo:lo + head_dim]
        kh = k[:, lo:lo + head_dim]
        vh = v[:, lo:lo + head_dim]
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (blk_q, n_pad) fp32
        if valid_len < n:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < valid_len, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        # normalize AFTER the PV dot: one divide per (row, head_dim) output
        # element instead of per (row, key) score element — 22x less VPU
        # work at N=1408/d=64 (flash-attention's usual deferred epilogue)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v.dtype), vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o / denom)
    o_ref[...] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def packed_supported(num_heads: int, head_dim: int, n: int,
                     rope: bool = False) -> bool:
    """Shapes the packed-qkv kernel serves: head pairs must tile the 128-lane
    blocks (d=64, even heads — every DINOv2/VGGT encoder in the zoo), rope
    must be off (rope rewrites q/k between the matmul and the kernel), and
    the fp32 score tile for the whole-N regime must fit VMEM (long-sequence
    VGGT S>=4 shapes keep the head-chunked (B,H,N,d) path)."""
    return (head_dim == 64 and num_heads % 2 == 0 and not rope
            and 1024 <= n <= 4096)


def flash_attention_packed(
    qkv: jax.Array,
    num_heads: int,
    *,
    scale: Optional[float] = None,
    blk_q: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Attention straight from the packed qkv projection: ``(B, N, 3*H*d)``
    (the qkv matmul's native output, q|k|v regions each H*d wide, head-major)
    -> ``(B, N, H*d)`` (the proj matmul's native input).

    The (B,H,N,d) kernels pay ~6 HBM layout round-trips per layer around the
    Pallas call (reshape/moveaxis/2x swapaxes/3x pad + output unpad/transpose
    — measured 100+ MB/layer on ViT-L, scripts/roofline_vitl.py); at 24
    layers that is ~2.5 GB/frame of pure layout traffic on a program that is
    memory-bound at the HBM roof. This variant's blocks are lane-slices of
    the packed matrix itself: one 128-lane block = 2 heads' q (or k, v), so
    the only HBM traffic besides the kernel's streaming reads is one N-pad of
    the packed tensor. Numerics identical to ``flash_attention`` (fp32
    scores/softmax, single-pass exact softmax)."""
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    head_dim = hd // num_heads
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if scale is None:
        scale = 1.0 / float(np.sqrt(head_dim))

    heads_per_blk = 128 // head_dim  # 2 at d=64
    n_pad = _round_up(n, 128)
    if blk_q is None:
        from monocular_depth_estimation_trt_tpu.ops.pallas.autotune import (
            best_block,
        )

        blk_q = best_block(num_heads, n_pad, head_dim, qkv.dtype,
                           kind="packed")
        if blk_q < 0:  # batch-gridded winner never applies to this layout
            blk_q = n_pad
    blk_q = min(blk_q, n_pad)
    while n_pad % blk_q or blk_q % 8:
        blk_q //= 2
    blk_q = max(blk_q, 8)

    if n_pad != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0)))

    h2 = num_heads // heads_per_blk  # lane-blocks per q/k/v region
    cost = pl.CostEstimate(
        flops=4 * num_heads * n_pad * n_pad * head_dim,
        bytes_accessed=qkv.size * qkv.dtype.itemsize
        + b * n_pad * hd * qkv.dtype.itemsize,
        transcendentals=num_heads * n_pad * n_pad,
    )

    def call(qkv2):  # (n_pad, 3*hd) for one batch item
        return pl.pallas_call(
            functools.partial(_attn_kernel_packed, scale=scale, valid_len=n,
                              head_dim=head_dim),
            grid=(h2, n_pad // blk_q),
            in_specs=[
                pl.BlockSpec((blk_q, 128), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, 128), lambda i, j: (0, h2 + i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, 128), lambda i, j: (0, 2 * h2 + i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk_q, 128), lambda i, j: (j, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, hd), qkv.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(qkv2, qkv2, qkv2)

    out = jax.vmap(call)(qkv)
    return out[:, :n]


def attention_reference(q, k, v, *, scale: Optional[float] = None):
    """Plain XLA attention (oracle for tests; fallback on CPU backend)."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)
