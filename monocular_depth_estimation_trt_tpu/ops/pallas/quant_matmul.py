"""Fused w8a8 matmul Pallas kernel (round-3 verdict item 2).

The XLA int8 serving path (``ops/quant.py::QuantDense`` serve mode) lowers
as separate HLOs: quantize epilogue (f32 mul + round + clip + convert) →
int8 dot → int32→f32 convert + per-channel rescale (+bias). XLA fuses the
elementwise stages into the dot's operands reasonably well, but each stage
still round-trips the (M, K)/(M, N) tensors through HBM when fusion
boundaries fall badly, and measured end-to-end the int8 MXU's 2× only
returned 1.06–1.12× (docs/QUANT.md).

This kernel performs the whole pipeline in ONE program per M-tile:

    x (blk_m, K) bf16 → ×qmul, round, clip → int8      [VPU, in VMEM]
    int8 × int8 dot → int32                            [MXU at 2× rate]
    int32 → f32 × out_scale (+bias) → out dtype        [VPU, in VMEM]

The weight (K, N) int8 block is grid-invariant, so Mosaic keeps it resident
in VMEM across M-tiles: the int8 weights are read from HBM exactly once —
the full memory win of int8 — and the quantized activations never touch HBM.

Equivalent of what TRT's int8 kernel selection would pick for the
reference's engines had it used a calibrator (it did not — fp16 only,
``common.py:133-146`` timing-cache role).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_QMAX = 127.0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _w8a8_kernel(x_ref, kq_ref, qmul_ref, scale_ref, bias_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)  # (blk_m, K)
    xq = jnp.clip(jnp.round(x * qmul_ref[...]), -_QMAX, _QMAX).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq,
        kq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (blk_m, N) int32
    o = y.astype(jnp.float32) * scale_ref[...] + bias_ref[...]
    o_ref[...] = o.astype(o_ref.dtype)


def w8a8_matmul(
    x: jax.Array,
    kernel_q: jax.Array,
    qmul: jax.Array,
    out_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    blk_m: int = 128,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused static-scale int8 matmul: ``(..., K) @ (K, N) -> (..., N)``.

    Semantics match ``QuantDense`` serve mode exactly:
    ``clip(round(x·qmul), ±127) ∈ int8``, int8 dot accumulating int32,
    ``·out_scale (+bias)`` epilogue. K and N should be multiples of the int8
    tile (K: 32-sublane, N: 128-lane) — true for every transformer width in
    the zoo; other shapes fall back to the XLA path at the caller.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_dtype = out_dtype or x.dtype
    k_in, n = kernel_q.shape
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k_in)

    blk = max(8, (min(blk_m, _round_up(m, 8)) // 8) * 8)
    m_pad = _round_up(m, blk)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    b = bias if bias is not None else jnp.zeros((n,), jnp.float32)
    out = pl.pallas_call(
        _w8a8_kernel,
        grid=(m_pad // blk,),
        in_specs=[
            pl.BlockSpec((blk, k_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_in, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            # int8 MXU runs at 2x the bf16 rate; report half the nominal
            # flops so XLA's scheduler sees the effective cost
            flops=m_pad * k_in * n,
            bytes_accessed=(m_pad * k_in * x.dtype.itemsize + k_in * n
                            + m_pad * n * jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, kernel_q, qmul.reshape(1, k_in).astype(jnp.float32),
      out_scale.reshape(1, n).astype(jnp.float32),
      b.reshape(1, n).astype(jnp.float32))
    if m_pad != m:
        out = out[:m]
    return out.reshape(*lead, n)


def w8a8_supported(k_in: int, n: int) -> bool:
    """Shapes the fused kernel handles: int8 tiling wants K % 32 == 0 and
    N % 128 == 0; the weight block plus activation/accumulator tiles must
    also fit VMEM (true for every ViT width in the zoo; huge N would not)."""
    if k_in % 32 or n % 128:
        return False
    # weight block + (blk_m x K) input + (blk_m x N) i32/f32 epilogue at the
    # default blk_m=128
    need = k_in * n + 128 * k_in * 2 + 2 * 128 * n * 4
    return need <= 12 * 1024 * 1024
