#!/usr/bin/env python
"""Packed flash-attention A/B at the Metric3D encoder shape (N=3349).

The N=3349 encoder decomposition (scripts/roofline_vitl.py --tokens 3349,
2026-08 hardware run) put the attention sublayer at 40.9% of roof and the
arithmetic floor of the packed kernel at ~0.75 ms/layer (MXU d=64 ceiling
0.50 + VPU softmax 0.25, serialized).  This sweep times the candidate
levers one by one, chained 16x inside one program so tunnel launch noise
cancels (same protocol as ops/pallas/autotune._measure):

  * blk_q 432 (the production heuristic pick) vs 576 (also legal at
    n_pad=3456, missed by the halving search) vs 216/288;
  * padding-mask variants: iota+where on the score tile (production) vs
    multiply-by-0/1 row on e (2 fewer VPU passes) vs none (upper bound;
    wrong numerics at padded cols, timing only);
  * the bhnd kernel at its only legal block (128) for reference.
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
    _round_up,
    flash_attention,
    flash_attention_packed,
)
from monocular_depth_estimation_trt_tpu.runtime.cache import (
    enable_persistent_cache,
)


def packed_variant(qkv, num_heads, *, blk_q, mask_mode, scale=None):
    """flash_attention_packed with an explicit blk_q and a padding-mask
    strategy knob (timing-only fork of the production kernel)."""
    b, n, three_hd = qkv.shape
    hd = three_hd // 3
    head_dim = hd // num_heads
    if scale is None:
        scale = 1.0 / float(np.sqrt(head_dim))
    n_pad = _round_up(n, 128)
    if n_pad != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0)))
    h2 = num_heads // (128 // head_dim)

    maskrow = (jnp.arange(n_pad) < n).astype(qkv.dtype)[None, :]

    def kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
        q = q_ref[...]
        k = k_ref[...]
        v = v_ref[...]
        outs = []
        for h in range(q.shape[1] // head_dim):
            lo = h * head_dim
            s = jax.lax.dot_general(
                q[:, lo:lo + head_dim], k[:, lo:lo + head_dim],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if mask_mode == "where" and n < n_pad:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            if mask_mode == "mul" and n < n_pad:
                e = e * m_ref[...].astype(jnp.float32)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                e.astype(v.dtype), v[:, lo:lo + head_dim],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append(o / denom)
        o_ref[...] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)

    def call(qkv2):
        return pl.pallas_call(
            kernel,
            grid=(h2, n_pad // blk_q),
            in_specs=[
                pl.BlockSpec((blk_q, 128), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, 128), lambda i, j: (0, h2 + i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, 128), lambda i, j: (0, 2 * h2 + i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk_q, 128), lambda i, j: (j, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, hd), qkv.dtype),
            interpret=jax.default_backend() != "tpu",
        )(qkv2, qkv2, qkv2, maskrow)

    return jax.vmap(call)(qkv)[:, :n]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3349)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    enable_persistent_cache()

    n, H, D = args.n, args.heads, args.dim
    hd = D // H
    rng = np.random.default_rng(0)
    qkv = jax.device_put(
        (rng.standard_normal((1, n, 3 * D)) * 0.3).astype(np.float32)
    ).astype(jnp.bfloat16)

    core_flops = 4 * H * _round_up(n, 128) ** 2 * hd * args.chain

    def timed(name, fn):
        def chained(x):
            def step(c, _):
                o = fn(c)
                # feed output back as the next q|k|v thirds
                return jnp.concatenate([o, o, o], axis=-1), None
            return jax.lax.scan(step, x, None, length=args.chain)[0]

        jfn = jax.jit(chained)
        out = jfn(qkv)
        np.asarray(out.ravel()[0:1])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jfn(qkv)
        np.asarray(out.ravel()[0:1])
        dt = (time.perf_counter() - t0) / args.iters
        per_layer = dt / args.chain * 1e3
        print(f"{name:<28} {per_layer:8.3f} ms/layer  "
              f"{core_flops / dt / 1e12:6.1f} TF/s", flush=True)

    # production packed path (autotune heuristic -> blk_q=432 at n_pad=3456)
    timed("packed_auto", lambda x: flash_attention_packed(x, H))
    for blk in (216, 288, 432, 576):
        if _round_up(n, 128) % blk:
            continue
        timed(f"packed_q{blk}_where",
              functools.partial(packed_variant, num_heads=H, blk_q=blk,
                                mask_mode="where"))
    timed("packed_q432_mulmask",
          functools.partial(packed_variant, num_heads=H, blk_q=432,
                            mask_mode="mul"))
    timed("packed_q576_mulmask",
          functools.partial(packed_variant, num_heads=H, blk_q=576,
                            mask_mode="mul"))
    timed("packed_q432_nomask",
          functools.partial(packed_variant, num_heads=H, blk_q=432,
                            mask_mode="none"))

    # bhnd reference at its only legal block
    def bhnd(x):
        q, k, v = jnp.split(x, 3, axis=-1)

        def tohead(t):
            return jnp.swapaxes(t.reshape(1, n, H, hd), 1, 2)

        o = flash_attention(tohead(q), tohead(k), tohead(v))
        return jnp.swapaxes(o, 1, 2).reshape(1, n, D)

    timed("bhnd_auto128", bhnd)


if __name__ == "__main__":
    main()
