#!/usr/bin/env python
"""Attention micro-benchmark: XLA vs Pallas seq-gridded vs batch-gridded,
at the zoo's hot shapes. Prints one JSON line per (shape, variant).

Shapes:
  vits  — DA-V2 ViT-S encoder block: (1, 6, 1374, 64)
  vitl  — DA-V2 ViT-L encoder block: (1, 16, 1374, 64)
  dpro  — Depth Pro windowed encoder: (35, 16, 577, 64)

Usage: python scripts/attn_bench.py [--shapes vits,dpro] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

SHAPES = {
    "vits": (1, 6, 1374, 64),
    "vitl": (1, 16, 1374, 64),
    "dpro": (35, 16, 577, 64),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="vits,dpro")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from monocular_depth_estimation_trt_tpu.ops.pallas.autotune import (
        candidate_batch_blocks,
        candidate_blocks,
    )
    from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
        _round_up,
        attention_reference,
        flash_attention,
    )
    from monocular_depth_estimation_trt_tpu.runtime.cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    rng = np.random.default_rng(0)

    def bench(name, fn, q, k, v):
        out = jax.block_until_ready(fn(q, k, v))
        np.asarray(out.ravel()[0:1])  # force a real sync over the tunnel
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(q, k, v)
        np.asarray(out.ravel()[0:1])
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 4)}),
              flush=True)
        return dt

    for shape_name in args.shapes.split(","):
        b, h, n, d = SHAPES[shape_name]
        print(f"[attn_bench] shape {shape_name} = {(b, h, n, d)}", flush=True)
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        n_pad = _round_up(n, 128)

        bench(f"{shape_name}/xla",
              jax.jit(lambda q, k, v: attention_reference(q, k, v)), q, k, v)
        for blk in candidate_blocks(n_pad):
            bench(f"{shape_name}/flash_q{blk}",
                  jax.jit(lambda q, k, v, blk=blk: flash_attention(
                      q, k, v, blk_q=blk)), q, k, v)
        for bb in candidate_batch_blocks(b * h, n_pad, 64):
            bench(f"{shape_name}/flash_b{bb}",
                  jax.jit(lambda q, k, v, bb=bb: flash_attention(
                      q, k, v, blk_b=bb)), q, k, v)


if __name__ == "__main__":
    main()
