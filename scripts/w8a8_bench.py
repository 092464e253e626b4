#!/usr/bin/env python
"""A/B the fused Pallas w8a8 matmul vs the unfused XLA int8 serve path.

Round-3 verdict item 2: "make int8 pay or prove its ceiling at the kernel
level". Two levels:

  layer   each vitl transformer matmul shape (qkv/proj/fc1/fc2 at the
          518² token count) — fused kernel vs XLA serve path vs bf16 dot,
          all as lax.scan×24 single programs (amortizes tunnel launch).
  e2e     the full DA-V2 engine at bf16 / int8-xla / int8-pallas
          (MDET_W8A8_IMPL toggles routing in ops/quant.py).

Prints one JSON line per row plus a summary table; paste into docs/QUANT.md.

Usage: python scripts/w8a8_bench.py [--iters 30] [--level layer,e2e]
       [--encoder vitl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

SCAN = 24  # vitl depth; every layer row runs its matmul 24x in one program


def bench_fn(fn, args, iters, name):
    import jax

    from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
    from monocular_depth_estimation_trt_tpu.runtime.benchmark import benchmark

    jfn = jax.jit(fn)
    jfn.lower(*args).compile()
    rep = benchmark(jfn, args, config=BenchmarkConfig(warmup=4,
                                                      iterations=iters),
                    name=name)
    return rep.avg_seconds


def layer_rows(iters, rows):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from monocular_depth_estimation_trt_tpu.ops.pallas.quant_matmul import (
        w8a8_matmul,
        w8a8_supported,
    )

    rng = np.random.default_rng(0)
    m = 1370  # 37*37+1 tokens @518²
    d = 1024
    shapes = {
        "qkv": (d, 3 * d),
        "proj": (d, d),
        "fc1": (d, 4 * d),
        "fc2": (4 * d, d),
    }
    for name, (k, n) in shapes.items():
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        kq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        kb = kq.astype(jnp.bfloat16) * 0.01
        qmul = jnp.asarray(rng.uniform(5, 30, (k,)), jnp.float32)
        scale = jnp.asarray(rng.uniform(1e-4, 1e-3, (n,)), jnp.float32)
        bias = jnp.zeros((n,), jnp.float32)
        assert w8a8_supported(k, n), (k, n)

        def run_pallas(x0):
            def body(c, _):
                y = w8a8_matmul(c, kq, qmul, scale, bias,
                                out_dtype=jnp.bfloat16)
                # keep the carry shape: project back to (m, k)
                return y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n))), None
            return jax.lax.scan(body, x0, None, length=SCAN)[0]

        def run_xla(x0):
            def body(c, _):
                xq = jnp.clip(jnp.round(c.astype(jnp.float32) * qmul),
                              -127, 127).astype(jnp.int8)
                y = jax.lax.dot_general(
                    xq, kq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * scale + bias
                y = y.astype(jnp.bfloat16)
                return y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n))), None
            return jax.lax.scan(body, x0, None, length=SCAN)[0]

        def run_bf16(x0):
            def body(c, _):
                y = c @ kb
                return y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n))), None
            return jax.lax.scan(body, x0, None, length=SCAN)[0]

        t_pl = bench_fn(run_pallas, (x,), iters, f"{name}:pallas")
        t_xla = bench_fn(run_xla, (x,), iters, f"{name}:xla")
        t_bf = bench_fn(run_bf16, (x,), iters, f"{name}:bf16")
        flops = 2.0 * m * k * n * SCAN
        row = {
            "level": "layer", "shape": f"{name} {m}x{k}x{n}",
            "bf16_ms": round(t_bf * 1e3, 3),
            "int8_xla_ms": round(t_xla * 1e3, 3),
            "int8_pallas_ms": round(t_pl * 1e3, 3),
            "pallas_vs_bf16": round(t_bf / t_pl, 2),
            "pallas_vs_xla": round(t_xla / t_pl, 2),
            "pallas_tfs": round(flops / t_pl / 1e12, 1),
            "bf16_tfs": round(flops / t_bf / 1e12, 1),
        }
        print(json.dumps(row), flush=True)
        rows.append(row)


def e2e_rows(iters, encoder, rows, batch=1):
    import jax
    import numpy as np

    from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.runtime.benchmark import benchmark
    from monocular_depth_estimation_trt_tpu.weights.store import (
        set_allow_random_weights,
    )

    set_allow_random_weights(True)
    rng = np.random.default_rng(0)
    hw = 518

    variants = [("bf16", "bf16", None), ("int8_xla", "int8", "xla"),
                ("int8_auto", "int8", "auto")]
    out = {}
    for label, precision, impl in variants:
        if impl is not None:
            os.environ["MDET_W8A8_IMPL"] = impl
        pipe = build_pipeline("depth_anything_v2", encoder=encoder,
                              precision=precision)
        eng = pipe.batch_engine_for((hw, hw), batch)
        eng.compile()
        frames = jax.device_put(rng.integers(
            0, 255, eng._example_args[1].shape, dtype=np.uint8))
        rep = benchmark(lambda f: eng(eng._example_args[0], f), (frames,),
                        config=BenchmarkConfig(warmup=4, iterations=iters),
                        name=f"e2e:{label}")
        out[label] = rep.avg_seconds / batch  # per-frame seconds
        os.environ.pop("MDET_W8A8_IMPL", None)
    row = {
        "level": "e2e",
        "config": f"depth_anything_v2 {encoder} @{hw}² b{batch}",
        "bf16_fps": round(1.0 / out["bf16"], 2),
        "int8_xla_fps": round(1.0 / out["int8_xla"], 2),
        "int8_auto_fps": round(1.0 / out["int8_auto"], 2),
        "auto_vs_bf16": round(out["bf16"] / out["int8_auto"], 2),
        "auto_vs_xla": round(out["int8_xla"] / out["int8_auto"], 2),
    }
    print(json.dumps(row), flush=True)
    rows.append(row)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--level", default="layer,e2e")
    ap.add_argument("--encoder", default="vitl")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    from monocular_depth_estimation_trt_tpu.runtime.cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    rows: list = []
    levels = set(args.level.split(","))
    if "layer" in levels:
        layer_rows(args.iters, rows)
    if "e2e" in levels:
        e2e_rows(args.iters, args.encoder, rows, batch=args.batch)
    print("\n[w8a8_bench] done; rows above are JSON — paste into docs/QUANT.md")


if __name__ == "__main__":
    main()
