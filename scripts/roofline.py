#!/usr/bin/env python
"""Roofline audit for the small-model throughput ceiling (round-2 verdict
item 4): is the ~280 FPS DA-V2 vits plateau really activation-HBM-bound?

For each config: compile the engine, read XLA's own cost analysis (flops +
bytes accessed — authoritative for the compiled program, not an estimate),
benchmark, and compare measured time against the compute roof
(flops / peak bf16) and the memory roof (bytes / peak HBM BW).

v5e single chip: 197 TFLOP/s bf16, 819 GB/s HBM.

Usage: python scripts/roofline.py [--models vits,vits_b8,vitl] [--iters 50]
Prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

PEAK_TFLOPS = 197e12
PEAK_HBM = 819e9


def _ca_value(ca, key):
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get(key, 0.0) or 0.0)


def audit(name: str, eng, batch: int, iters: int) -> dict:
    import numpy as np

    from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
    from monocular_depth_estimation_trt_tpu.runtime.benchmark import benchmark

    eng.compile()
    print(f"[roofline] {name}: compiled", flush=True)
    ca = eng.cost_analysis() or {}
    flops = _ca_value(ca, "flops")
    byts = _ca_value(ca, "bytes accessed")
    print(f"[roofline] {name}: cost analysis flops={flops:.3e} "
          f"bytes={byts:.3e}", flush=True)

    rng = np.random.default_rng(0)
    import jax

    frames = jax.device_put(rng.integers(
        0, 255, eng._example_args[1].shape, dtype=np.uint8))
    print(f"[roofline] {name}: input staged, benchmarking", flush=True)
    rep = benchmark(lambda f: eng(eng._example_args[0], f), (frames,),
                    config=BenchmarkConfig(warmup=5, iterations=iters),
                    name=name)
    t = rep.avg_seconds
    t_compute = flops / PEAK_TFLOPS
    t_memory = byts / PEAK_HBM
    roof = max(t_compute, t_memory)
    row = {
        "config": name,
        "batch": batch,
        "measured_ms": round(t * 1e3, 3),
        "fps_per_frame": round(batch / t, 1),
        "gflops": round(flops / 1e9, 1),
        "gbytes_accessed": round(byts / 1e9, 3),
        "compute_roof_ms": round(t_compute * 1e3, 3),
        "memory_roof_ms": round(t_memory * 1e3, 3),
        "bound": "memory" if t_memory > t_compute else "compute",
        "pct_of_roof": round(100.0 * roof / t, 1) if t > 0 else None,
        "achieved_gbps": round(byts / t / 1e9, 1) if t > 0 else None,
        "achieved_tfs": round(flops / t / 1e12, 1) if t > 0 else None,
    }
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="vits,vits_b8")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.runtime.cache import (
        enable_persistent_cache,
    )
    from monocular_depth_estimation_trt_tpu.weights.store import (
        set_allow_random_weights,
    )

    enable_persistent_cache()
    set_allow_random_weights(True)

    want = set(args.models.split(","))
    if "vits" in want or "vits_b8" in want:
        pipe = build_pipeline("depth_anything_v2", encoder="vits")
        if "vits" in want:
            eng = pipe.batch_engine_for((518, 518), 1)
            audit("da_v2_vits_518_b1", eng, 1, args.iters)
        if "vits_b8" in want:
            eng = pipe.batch_engine_for((518, 518), 8)
            audit("da_v2_vits_518_b8", eng, 8, max(args.iters // 4, 10))
    if "vitl" in want:
        pipe = build_pipeline("depth_anything_v2", encoder="vitl")
        eng = pipe.batch_engine_for((518, 518), 1)
        audit("da_v2_vitl_518_b1", eng, 1, max(args.iters // 2, 10))
    if "ac" in want:
        pipe = build_pipeline("depth_anything_ac", encoder="vits")
        eng = pipe.batch_engine_for((518, 518), 1)
        audit("da_ac_vits_518_b1", eng, 1, args.iters)


if __name__ == "__main__":
    main()
