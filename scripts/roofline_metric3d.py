#!/usr/bin/env python
"""Per-stage roofline decomposition of Metric3D V2 ViT-L @616x1064.

BENCH_ALL has metric3d_v2_vitl at 48.6% of its XLA-cost-analysis roof —
the worst ratio of any measured family — while DA-V2 vitl@518 (same
encoder, smaller grid) runs at 90.8%. This script localizes the gap by
timing each stage as its OWN compiled program (methodology of
``roofline_vitl.py``; reference role: the per-layer timing TRT's builder
log gives for ``Metric3D_V2/onnx2trt.py``):

  full       the production engine (uint8 in -> depth out)
  encoder    DinoViT-reg vitl @616x1064 (N=3349 tokens: 3344 patch
             + cls + 4 registers)
  neck       DPTNeck (DPT projection + 3-level RefineNet fusion)
  refine     context conv + init head + 4x ConvGRU iterations + heads
             (the RAFT-style loop at 88x152)
  upsample   learned 7x convex upsample to 616x1064 + fp32 activations

Each stage uses its own randomly-initialized params (perf depends only on
shapes). Rows: measured ms, XLA flops/bytes, achieved TF/s / GB/s,
%-of-roof (v5e: 197 TFLOP/s bf16, 819 GB/s HBM).

Usage: python scripts/roofline_metric3d.py [--iters 20] [--stages ...]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from roofline_vitl import (  # noqa: E402  (shared row helpers)
    PEAK_HBM,
    PEAK_TFLOPS,
    measure,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--attn", default="auto")
    ap.add_argument("--stages", default="full,encoder,neck,refine,upsample")
    args = ap.parse_args()
    want = set(args.stages.split(","))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
        HEAD_CONFIGS,
        INTERMEDIATE_LAYER_IDX,
    )
    from monocular_depth_estimation_trt_tpu.models.metric3d_v2 import (
        ConvGRU,
        DPTNeck,
        convex_upsample,
    )
    from monocular_depth_estimation_trt_tpu.models.vit import (
        VIT_CONFIGS,
        DinoViT,
    )
    from monocular_depth_estimation_trt_tpu.runtime.cache import (
        enable_persistent_cache,
    )
    from monocular_depth_estimation_trt_tpu.weights.store import (
        set_allow_random_weights,
    )

    enable_persistent_cache()
    set_allow_random_weights(True)

    enc = "vitl"
    cfg = dataclasses.replace(VIT_CONFIGS[enc], num_register_tokens=4)
    head_cfg = HEAD_CONFIGS[enc]
    taps = INTERMEDIATE_LAYER_IDX[enc]
    H, W = 616, 1064
    ph, pw = H // cfg.patch_size, W // cfg.patch_size  # 44, 76
    n_patch = ph * pw  # 3344
    hidden = 128
    k = 7
    dt = jnp.bfloat16
    rows: list = []
    rng = np.random.default_rng(0)

    if "full" in want:
        from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
        from monocular_depth_estimation_trt_tpu.registry import build_pipeline
        from monocular_depth_estimation_trt_tpu.runtime.benchmark import (
            benchmark,
        )

        pipe = build_pipeline("metric3d_v2", encoder=enc,
                              attn_impl=args.attn)
        eng = pipe.engine_for((H, W))
        eng.compile()
        ca = eng.cost_analysis() or {}
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0) or 0)
        byts = float(ca.get("bytes accessed", 0) or 0)
        frames = jax.device_put(rng.integers(
            0, 255, eng._example_args[1].shape, dtype=np.uint8))
        rep = benchmark(lambda f: eng(eng._example_args[0], f), (frames,),
                        config=BenchmarkConfig(warmup=3,
                                               iterations=args.iters),
                        name="full")
        t = rep.avg_seconds
        import json
        row = {
            "stage": "full", "measured_ms": round(t * 1e3, 3),
            "gflops": round(flops / 1e9, 1), "gbytes": round(byts / 1e9, 3),
            "compute_roof_ms": round(flops / PEAK_TFLOPS * 1e3, 3),
            "memory_roof_ms": round(byts / PEAK_HBM * 1e3, 3),
            "bound": "memory" if byts / PEAK_HBM > flops / PEAK_TFLOPS else "compute",
            "achieved_tfs": round(flops / t / 1e12, 1),
            "achieved_gbps": round(byts / t / 1e9, 1),
            "pct_of_roof": round(
                100.0 * max(flops / PEAK_TFLOPS, byts / PEAK_HBM) / t, 1),
        }
        print(json.dumps(row), flush=True)
        rows.append(row)

    x_pre = jax.device_put(
        (rng.standard_normal((1, H, W, 3)) * 0.5).astype(np.float32)
    ).astype(dt)
    taps_x = [jax.device_put(
        rng.standard_normal((1, n_patch, cfg.dim)).astype(np.float32)
    ).astype(dt) for _ in range(4)]
    ctx = jax.device_put(
        rng.standard_normal((1, 2 * ph, 2 * pw,
                             head_cfg["features"])).astype(np.float32)
    ).astype(dt)

    if "encoder" in want:
        vit = DinoViT(cfg, out_indices=taps, dtype=dt, attn_impl=args.attn)
        p0 = jax.jit(vit.init)(jax.random.PRNGKey(0), x_pre)
        measure("encoder", lambda p, x: vit.apply(p, x), (p0, x_pre),
                args.iters, rows)

    if "neck" in want:
        neck = DPTNeck(head_cfg["features"], tuple(head_cfg["out_channels"]),
                       dt)
        p0 = jax.jit(lambda r, f: neck.init(r, f, (ph, pw)))(
            jax.random.PRNGKey(0), taps_x)
        measure("neck", lambda p, f: neck.apply(p, f, (ph, pw)),
                (p0, taps_x), args.iters, rows)

    if "refine" in want:
        import flax.linen as nn

        class Refine(nn.Module):
            iters: int = 4

            @nn.compact
            def __call__(self, ctx):
                cnet = nn.Conv(2 * hidden, (3, 3), padding=1, dtype=dt,
                               name="context_conv")(ctx)
                h0, inp = jnp.split(cnet, [hidden], axis=-1)
                h = jnp.tanh(h0.astype(jnp.float32)).astype(dt)
                inp = nn.relu(inp)
                pred = nn.Conv(4, (3, 3), padding=1, dtype=dt,
                               name="init_head")(ctx).astype(jnp.float32)
                gru = ConvGRU(hidden, dt, name="gru")
                pred_enc = nn.Conv(hidden, (3, 3), padding=1, dtype=dt,
                                   name="pred_encoder")
                delta_head = nn.Conv(4, (3, 3), padding=1, dtype=dt,
                                     name="delta_head")
                for _ in range(self.iters):
                    e = nn.relu(pred_enc(pred.astype(dt)))
                    h = gru(h, jnp.concatenate([inp, e], axis=-1))
                    pred = pred + delta_head(h).astype(jnp.float32)
                mask = nn.Conv(9 * k * k, (1, 1), dtype=dt,
                               name="mask_head")(h)
                conf = nn.Conv(1, (3, 3), padding=1, dtype=dt,
                               name="conf_head")(h).astype(jnp.float32)
                return pred, conf, mask

        ref = Refine()
        p0 = jax.jit(ref.init)(jax.random.PRNGKey(0), ctx)
        measure("refine", lambda p, c: ref.apply(p, c), (p0, ctx),
                args.iters, rows)

    if "upsample" in want:
        pred = jax.device_put(rng.standard_normal(
            (1, 2 * ph, 2 * pw, 4)).astype(np.float32))
        conf = jax.device_put(rng.standard_normal(
            (1, 2 * ph, 2 * pw, 1)).astype(np.float32))
        mask = jax.device_put(rng.standard_normal(
            (1, 2 * ph, 2 * pw, 9 * k * k)).astype(np.float32)).astype(dt)

        def up_fn(pred, conf, mask):
            up = convex_upsample(
                jnp.concatenate([pred, conf], axis=-1).astype(dt), mask, k,
            ).astype(jnp.float32)
            d = 0.3 + (150.0 - 0.3) * jax.nn.sigmoid(up[..., 0])
            nrm = up[..., 1:4]
            nrm = nrm / jnp.maximum(
                jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-6)
            return d, nrm, jax.nn.sigmoid(up[..., 4])

        measure("upsample", up_fn, (pred, conf, mask), args.iters, rows)

    print("\n[roofline_metric3d] summary")
    print(f"{'stage':<10} {'ms':>8} {'GFLOP':>8} {'GB':>7} {'TF/s':>6} "
          f"{'GB/s':>6} {'bound':>7} {'%roof':>6}")
    for r in rows:
        print(f"{r['stage']:<10} {r['measured_ms']:>8.3f} "
              f"{r['gflops']:>8.1f} {r['gbytes']:>7.3f} "
              f"{r['achieved_tfs']:>6.1f} {r['achieved_gbps']:>6.1f} "
              f"{r['bound']:>7} {r['pct_of_roof']:>6.1f}")


if __name__ == "__main__":
    main()
