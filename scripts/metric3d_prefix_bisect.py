#!/usr/bin/env python
"""In-situ prefix bisect of the metric3d_v2 full engine (TPU).

Standalone per-stage programs (scripts/roofline_metric3d.py) do not add up
to the full engine's time (XLA fuses across stage seams; the tunnel adds
per-program noise), so localize inside ONE program family instead: compile
the pipeline's own forward cut off after each stage, all sharing the same
preprocess + params, each returning a 1-element reduction. The DELTA
between consecutive prefixes is the in-situ cost of that stage inside the
real program (round-4 "component floor stack" methodology, applied to the
round-4 verdict's #1 target: metric3d at 48.6% of roof).

Stages: pre -> encoder -> neck -> refine -> upsample(+acts) -> post(full).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--attn", default="auto")
    ap.add_argument("--upto", default="pre,encoder,neck,refine,upsample,full")
    args = ap.parse_args()
    want = [s for s in args.upto.split(",") if s]

    import dataclasses

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
    from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
        HEAD_CONFIGS,
        INTERMEDIATE_LAYER_IDX,
    )
    from monocular_depth_estimation_trt_tpu.models.metric3d_v2 import (
        DEPTH_RANGE,
        ConvGRU,
        DPTNeck,
        convex_upsample,
    )
    from monocular_depth_estimation_trt_tpu.models.vit import (
        VIT_CONFIGS,
        DinoViT,
    )
    from monocular_depth_estimation_trt_tpu.ops.postprocess import crop_pad
    from monocular_depth_estimation_trt_tpu.ops.preprocess import (
        preprocess_keep_ratio_pad,
    )
    from monocular_depth_estimation_trt_tpu.ops.resize import resize_hw
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.runtime.benchmark import benchmark
    from monocular_depth_estimation_trt_tpu.runtime.cache import (
        enable_persistent_cache,
    )
    from monocular_depth_estimation_trt_tpu.weights.store import (
        set_allow_random_weights,
    )

    enable_persistent_cache()
    set_allow_random_weights(True)

    enc = "vitl"
    canvas = (616, 1064)
    H, W = canvas
    vit_cfg = dataclasses.replace(VIT_CONFIGS[enc], num_register_tokens=4)
    head_cfg = HEAD_CONFIGS[enc]
    out_indices = INTERMEDIATE_LAYER_IDX[enc]
    hidden, k, iters_gru = 128, 7, 4
    ph, pw = H // vit_cfg.patch_size, W // vit_cfg.patch_size
    dt = jnp.bfloat16

    pipe = build_pipeline("metric3d_v2", encoder=enc, attn_impl=args.attn)
    params = pipe.params

    class Prefix(nn.Module):
        """Metric3DV2.__call__ body, cut after ``upto``; submodule names
        match models/metric3d_v2.py so the pipeline's params apply."""

        upto: str

        @nn.compact
        def __call__(self, x):
            feats = DinoViT(vit_cfg, out_indices=out_indices, dtype=dt,
                            attn_impl=args.attn, name="encoder")(x)
            if self.upto == "encoder":
                return sum(jnp.sum(f[0]) + jnp.sum(f[1]) for f in feats)
            ctx = DPTNeck(head_cfg["features"],
                          tuple(head_cfg["out_channels"]), dt,
                          name="neck")(feats, (ph, pw))
            if self.upto == "neck":
                return jnp.sum(ctx)
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
            for _ in range(iters_gru):
                e = nn.relu(pred_enc(pred.astype(dt)))
                h = gru(h, jnp.concatenate([inp, e], axis=-1))
                pred = pred + delta_head(h).astype(jnp.float32)
            mask = nn.Conv(9 * k * k, (1, 1), dtype=dt, name="mask_head")(h)
            conf = nn.Conv(1, (3, 3), padding=1, dtype=dt,
                           name="conf_head")(h).astype(jnp.float32)
            if self.upto == "refine":
                return jnp.sum(pred) + jnp.sum(conf) + jnp.sum(mask)
            up = convex_upsample(
                jnp.concatenate([pred, conf], axis=-1).astype(dt), mask, k,
            ).astype(jnp.float32)
            d_min, d_max = DEPTH_RANGE
            depth = d_min + (d_max - d_min) * jax.nn.sigmoid(up[..., 0])
            normal = up[..., 1:4]
            normal = normal / jnp.maximum(
                jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-6)
            confidence = jax.nn.sigmoid(up[..., 4])
            return (jnp.sum(depth) + jnp.sum(normal) + jnp.sum(confidence))

    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    mp = {"params": params["params"] if "params" in params else params}

    rows = []

    def run(name, fn, fargs):
        jfn = jax.jit(fn)
        jfn(*fargs)
        rep = benchmark(jfn, fargs,
                        config=BenchmarkConfig(warmup=4,
                                               iterations=args.iters),
                        name=name)
        ms = rep.avg_seconds * 1e3
        prev = rows[-1][1] if rows else 0.0
        rows.append((name, ms))
        print(f"{name:<10} {ms:9.3f} ms   (delta {ms - prev:+8.3f})",
              flush=True)

    def pre_fn(im):
        x, pad, scale = preprocess_keep_ratio_pad(im, canvas)
        return jnp.sum(x), pad, scale

    if "pre" in want:
        run("pre", pre_fn, (img,))

    for upto in ("encoder", "neck", "refine", "upsample"):
        if upto not in want:
            continue
        mod = Prefix(upto=upto)

        def fn(im, _mod=mod):
            x, pad, scale = preprocess_keep_ratio_pad(im, canvas)
            return _mod.apply(mp, x)

        run(upto, fn, (img,))

    if "full" in want:
        fwd = pipe._forward  # the production forward (post included)

        def full_fn(im):
            out = fwd(params, im[None], (H, W))
            return jnp.sum(out["depth"]) + jnp.sum(out["confidence"])

        run("full", full_fn, (img,))

    print("\nstage deltas (in-situ):")
    for i, (name, ms) in enumerate(rows):
        d = ms - rows[i - 1][1] if i else ms
        print(f"  {name:<10} {d:8.3f} ms")


if __name__ == "__main__":
    main()
