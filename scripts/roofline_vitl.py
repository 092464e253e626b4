#!/usr/bin/env python
"""Per-stage roofline decomposition of DA-V2 ViT-L @518x518 (round-3 verdict
item 1: "prove or close the ViT-L MFU gap").

The whole-pipeline MFU table (docs/PERF.md) says the north-star config runs
at ~43% MFU with no proof of where the other 57% goes. This script times and
cost-analyses each stage as its OWN compiled program:

  full         the production engine (uint8 in -> depth out)
  encoder      DinoViT vitl (patch embed + 24 blocks + taps)
  head         DPTHead on fixed tap features
  attn_scan    24x the attention sublayer (LN1 + attn + LayerScale residual)
  mlp_scan     24x the MLP sublayer (LN2 + MLP + LayerScale residual)
  dense_chain  24x the four raw vitl matmuls (qkv/proj/fc1/fc2) — the
               pure-MXU ceiling at these shapes, no LN/attention/reshape
  attn_kernel  24x the attention core alone (flash or xla)

Each row: measured ms, XLA cost-analysis flops/bytes, achieved TF/s and GB/s,
%-of-roof. All scans run inside ONE program (lax.scan) so the per-launch
tunnel cost (~0.4 ms) is amortized — compare stages within this table.

v5e roofs: 197 TFLOP/s bf16, 819 GB/s HBM.

Usage: python scripts/roofline_vitl.py [--iters 30] [--stages full,encoder,...]
       [--encoder vitl] [--attn auto|flash|xla]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

PEAK_TFLOPS = 197e12
PEAK_HBM = 819e9


def _ca(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return (float(ca.get("flops", 0.0) or 0.0),
            float(ca.get("bytes accessed", 0.0) or 0.0))


def measure(name, fn, args, iters, rows, flop_scale: int = 1):
    """jit fn, read cost analysis, benchmark pipelined, emit a row.

    ``flop_scale``: XLA cost analysis reports a ``lax.scan`` body ONCE (not
    times the trip count) — pass the scan length so scan-stage rows carry
    whole-program flops/bytes."""
    import jax

    from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
    from monocular_depth_estimation_trt_tpu.runtime.benchmark import benchmark

    jfn = jax.jit(fn)
    lowered = jfn.lower(*args)
    compiled = lowered.compile()
    flops, byts = _ca(compiled)
    flops *= flop_scale
    byts *= flop_scale
    print(f"[roofline_vitl] {name}: compiled "
          f"(flops={flops:.3e} bytes={byts:.3e})", flush=True)
    rep = benchmark(jfn, args, config=BenchmarkConfig(warmup=4, iterations=iters),
                    name=name)
    t = rep.avg_seconds
    row = {
        "stage": name,
        "measured_ms": round(t * 1e3, 3),
        "gflops": round(flops / 1e9, 1),
        "gbytes": round(byts / 1e9, 3),
        "compute_roof_ms": round(flops / PEAK_TFLOPS * 1e3, 3),
        "memory_roof_ms": round(byts / PEAK_HBM * 1e3, 3),
        "bound": "memory" if byts / PEAK_HBM > flops / PEAK_TFLOPS else "compute",
        "achieved_tfs": round(flops / t / 1e12, 1),
        "achieved_gbps": round(byts / t / 1e9, 1),
        "pct_of_roof": round(100.0 * max(flops / PEAK_TFLOPS, byts / PEAK_HBM) / t, 1),
    }
    print(json.dumps(row), flush=True)
    rows.append(row)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--encoder", default="vitl")
    ap.add_argument("--attn", default="auto")
    ap.add_argument("--tokens", type=int, default=0,
                    help="override the token count for the scan/kernel "
                    "stages (block_scan/attn_scan/mlp_scan/dense_chain/"
                    "attn_kernel) — e.g. 3349 probes the metric3d "
                    "616x1064 grid; full/encoder/head stay at 518²")
    ap.add_argument("--batch", type=int, default=1,
                    help="batch the encoder/head/scan stages (b1-vs-bN "
                    "localizes where `mdet batch` loses its roofline win); "
                    "stage times are whole-batch — divide by B for "
                    "per-frame")
    ap.add_argument(
        "--stages",
        default=("full,encoder,head,block_scan,attn_scan,mlp_scan,"
                 "dense_chain,attn_kernel"),
        help=("also available: head_proj (taps->levels->rn convs), "
              "head_fuse (4 refinenets), head_out (output convs + 14x "
              "bilinear) — the DPT head decomposition"),
    )
    args = ap.parse_args()
    want = set(args.stages.split(","))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
        HEAD_CONFIGS,
        INTERMEDIATE_LAYER_IDX,
    )
    from monocular_depth_estimation_trt_tpu.models.dpt import DPTHead
    from monocular_depth_estimation_trt_tpu.models.vit import (
        VIT_CONFIGS,
        Attention,
        Block,
        DinoViT,
        LayerScale,
        Mlp,
    )
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.runtime.cache import (
        enable_persistent_cache,
    )
    from monocular_depth_estimation_trt_tpu.weights.store import (
        set_allow_random_weights,
    )

    enable_persistent_cache()
    set_allow_random_weights(True)

    enc = args.encoder
    cfg = VIT_CONFIGS[enc]
    head_cfg = HEAD_CONFIGS[enc]
    taps = INTERMEDIATE_LAYER_IDX[enc]
    hw = 518
    ph = pw = hw // cfg.patch_size  # 37
    n_tokens = args.tokens or (ph * pw + 1)  # 1370 @518²
    dt = jnp.bfloat16

    pipe = build_pipeline("depth_anything_v2", encoder=enc,
                          attn_impl=args.attn)
    params = pipe.params
    rows: list = []

    rng = np.random.default_rng(0)
    bsz = max(args.batch, 1)
    img_u8 = jax.device_put(
        rng.integers(0, 255, (hw, hw, 3), dtype=np.uint8))
    x_pre = jax.device_put(
        (rng.standard_normal((bsz, hw, hw, 3)) * 0.5).astype(np.float32)
    ).astype(dt)
    tokens = jax.device_put(
        rng.standard_normal((bsz, n_tokens, cfg.dim)).astype(np.float32)
    ).astype(dt)

    if "full" in want:
        eng = pipe.batch_engine_for((hw, hw), bsz)
        eng.compile()
        flops, byts = (lambda ca: (
            float((ca[0] if isinstance(ca, (list, tuple)) else ca).get("flops", 0)),
            float((ca[0] if isinstance(ca, (list, tuple)) else ca).get(
                "bytes accessed", 0)),
        ))(eng.cost_analysis() or {})
        from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
        from monocular_depth_estimation_trt_tpu.runtime.benchmark import (
            benchmark,
        )

        frames = jax.device_put(rng.integers(
            0, 255, eng._example_args[1].shape, dtype=np.uint8))
        rep = benchmark(lambda f: eng(eng._example_args[0], f), (frames,),
                        config=BenchmarkConfig(warmup=4, iterations=args.iters),
                        name="full")
        t = rep.avg_seconds
        row = {
            "stage": "full", "measured_ms": round(t * 1e3, 3),
            "gflops": round(flops / 1e9, 1), "gbytes": round(byts / 1e9, 3),
            "compute_roof_ms": round(flops / PEAK_TFLOPS * 1e3, 3),
            "memory_roof_ms": round(byts / PEAK_HBM * 1e3, 3),
            "bound": "memory" if byts / PEAK_HBM > flops / PEAK_TFLOPS
            else "compute",
            "achieved_tfs": round(flops / t / 1e12, 1),
            "achieved_gbps": round(byts / t / 1e9, 1),
            "pct_of_roof": round(
                100.0 * max(flops / PEAK_TFLOPS, byts / PEAK_HBM) / t, 1),
        }
        print(json.dumps(row), flush=True)
        rows.append(row)

    if "encoder" in want:
        vit = DinoViT(cfg, out_indices=taps, dtype=dt, attn_impl=args.attn)
        enc_params = {"params": params["pretrained"]}

        def enc_fn(p, x):
            return vit.apply(p, x)

        measure("encoder", enc_fn, (enc_params, x_pre), args.iters, rows)

    if "head" in want:
        head = DPTHead(in_channels=cfg.dim, features=head_cfg["features"],
                       out_channels=head_cfg["out_channels"],
                       final_act="relu", dtype=dt)
        head_params = {"params": params["depth_head"]}
        feats = [(tokens[:, 1:], tokens[:, 0]) for _ in range(4)]

        def head_fn(p, fs):
            return head.apply(p, fs, (ph, pw))

        measure("head", head_fn, (head_params, feats), args.iters, rows)

    if {"head_proj", "head_fuse", "head_out"} & want:
        # The full head as one module, split at its two natural seams by
        # running sub-apply closures against one shared param tree.
        import flax.linen as nn

        from monocular_depth_estimation_trt_tpu.models.dpt import (
            DPTHead,
            FeatureFusionBlock,
            PixelShuffleUpsample,
            _bilinear_ac,
        )

        head = DPTHead(in_channels=cfg.dim, features=head_cfg["features"],
                       out_channels=head_cfg["out_channels"],
                       final_act="relu", dtype=dt)
        head_params = {"params": params["depth_head"]}
        feats = [(tokens[:, 1:], tokens[:, 0]) for _ in range(4)]
        fts = head_cfg["features"]
        oc = list(head_cfg["out_channels"])

        class HeadProj(nn.Module):
            @nn.compact
            def __call__(self, features):
                levels = []
                for i, feat in enumerate(features):
                    t = feat[0]
                    b, n, d = t.shape
                    x = t.reshape(b, ph, pw, d).astype(dt)
                    x = nn.Conv(oc[i], (1, 1), dtype=dt,
                                name=f"project_{i}")(x)
                    if i == 0:
                        x = PixelShuffleUpsample(oc[0], 4, dt,
                                                 name="resize_0")(x)
                    elif i == 1:
                        x = PixelShuffleUpsample(oc[1], 2, dt,
                                                 name="resize_1")(x)
                    elif i == 3:
                        x = nn.Conv(oc[3], (3, 3), strides=(2, 2), padding=1,
                                    dtype=dt, name="resize_3")(x)
                    levels.append(nn.Conv(fts, (3, 3), padding=1,
                                          use_bias=False, dtype=dt,
                                          name=f"layer{i + 1}_rn")(x))
                return levels

        class HeadFuse(nn.Module):
            @nn.compact
            def __call__(self, rn):
                l1, l2, l3, l4 = rn
                p4 = FeatureFusionBlock(fts, dt, name="refinenet4")(
                    l4, size=l3.shape[1:3])
                p3 = FeatureFusionBlock(fts, dt, name="refinenet3")(
                    p4, l3, size=l2.shape[1:3])
                p2 = FeatureFusionBlock(fts, dt, name="refinenet2")(
                    p3, l2, size=l1.shape[1:3])
                return FeatureFusionBlock(fts, dt, name="refinenet1")(p2, l1)

        class HeadOut(nn.Module):
            @nn.compact
            def __call__(self, path1):
                out = nn.Conv(fts // 2, (3, 3), padding=1, dtype=dt,
                              name="output_conv1")(path1)
                out = _bilinear_ac(out, (ph * 14, pw * 14))
                out = nn.Conv(32, (3, 3), padding=1, dtype=dt,
                              name="output_conv2_0")(out)
                out = nn.relu(out)
                out = nn.Conv(1, (1, 1), dtype=dt, name="output_conv2_2")(out)
                return nn.relu(out)[..., 0].astype(jnp.float32)

        # shared params: each submodule's names match DPTHead's flat layout
        levels0 = jax.jit(lambda p, f: HeadProj().apply(p, f))(
            head_params, feats)
        path1_0 = jax.jit(lambda p, r: HeadFuse().apply(p, r))(
            head_params, levels0)
        if "head_proj" in want:
            measure("head_proj", lambda p, f: HeadProj().apply(p, f),
                    (head_params, feats), args.iters, rows)
        if "head_fuse" in want:
            measure("head_fuse", lambda p, r: HeadFuse().apply(p, r),
                    (head_params, levels0), args.iters, rows)
        if "head_out" in want:
            measure("head_out", lambda p, x: HeadOut().apply(p, x),
                    (head_params, path1_0), args.iters, rows)

    scan_len = cfg.depth

    if "block_scan" in want:
        blk = Block(cfg, dtype=dt, attn_impl=args.attn)
        p0 = blk.init(jax.random.PRNGKey(0), tokens)

        def block_scan(p, x):
            return jax.lax.scan(
                lambda c, _: (blk.apply(p, c), None), x, None,
                length=scan_len)[0]

        measure("block_scan", block_scan, (p0, tokens), args.iters, rows,
                flop_scale=scan_len)

    if "attn_scan" in want:
        import flax.linen as nn

        class AttnSub(nn.Module):
            @nn.compact
            def __call__(self, x):
                h = nn.LayerNorm(epsilon=1e-6, dtype=dt, name="norm1")(x)
                h = Attention(cfg.dim, cfg.num_heads, dtype=dt,
                              attn_impl=args.attn, name="attn")(h)
                return x + LayerScale(cfg.dim, dtype=dt, name="ls1")(h)

        sub = AttnSub()
        p0 = sub.init(jax.random.PRNGKey(0), tokens)

        def attn_scan(p, x):
            return jax.lax.scan(
                lambda c, _: (sub.apply(p, c), None), x, None,
                length=scan_len)[0]

        measure("attn_scan", attn_scan, (p0, tokens), args.iters, rows,
                flop_scale=scan_len)

    if "mlp_scan" in want:
        import flax.linen as nn

        class MlpSub(nn.Module):
            @nn.compact
            def __call__(self, x):
                h = nn.LayerNorm(epsilon=1e-6, dtype=dt, name="norm2")(x)
                h = Mlp(cfg.dim, int(cfg.dim * cfg.mlp_ratio), dtype=dt,
                        name="mlp")(h)
                return x + LayerScale(cfg.dim, dtype=dt, name="ls2")(h)

        sub = MlpSub()
        p0 = sub.init(jax.random.PRNGKey(0), tokens)

        def mlp_scan(p, x):
            return jax.lax.scan(
                lambda c, _: (sub.apply(p, c), None), x, None,
                length=scan_len)[0]

        measure("mlp_scan", mlp_scan, (p0, tokens), args.iters, rows,
                flop_scale=scan_len)

    if "dense_chain" in want:
        d = cfg.dim
        key = jax.random.PRNGKey(1)
        ks = jax.random.split(key, 4)
        w_qkv = (jax.random.normal(ks[0], (d, 3 * d)) * 0.02).astype(dt)
        w_proj = (jax.random.normal(ks[1], (d, d)) * 0.02).astype(dt)
        w_fc1 = (jax.random.normal(ks[2], (d, 4 * d)) * 0.02).astype(dt)
        w_fc2 = (jax.random.normal(ks[3], (4 * d, d)) * 0.02).astype(dt)
        x2d = tokens.reshape(-1, cfg.dim)  # (B*N, d): one big matmul M

        def dense_chain(ws, x):
            wq, wp, w1, w2 = ws

            def body(c, _):
                a = (c @ wq)[:, :d] @ wp
                b = (c @ w1) @ w2
                return a + b, None

            return jax.lax.scan(body, x, None, length=scan_len)[0]

        measure("dense_chain", dense_chain,
                ((w_qkv, w_proj, w_fc1, w_fc2), x2d), args.iters, rows,
                flop_scale=scan_len)

    if "attn_kernel" in want:
        hd = cfg.dim // cfg.num_heads
        q = tokens.reshape(bsz, n_tokens, cfg.num_heads, hd)
        q = jnp.swapaxes(q, 1, 2)
        from monocular_depth_estimation_trt_tpu.ops.pallas.flash_attention import (
            attention_reference,
            flash_attention,
        )

        core = (attention_reference if args.attn == "xla" else
                functools.partial(flash_attention))

        def attn_kernel(qkv):
            qq, kk, vv = qkv

            def body(c, _):
                return core(c, kk, vv), None

            return jax.lax.scan(body, qq, None, length=scan_len)[0]

        measure("attn_kernel", attn_kernel, ((q, q, q),), args.iters, rows,
                flop_scale=scan_len)

    print("\n[roofline_vitl] summary")
    hdr = (f"{'stage':<12} {'ms':>8} {'GFLOP':>8} {'GB':>7} {'TF/s':>6} "
           f"{'GB/s':>6} {'bound':>7} {'%roof':>6}")
    print(hdr)
    for r in rows:
        print(f"{r['stage']:<12} {r['measured_ms']:>8.3f} {r['gflops']:>8.1f} "
              f"{r['gbytes']:>7.3f} {r['achieved_tfs']:>6.1f} "
              f"{r['achieved_gbps']:>6.1f} {r['bound']:>7} "
              f"{r['pct_of_roof']:>6.1f}")


if __name__ == "__main__":
    main()
