#!/usr/bin/env python
"""Per-stage roofline decomposition for the remaining big-compute families
(round-4 verdict item 5): depth_pro @1536², vggt @S views, moge2,
metric_anything.

Same methodology as scripts/roofline_vitl.py / roofline_metric3d.py: each
stage compiles as its OWN program with randomly-initialized params (perf
depends only on shapes); rows carry measured ms, XLA cost-analysis
flops/bytes, achieved TF/s / GB/s, and %-of-roof against the v5e peaks.
Compare stages within one run (the tunnel adds cross-run noise).

Stages per family:
  depth_pro        full | patch_encoder (35x384² batched ViT-L/16 pass —
                   the FLOPs monster) | image_encoder | decoder | head
  vggt             full | aggregator (24 alternating-attention blocks at
                   S*1374 global tokens) | depth_head | camera_head
                   (--views S picks the sequence length)
  moge2            full | encoder | head
  metric_anything  full | encoder | head

Usage: python scripts/roofline_family.py <family> [--iters 20]
       [--views 1] [--stages ...] [--attn auto]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from roofline_vitl import (  # noqa: E402
    PEAK_HBM,
    PEAK_TFLOPS,
    measure,
)


def _full_row(pipe_name, build_kw, in_hw, iters, rows, views=0):
    import json

    import jax
    import numpy as np

    from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
    from monocular_depth_estimation_trt_tpu.registry import build_pipeline
    from monocular_depth_estimation_trt_tpu.runtime.benchmark import benchmark

    pipe = build_pipeline(pipe_name, **build_kw)
    rng = np.random.default_rng(0)
    if views:
        rep = pipe.benchmark_views(views, BenchmarkConfig(warmup=3,
                                                          iterations=iters))
        eng = next(iter(pipe._engines.values()))
    else:
        eng = pipe.engine_for(in_hw)
        eng.compile()
        # split pipelines (moge2/metric_anything) expose (e1, e2); the
        # first program's example args carry the params + frame shape
        first = eng.e1 if hasattr(eng, "e1") else eng
        frames = jax.device_put(rng.integers(
            0, 255, first._example_args[1].shape, dtype=np.uint8))
        rep = benchmark(lambda f: eng(first._example_args[0], f), (frames,),
                        config=BenchmarkConfig(warmup=3, iterations=iters),
                        name="full")
    parts = [eng.e1, eng.e2] if hasattr(eng, "e1") else [eng]
    flops = byts = 0.0
    for part in parts:
        ca = part.cost_analysis() or {}
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops += float(ca.get("flops", 0) or 0)
        byts += float(ca.get("bytes accessed", 0) or 0)
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
    return pipe


def depth_pro_stages(want, iters, attn, rows):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from monocular_depth_estimation_trt_tpu.models.depth_pro import (
        HOOK_BLOCK_IDS,
        DepthProConfig,
        FOVNetwork,
        MultiresConvDecoder,
        ProjectUpsample,
    )
    from monocular_depth_estimation_trt_tpu.models.dpt import (
        PixelShuffleUpsample,
    )
    from monocular_depth_estimation_trt_tpu.models.vit import DinoViT

    c = DepthProConfig()
    vit = c.vit
    g = c.window // vit.patch_size  # 24
    n_patches = 5 * 5 + 3 * 3 + 1   # 35
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    if "full" in want:
        _full_row("depth_pro", {"attn_impl": attn}, (1536, 1536), iters,
                  rows)

    if "patch_encoder" in want:
        x = jax.device_put(rng.standard_normal(
            (n_patches, c.window, c.window, 3)).astype(np.float32)).astype(dt)
        enc = DinoViT(vit, out_indices=(*HOOK_BLOCK_IDS, vit.depth - 1),
                      raw_indices=HOOK_BLOCK_IDS, dtype=dt, attn_impl=attn)
        p0 = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
        measure("patch_encoder", lambda p, xx: enc.apply(p, xx), (p0, x),
                iters, rows)

    if "image_encoder" in want:
        x = jax.device_put(rng.standard_normal(
            (1, c.window, c.window, 3)).astype(np.float32)).astype(dt)
        enc = DinoViT(vit, out_indices=(vit.depth - 1,), dtype=dt,
                      attn_impl=attn)
        p0 = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
        measure("image_encoder", lambda p, xx: enc.apply(p, xx), (p0, x),
                iters, rows)

    if "decoder" in want or "head" in want:
        import flax.linen as nn

        de = (256, 512, 1024, 1024)
        feats = 256
        dim = vit.dim
        # merged latent grids feeding the decoder (models/depth_pro.py)
        latent0 = jax.device_put(rng.standard_normal(
            (1, 96, 96, dim)).astype(np.float32)).astype(dt)
        f1 = jax.device_put(rng.standard_normal(
            (1, 48, 48, dim)).astype(np.float32)).astype(dt)
        fg = jax.device_put(rng.standard_normal(
            (1, g, g, dim)).astype(np.float32)).astype(dt)

        class Dec(nn.Module):
            @nn.compact
            def __call__(self, l0, l1g, f0, f1, fg, img):
                lvl0 = ProjectUpsample(de[0], 3, dt, name="u0")(l0)
                lvl1 = ProjectUpsample(de[0], 2, dt, name="u1")(l1g)
                lvl2 = ProjectUpsample(de[1], 1, dt, name="u2")(f0)
                lvl3 = ProjectUpsample(de[2], 1, dt, name="u3")(f1)
                lvl4 = ProjectUpsample(de[3], 1, dt, name="u4")(fg)
                img_up = PixelShuffleUpsample(de[3], 2, dt, name="ul")(img)
                lvl4 = nn.Conv(de[3], (1, 1), dtype=dt, name="fl")(
                    jnp.concatenate([lvl4, img_up], axis=-1))
                return MultiresConvDecoder(feats, dt, name="dec")(
                    [lvl0, lvl1, lvl2, lvl3, lvl4])

        if "decoder" in want:
            dec = Dec()
            args = (latent0, latent0, latent0, f1, fg, fg)
            p0 = jax.jit(dec.init)(jax.random.PRNGKey(0), *args)
            measure("decoder", lambda p, *a: dec.apply(p, *a), (p0, *args),
                    iters, rows)

        if "head" in want:
            dout = jax.device_put(rng.standard_normal(
                (1, 768, 768, feats)).astype(np.float32)).astype(dt)
            cls = jax.device_put(rng.standard_normal(
                (1, dim)).astype(np.float32)).astype(dt)

            class Head(nn.Module):
                @nn.compact
                def __call__(self, y, cls):
                    h = nn.Conv(feats // 2, (3, 3), padding=1, dtype=dt,
                                name="c0")(y)
                    h = PixelShuffleUpsample(feats // 2, 2, dt, name="up")(h)
                    h = nn.Conv(32, (3, 3), padding=1, dtype=dt,
                                name="c1")(h)
                    h = nn.relu(h)
                    h = nn.Conv(1, (1, 1), dtype=dt, name="c2")(h)
                    cid = nn.relu(h)[..., 0].astype(jnp.float32)
                    fov = FOVNetwork(feats, dt, name="fov")(y, cls, (g, g))
                    return cid, fov

            head = Head()
            p0 = jax.jit(head.init)(jax.random.PRNGKey(0), dout, cls)
            measure("head", lambda p, y, cc: head.apply(p, y, cc),
                    (p0, dout, cls), iters, rows)


def vggt_stages(want, iters, attn, rows, views):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from monocular_depth_estimation_trt_tpu.models.vggt import (
        Aggregator,
        CameraHead,
        VGGTConfig,
        VGGTDepthHead,
    )

    g = VGGTConfig()
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    S = views
    ph = pw = 37
    n_tok = ph * pw + 1 + g.num_register_tokens  # 1374

    if "full" in want:
        _full_row("vggt", {"depth_only": True, "attn_impl": attn},
                  (518, 518), iters, rows, views=S if S > 1 else 0)

    if "aggregator" in want:
        x = jax.device_put(rng.standard_normal(
            (1, S, 518, 518, 3)).astype(np.float32)).astype(dt)
        agg = Aggregator(g, dt, attn)
        p0 = jax.jit(agg.init)(jax.random.PRNGKey(0), x)
        measure(f"aggregator_s{S}", lambda p, xx: agg.apply(p, xx), (p0, x),
                iters, rows)

    toks = [jax.device_put(rng.standard_normal(
        (1, S, n_tok, 2 * g.dim)).astype(np.float32)).astype(dt)
        for _ in range(4)]

    if "depth_head" in want:
        head = VGGTDepthHead(features=g.head_features,
                             out_channels=g.head_out_channels, dtype=dt)
        p0 = jax.jit(lambda r: head.init(
            r, toks, (ph, pw), 1 + g.num_register_tokens))(
                jax.random.PRNGKey(0))
        measure(f"depth_head_s{S}",
                lambda p, t: head.apply(p, t, (ph, pw),
                                        1 + g.num_register_tokens),
                (p0, toks), iters, rows)

    if "camera_head" in want:
        cam = CameraHead(2 * g.dim, num_heads=g.num_heads, dtype=dt)
        p0 = jax.jit(cam.init)(jax.random.PRNGKey(0), toks[-1])
        measure(f"camera_head_s{S}", lambda p, t: cam.apply(p, t),
                (p0, toks[-1]), iters, rows)


def moge_stages(name, want, iters, attn, rows):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from monocular_depth_estimation_trt_tpu.models.moge2 import (
        MoGe2,
        MoGeHead,
        grid_for_tokens,
    )
    from monocular_depth_estimation_trt_tpu.models.vit import (
        VIT_CONFIGS,
        DinoViT,
    )
    from monocular_depth_estimation_trt_tpu.models.depth_anything_v2 import (
        INTERMEDIATE_LAYER_IDX,
    )

    enc = "vits" if name == "moge2" else "vitl"
    num_tokens = 1800 if name == "moge2" else 3600
    predict_normal = name == "moge2"
    cfg = VIT_CONFIGS[enc]
    idxs = INTERMEDIATE_LAYER_IDX[enc]
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    H = W = 518
    gh, gw = grid_for_tokens(H, W, num_tokens, cfg.patch_size)

    if "full" in want:
        _full_row(name, {"attn_impl": attn} if name != "moge2"
                  else {"encoder": enc, "attn_impl": attn},
                  (H, W), iters, rows)

    if "encoder" in want:
        x = jax.device_put(rng.standard_normal(
            (1, gh * cfg.patch_size, gw * cfg.patch_size, 3)
        ).astype(np.float32)).astype(dt)
        vit = DinoViT(cfg, out_indices=idxs, dtype=dt, attn_impl=attn)
        p0 = jax.jit(vit.init)(jax.random.PRNGKey(0), x)
        measure("encoder", lambda p, xx: vit.apply(p, xx), (p0, x),
                iters, rows)

    if "head" in want:
        feats = [(jax.device_put(rng.standard_normal(
            (1, gh * gw, cfg.dim)).astype(np.float32)).astype(dt),
            jax.device_put(rng.standard_normal(
                (1, cfg.dim)).astype(np.float32)).astype(dt))
            for _ in range(4)]
        head = MoGeHead(num_levels=4, proj_dim=512, up_dims=(256, 128, 64),
                        predict_normal=predict_normal, dtype=dt)
        p0 = jax.jit(lambda r: head.init(r, feats, (gh, gw), (H, W)))(
            jax.random.PRNGKey(0))
        measure("head", lambda p, f: head.apply(p, f, (gh, gw), (H, W)),
                (p0, feats), iters, rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("family", choices=["depth_pro", "vggt", "moge2",
                                       "metric_anything"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--attn", default="auto")
    ap.add_argument("--views", type=int, default=1)
    ap.add_argument("--stages", default="")
    args = ap.parse_args()

    from monocular_depth_estimation_trt_tpu.runtime.cache import (
        enable_persistent_cache,
    )
    from monocular_depth_estimation_trt_tpu.weights.store import (
        set_allow_random_weights,
    )

    enable_persistent_cache()
    set_allow_random_weights(True)

    defaults = {
        "depth_pro": "full,patch_encoder,image_encoder,decoder,head",
        "vggt": "full,aggregator,depth_head,camera_head",
        "moge2": "full,encoder,head",
        "metric_anything": "full,encoder,head",
    }
    want = set((args.stages or defaults[args.family]).split(","))
    rows: list = []
    if args.family == "depth_pro":
        depth_pro_stages(want, args.iters, args.attn, rows)
    elif args.family == "vggt":
        vggt_stages(want, args.iters, args.attn, rows, args.views)
    else:
        moge_stages(args.family, want, args.iters, args.attn, rows)

    print(f"\n[roofline_{args.family}] summary")
    print(f"{'stage':<16} {'ms':>8} {'GFLOP':>8} {'GB':>7} {'TF/s':>6} "
          f"{'GB/s':>6} {'bound':>7} {'%roof':>6}")
    for r in rows:
        print(f"{r['stage']:<16} {r['measured_ms']:>8.3f} "
              f"{r['gflops']:>8.1f} {r['gbytes']:>7.3f} "
              f"{r['achieved_tfs']:>6.1f} {r['achieved_gbps']:>6.1f} "
              f"{r['bound']:>7} {r['pct_of_roof']:>6.1f}")


if __name__ == "__main__":
    main()
