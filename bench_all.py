"""Full-zoo benchmark: every model family vs its reference TRT baseline.

Writes ``BENCH_ALL.json`` and prints a table. ``bench.py`` remains the
driver's single-line headline benchmark; this is the complete evidence run
(reference numbers from the per-model READMEs, mirrored in SURVEY.md §6 /
BASELINE.md — RTX3060 laptop TRT fp16).

Usage: python bench_all.py [--quick] [--models m1,m2,...]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# (model, build kwargs, input hw, reference TRT fps)
SUITE = [
    ("depth_anything_v2", {"encoder": "vits"}, (518, 518), 122.92),
    ("distill_any_depth", {"encoder": "vits"}, (518, 518), 121.36),
    ("depth_anything_ac", {"encoder": "vits"}, (518, 518), 133.14),
    ("depth_anything_v2", {"encoder": "vitl"}, (518, 518), None),  # north star
    ("depth_anything_v3", {}, (518, 518), 20.12),
    ("unidepth_v2", {"encoder": "vitb"}, (518, 518), 36.86),
    ("unik3d", {"encoder": "vitb"}, (518, 518), 30.23),
    ("metric3d_v2", {"encoder": "vitl"}, (616, 1064), 6.09),
    ("moge2", {"encoder": "vits"}, (518, 518), 21.27),
    ("metric_anything", {"encoder": "vitl"}, (518, 518), 4.91),
    ("depth_pro", {}, (1536, 1536), 1.41),
    ("vggt", {"depth_only": True}, (518, 518), 7.15),
    ("streamvggt", {}, (518, 518), 5.77),
    # staged families (reference later/ — no published TRT baselines)
    ("dkt", {"encoder": "vits"}, (518, 518), None),
    ("flashdepth", {"encoder": "vits"}, (518, 518), None),
    ("prior_depth_anything", {"encoder": "vits"}, (518, 518), None),
    ("dinov3", {"encoder": "vits16"}, (1024, 1024), None),
    ("geocalib", {}, (322, 322), None),
    ("map_anything", {}, (518, 518), None),
    ("cotracker3", {}, (384, 512), None),
    ("video_depth_anything", {"encoder": "vits"}, (518, 518), None),
    ("stream3r", {}, (518, 518), None),
    ("align3r", {}, (512, 512), None),
    ("sidepth", {"encoder": "vits"}, (518, 518), None),
    ("bridge", {"encoder": "vits"}, (518, 518), None),
    ("litevggt", {}, (518, 518), None),
    ("waft", {}, (280, 504), None),
    # SLAM recipes (reference later/{MegaSaM,VIPE,WildGS-SLAM} README-only
    # staging dirs): the hot jitted core — LM-BA solve (megasam/vipe, K=8
    # keyframes at this grid resolution) / splat-mapping step (wildgs_slam).
    ("megasam", {}, (288, 512), None),
    ("vipe", {}, (288, 512), None),
    ("wildgs_slam", {}, (144, 256), None),
    ("raft", {}, (288, 512), 21.96),
    ("neuflow", {}, (288, 512), 25.88),
    ("meflow", {}, (288, 512), 18.52),
    ("memfof", {}, (288, 512), 14.11),
]

# Batched offline-serving rows (apps/offline.py path; reference has no
# batch>1 serving at all — its engines pin batch=1, SURVEY.md §2.1).
# (model, build kwargs, input hw, batch)
BATCHED_SUITE = [
    ("depth_anything_v2", {"encoder": "vits"}, (518, 518), 8),
    ("depth_anything_ac", {"encoder": "vits"}, (518, 518), 8),
    # ViT-L: the compute-bound end — batching amortizes weight reads and
    # fills the MXU; contrast with the HBM-bound vits plateau (docs/PERF.md)
    ("depth_anything_v2", {"encoder": "vitl"}, (518, 518), 4),
]

# VGGT multi-view rows: the S axis the reference could not export
# (VGGT/onnx_export.py:63 pins S=1). Per-frame FPS of the S-view program.
# (model, build kwargs, S)
VIEWS_SUITE = [
    ("vggt", {"depth_only": True}, 2),
    ("vggt", {"depth_only": True}, 4),
    ("vggt", {"depth_only": True}, 8),
]

# Video end-to-end rows: decode -> flow -> color-wheel MP4 over the committed
# fixture data/example_video.mp4 (the reference's video loop,
# RAFT/onnx2trt.py:150-196, gen_video2imgs.py). Wall-clock FPS including
# host decode + MP4 encode — the honest serving number, unlike the
# device-resident SUITE rows. (model, build kwargs)
VIDEO_SUITE = [
    ("raft", {}),
]

# SLAM recipe end-to-end over the committed video fixture: real DA disparity
# + RAFT flow through the framework's own engines (not the synthetic BA
# problem the `megasam` SUITE row times). Emits the BA quality gates
# (rms_px, focal) and a CVD temporal-consistency metric alongside wall-clock
# FPS. Reference role: later/MegaSaM/README.md recipe staging.
SLAM_E2E_SUITE = [
    ("megasam", {}),
]


# Int8 w8a8 static-calibration serving rows (ops/quant.py; the reference's
# TRT engines are fp16-only — no INT8 calibrator exists in the reference).
# vitl is the compute-bound end where the int8 MXU's 2x TOPS can pay;
# baseline column = the same config's bf16 row for direct comparison.
QUANT_SUITE = [
    ("depth_anything_v2", {"encoder": "vitl", "precision": "int8"}, (518, 518)),
    ("depth_anything_v2", {"encoder": "vits", "precision": "int8"}, (518, 518)),
    # the zoo's most compute-bound families — where int8 should pay most
    ("metric3d_v2", {"encoder": "vitl", "precision": "int8"}, (616, 1064)),
    ("depth_pro", {"precision": "int8"}, (1536, 1536)),
    # largest weight footprint (~1B): int8 halves resident+streamed weights
    ("vggt", {"depth_only": True, "precision": "int8"}, (518, 518)),
]


# v5e single-chip roofs (same constants as scripts/roofline.py)
PEAK_TFLOPS = 197e12
PEAK_HBM = 819e9

_DISPATCH_FLOOR_S: float | None = None


def _dispatch_floor_s() -> float:
    """Measured per-iteration dispatch/launch floor of this run's backend.

    The flops/bytes roofline is a pure-execution bound; every benchmarked
    iteration also pays a program-launch + pipelined-dispatch cost that the
    cost analysis cannot see. Round 4's bound omitted it, so a small program
    (DA-V2 vits, ~3.5 ms) read 108.7% of its own "roof" — a ceiling that can
    be exceeded certifies nothing. Measure the floor once per run as the
    avg iteration time of a trivially small jitted program under the SAME
    pipelined benchmark protocol, and add it to every program's bound.
    """
    global _DISPATCH_FLOOR_S
    if _DISPATCH_FLOOR_S is None:
        import jax

        from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
        from monocular_depth_estimation_trt_tpu.runtime.benchmark import (
            benchmark,
        )

        f = jax.jit(lambda x: x + 1.0)
        x = jax.device_put(np.zeros((8, 128), np.float32))
        f(x)  # compile outside the timed loop
        rep = benchmark(f, (x,),
                        config=BenchmarkConfig(warmup=5, iterations=50),
                        name="dispatch_floor")
        _DISPATCH_FLOOR_S = rep.avg_seconds
        print(f"[bench_all] dispatch floor: {rep.avg_seconds * 1e3:.3f} ms")
    return _DISPATCH_FLOOR_S


def _pct_of_roof(pipe, avg_seconds: float, frames: int = 1):
    """Roofline %-of-bound for the engine a benchmark just ran.

    Makes "fast" falsifiable for the 19 staged families that have no
    published TRT baseline (round-3 verdict item 5): the bound is the XLA
    cost-analysis roofline max(flops/peak, bytes/HBM) of the COMPILED
    program plus the measured per-iteration dispatch floor (see
    :func:`_dispatch_floor_s`; provenance documented in docs/PERF.md) —
    so pct_of_roof says how close the measured rate is to the chip's own
    ceiling for this exact graph, and measured <= bound by construction
    of its terms. Returns (pct, bound_ms) or (None, None) when cost
    analysis is missing.
    """
    try:
        engines = getattr(pipe, "_engines", None)
        if engines:
            eng = next(iter(engines.values()))
            # split pipelines (moge2/metric_anything `_SplitEngine`) run TWO
            # compiled programs back to back; the bound sums both programs'
            # terms and pays the dispatch floor once per program
            parts = [eng.e1, eng.e2] if hasattr(eng, "e1") else [eng]
        else:
            # SLAM recipes benchmark an AOT-compiled step directly and stash
            # it (slam/recipes.py); compiled executables expose the same
            # cost/memory analysis surface as Engine
            parts = list(getattr(pipe, "_bench_compiled", []) or [])
            if not parts:
                return None, None
        flops = byts = min_bytes = 0.0
        for part in parts:
            ca = part.cost_analysis() or {}
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            p_flops = float(ca.get("flops", 0.0) or 0.0)
            p_byts = float(ca.get("bytes accessed", 0.0) or 0.0)
            # The memory term must be a PROVABLE lower bound on HBM traffic.
            # XLA's "bytes accessed" over-counts on fusion-heavy programs
            # (vggt reads an apparent 935 GB/s on an 819 GB/s chip —
            # impossible), so a bound built from it can exceed the measured
            # rate. The certified floor is what the program cannot avoid
            # touching at least once: arguments (incl. params) + outputs −
            # aliased pairs, from the compiled executable's memory
            # analysis. Take min() with the cost-analysis bytes — a lower
            # bound may only shrink.
            p_min = p_byts
            try:
                ma = part.memory_analysis()
            except AttributeError:
                ma = None
            if ma is not None:
                arg = float(getattr(ma, "argument_size_in_bytes", 0) or 0)
                out = float(getattr(ma, "output_size_in_bytes", 0) or 0)
                alias = float(getattr(ma, "alias_size_in_bytes", 0) or 0)
                if arg + out > 0:
                    p_min = min(p_min, arg + out - alias)
            flops += p_flops
            byts += p_byts
            min_bytes += p_min
        if flops <= 0 and byts <= 0:
            return None, None
        # bound and avg_seconds are both whole-program (all `frames` frames)
        bound_s = (max(flops / PEAK_TFLOPS, min_bytes / PEAK_HBM)
                   + _dispatch_floor_s() * len(parts))
        return (round(100.0 * bound_s / avg_seconds, 1),
                round(bound_s / max(frames, 1) * 1e3, 3))
    except Exception:
        return None, None


def _run_isolated(tag: str, quick: bool, retries: int = 2) -> dict:
    """Benchmark one model in a fresh subprocess.

    The development TPU worker occasionally crashes ('kernel fault'); in a
    single process that kills the jax backend for every subsequent model.
    Per-row subprocesses + retries keep one flake from poisoning the suite
    (the persistent XLA cache makes re-runs cheap)."""
    import subprocess
    import sys

    last = {"model": tag, "error": "no attempts"}
    for attempt in range(retries + 1):
        cmd = [sys.executable, __file__, "--models", tag, "--out", "-"]
        if quick:
            cmd.append("--quick")
        row_timeout = int(os.environ.get("MDET_BENCH_ROW_TIMEOUT", "3600"))
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=row_timeout)
        except subprocess.TimeoutExpired:
            last = {"model": tag, "error": f"row timeout {row_timeout}s "
                    "(axon tunnel stall?)"}
            print(f"[bench_all] {tag}: attempt {attempt + 1} timed out")
            continue
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{") and f'"model": "{tag}"' in line:
                row = json.loads(line)
                if "error" not in row:
                    return row
                last = row
        if proc.returncode != 0 and "error" not in last:
            last = {"model": tag, "error": f"exit {proc.returncode}"}
        print(f"[bench_all] {tag}: attempt {attempt + 1} failed, retrying")
    return last


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="20 iterations")
    ap.add_argument("--models", default="", help="comma-separated subset")
    ap.add_argument("--out", default="BENCH_ALL.json")
    ap.add_argument("--isolate", action="store_true",
                    help="one subprocess per model with retries (robust "
                    "against TPU-worker crashes)")
    args = ap.parse_args()

    if args.isolate:
        subset = {s for s in args.models.split(",") if s}
        results = []
        tags = [
            name + ("_" + kw.get("encoder", "") if kw.get("encoder") else "")
            for name, kw, _, _ in SUITE
        ] + [
            name + ("_" + kw.get("encoder", "") if kw.get("encoder") else "")
            + f"_b{b}"
            for name, kw, _, b in BATCHED_SUITE
        ] + [
            f"{name}_s{s}" for name, _, s in VIEWS_SUITE
        ] + [
            f"{name}_video" for name, _ in VIDEO_SUITE
        ] + [
            f"{name}_e2e" for name, _ in SLAM_E2E_SUITE
        ] + [
            name + ("_" + kw["encoder"] if kw.get("encoder") else "")
            + "_int8"
            for name, kw, _ in QUANT_SUITE
        ]
        names = ([s[0] for s in SUITE] + [s[0] for s in BATCHED_SUITE]
                 + [s[0] for s in VIEWS_SUITE] + [s[0] for s in VIDEO_SUITE]
                 + [s[0] for s in SLAM_E2E_SUITE]
                 + [s[0] for s in QUANT_SUITE])
        for name, tag in zip(names, tags):
            if subset and name not in subset and tag not in subset:
                continue
            row = _run_isolated(tag, args.quick)
            results.append(row)
            print(json.dumps(row))
        _finish(results, args.out)
        return

    from monocular_depth_estimation_trt_tpu.config import BenchmarkConfig
    from monocular_depth_estimation_trt_tpu.registry import (
        build_pipeline,
        get_fidelity,
    )
    from monocular_depth_estimation_trt_tpu.runtime.cache import (
        enable_persistent_cache,
    )
    from monocular_depth_estimation_trt_tpu.weights.store import (
        set_allow_random_weights,
    )

    enable_persistent_cache()
    set_allow_random_weights(True)  # benchmark-only path; WARNed per model
    subset = {s for s in args.models.split(",") if s}
    cfg = BenchmarkConfig(warmup=3 if args.quick else 10,
                          iterations=20 if args.quick else 100)

    results = []
    for name, kw, in_hw, baseline in SUITE:
        tag = name + ("_" + kw.get("encoder", "") if kw.get("encoder") else "")
        if subset and name not in subset and tag not in subset:
            continue
        try:
            t0 = time.time()
            pipe = build_pipeline(name, **kw)
            if name == "memfof":
                rep = pipe.benchmark(config=cfg)
            else:
                rep = pipe.benchmark(in_hw, cfg)
            p50 = rep.percentile_ms(50)
            row = {
                "model": tag,
                "input_hw": list(in_hw),
                "fps": round(rep.fps, 2),
                "avg_ms": round(rep.avg_ms, 2),
                "latency_p50_ms": round(p50, 2) if p50 is not None else None,
                "fidelity": get_fidelity(name),
                "baseline_trt_fps": baseline,
                "speedup_vs_trt": round(rep.fps / baseline, 2) if baseline else None,
                "build_s": round(time.time() - t0 - rep.total_seconds, 1),
            }
            pct, bound_ms = _pct_of_roof(pipe, rep.avg_seconds)
            row["pct_of_roof"] = pct
            row["roofline_bound_ms"] = bound_ms
        except Exception as e:  # keep the suite running
            row = {"model": tag, "error": repr(e)[:200]}
        results.append(row)
        print(json.dumps(row))

    import jax

    from monocular_depth_estimation_trt_tpu.runtime.benchmark import benchmark

    for name, kw, in_hw, batch in BATCHED_SUITE:
        tag = (name + ("_" + kw.get("encoder", "") if kw.get("encoder")
                       else "") + f"_b{batch}")
        if subset and name not in subset and tag not in subset:
            continue
        try:
            t0 = time.time()
            pipe = build_pipeline(name, **kw)
            eng = pipe.batch_engine_for(in_hw, batch)
            eng.compile()
            rng = np.random.default_rng(0)
            frames = jax.device_put(
                rng.integers(0, 255, (batch, *in_hw, 3), dtype=np.uint8)
            )
            rep = benchmark(lambda f: eng(pipe.params, f), (frames,),
                            config=cfg, name=tag)
            rep.frames_per_iteration = batch
            p50 = rep.percentile_ms(50)
            row = {
                "model": tag,
                "input_hw": list(in_hw),
                "batch": batch,
                "fps": round(rep.fps, 2),
                "avg_ms": round(rep.avg_ms, 2),
                "latency_p50_ms": round(p50, 2) if p50 is not None else None,
                "fidelity": get_fidelity(name),
                "baseline_trt_fps": None,
                "speedup_vs_trt": None,
                "build_s": round(time.time() - t0 - rep.total_seconds, 1),
            }
            pct, bound_ms = _pct_of_roof(pipe, rep.avg_seconds, frames=batch)
            row["pct_of_roof"] = pct
            row["roofline_bound_ms"] = bound_ms
        except Exception as e:
            row = {"model": tag, "error": repr(e)[:200]}
        results.append(row)
        print(json.dumps(row))

    for name, kw, s in VIEWS_SUITE:
        tag = f"{name}_s{s}"
        if subset and name not in subset and tag not in subset:
            continue
        try:
            t0 = time.time()
            pipe = build_pipeline(name, **kw)
            rep = pipe.benchmark_views(s, cfg)
            p50 = rep.percentile_ms(50)
            row = {
                "model": tag,
                "views": s,
                "fps": round(rep.fps, 2),
                "avg_ms": round(rep.avg_ms, 2),
                "latency_p50_ms": round(p50, 2) if p50 is not None else None,
                "fidelity": get_fidelity(name),
                "baseline_trt_fps": None,
                "speedup_vs_trt": None,
                "build_s": round(time.time() - t0 - rep.total_seconds, 1),
            }
            pct, bound_ms = _pct_of_roof(pipe, rep.avg_seconds, frames=s)
            row["pct_of_roof"] = pct
            row["roofline_bound_ms"] = bound_ms
        except Exception as e:
            row = {"model": tag, "error": repr(e)[:200]}
        results.append(row)
        print(json.dumps(row))

    for name, kw in VIDEO_SUITE:
        tag = f"{name}_video"
        if subset and name not in subset and tag not in subset:
            continue
        try:
            import tempfile

            from monocular_depth_estimation_trt_tpu.apps.streaming import (
                extract_frames_from_video,
                run_flow_frames,
            )

            t0 = time.time()
            pipe = build_pipeline(name, **kw)
            fixture = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "data", "example_video.mp4")
            with tempfile.TemporaryDirectory() as td:
                frames_dir = os.path.join(td, "frames")
                extract_frames_from_video(fixture, frames_dir)
                out_mp4 = os.path.join(td, f"{name}_flow.mp4")
                # warm run compiles + materializes the transfer paths
                run_flow_frames(pipe, frames_dir, out_mp4, max_pairs=2)
                build_s = time.time() - t0
                t1 = time.time()
                run_flow_frames(pipe, frames_dir, out_mp4)
                wall = time.time() - t1
                n_pairs = len(os.listdir(frames_dir)) - 1
                assert os.path.getsize(out_mp4) > 0
            row = {
                "model": tag,
                "input_hw": [288, 512],
                "frames": n_pairs,
                "fps": round(n_pairs / wall, 2),
                "avg_ms": round(wall / n_pairs * 1e3, 2),
                "note": "end-to-end video: host decode + flow + MP4 encode",
                "fidelity": get_fidelity(name),
                "baseline_trt_fps": None,
                "speedup_vs_trt": None,
                "build_s": round(build_s, 1),
            }
        except Exception as e:
            row = {"model": tag, "error": repr(e)[:200]}
        results.append(row)
        print(json.dumps(row))

    for name, kw in SLAM_E2E_SUITE:
        tag = f"{name}_e2e"
        if subset and name not in subset and tag not in subset:
            continue
        try:
            import tempfile

            import cv2

            from monocular_depth_estimation_trt_tpu.apps.streaming import (
                extract_frames_from_video,
            )

            t0 = time.time()
            pipe = build_pipeline(name, **kw)
            fixture = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "data", "example_video.mp4")
            with tempfile.TemporaryDirectory() as td:
                frames_dir = os.path.join(td, "frames")
                extract_frames_from_video(fixture, frames_dir)
                frames = [
                    cv2.cvtColor(cv2.imread(os.path.join(frames_dir, f)),
                                 cv2.COLOR_BGR2RGB)
                    for f in sorted(os.listdir(frames_dir))
                ]
            # warm pass compiles the DA/RAFT engines + the BA solver
            pipe.run(frames[:4])
            build_s = time.time() - t0
            t1 = time.time()
            res = pipe.run(frames)
            cvd = pipe.consistent_video_depth(frames, res)
            wall = time.time() - t1
            # temporal consistency of the CVD output: median over adjacent
            # frame pairs of the mean |Δdisparity|, normalized by the median
            # disparity magnitude (scale-free; lower = more consistent)
            stack = np.stack(cvd)
            denom = float(np.median(np.abs(stack))) or 1.0
            cvd_mad = float(np.median(
                [np.mean(np.abs(stack[i + 1] - stack[i]))
                 for i in range(len(stack) - 1)])) / denom
            row = {
                "model": tag,
                "frames": len(frames),
                "fps": round(len(frames) / wall, 2),
                "avg_ms": round(wall / len(frames) * 1e3, 2),
                "note": ("end-to-end SLAM recipe: host decode + DA "
                         "disparity + RAFT flow + LM-BA + CVD"),
                "rms_px": round(float(res.rms_px), 3),
                "focal_px": round(float(res.focal), 1),
                "keyframes": len(res.keyframe_indices),
                "cvd_temporal_mad": round(cvd_mad, 4),
                "fidelity": get_fidelity(name),
                "baseline_trt_fps": None,
                "speedup_vs_trt": None,
                "build_s": round(build_s, 1),
            }
        except Exception as e:
            row = {"model": tag, "error": repr(e)[:200]}
        results.append(row)
        print(json.dumps(row))

    from monocular_depth_estimation_trt_tpu.registry import (
        INT8_MEMORY_BOUND_ENCODERS,
    )

    for name, kw, in_hw in QUANT_SUITE:
        tag = (name + ("_" + kw["encoder"] if kw.get("encoder") else "")
               + "_int8")
        if subset and name not in subset and tag not in subset:
            continue
        # Memory-bound small encoders auto-route int8 -> bf16 at build
        # (registry.resolve_int8_precision, round-4 verdict item 7); force
        # int8 here so the row keeps MEASURING the regression the guard
        # acts on, and record the default routing in the row.
        routed = kw.get("encoder") in INT8_MEMORY_BOUND_ENCODERS
        if routed:
            os.environ["MDET_FORCE_INT8"] = "1"
        try:
            t0 = time.time()
            pipe = build_pipeline(name, **kw)
            rep = pipe.benchmark(in_hw, cfg)
            p50 = rep.percentile_ms(50)
            # compare against the same config's bf16 row — from this run, or
            # (isolate-mode subprocesses) the last recorded BENCH_ALL.json
            from bench import _recorded_fps

            bf16_tag = name + ("_" + kw["encoder"]
                               if kw.get("encoder") else "")
            bf16 = next((r.get("fps") for r in results
                         if r.get("model") == bf16_tag), None)
            if bf16 is None:
                bf16 = _recorded_fps(bf16_tag)
            row = {
                "model": tag,
                "input_hw": list(in_hw),
                "fps": round(rep.fps, 2),
                "avg_ms": round(rep.avg_ms, 2),
                "latency_p50_ms": round(p50, 2) if p50 is not None else None,
                "fidelity": get_fidelity(name),
                "baseline_trt_fps": None,
                "speedup_vs_trt": None,
                "bf16_fps": bf16,
                "speedup_vs_bf16": round(rep.fps / bf16, 2) if bf16 else None,
                "build_s": round(time.time() - t0 - rep.total_seconds, 1),
            }
            pct, bound_ms = _pct_of_roof(pipe, rep.avg_seconds)
            row["pct_of_roof"] = pct
            row["roofline_bound_ms"] = bound_ms
            if routed:
                row["note"] = ("default build auto-routes this config "
                               "int8->bf16 (measured regression); forced "
                               "int8 for this row via MDET_FORCE_INT8=1")
        except Exception as e:
            row = {"model": tag, "error": repr(e)[:200]}
        finally:
            if routed:
                os.environ.pop("MDET_FORCE_INT8", None)
        results.append(row)
        print(json.dumps(row))

    _finish(results, args.out)


def _finish(results, out_path: str) -> None:
    if out_path != "-":
        with open(out_path, "w") as f:
            json.dump(
                {"timestamp": time.time(), "results": results}, f, indent=2
            )
        print(f"\nwrote {out_path}")
    ok = [r for r in results if r.get("speedup_vs_trt")]
    if ok:
        geo = np.exp(np.mean([np.log(r["speedup_vs_trt"]) for r in ok]))
        print(f"geomean speedup vs reference TRT over {len(ok)} models: {geo:.2f}x")


if __name__ == "__main__":
    main()
