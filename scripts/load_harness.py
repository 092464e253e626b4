#!/usr/bin/env python
"""In-process serving load harness (round-3 verdict item 6).

Drives ``apps.server.DepthServer.submit`` directly from N closed-loop client
threads — no HTTP, no loopback sockets — so the measured numbers are the
batcher's and the device's, not the 1-core dev box's HTTP stack. Reports,
per (concurrency, max_batch) cell: throughput, p50/p99 service latency,
achieved batch size, and errors; the batching win is each cell vs the
max_batch=1 cell at the same concurrency.

Generalizes the reference's webcam backpressure pattern
(``Depth_Pro/onnx2trt_webcam.py:36-44``: drop frames when the consumer lags)
into a measurable serving contract.

Usage:
  python scripts/load_harness.py                      # vits on the TPU
  python scripts/load_harness.py --duration 10 --concurrency 1,4,8
  python scripts/load_harness.py --mixed              # +metric3d tiny mix
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def run_load(pipes, *, concurrency: int, max_batch: int, duration_s: float,
             input_hw=(518, 518), viz: bool = False,
             model_mix=None, max_queue: int = 64,
             chip_side: bool = False) -> dict:
    """Closed-loop load: ``concurrency`` threads, each submit→wait→repeat.

    ``pipes``: pipeline or {name: pipeline} (DepthServer's contract).
    ``model_mix``: optional list of model names sampled round-robin per
    client (multi-model serving); default = server's default model.
    Returns one result row (throughput, latency percentiles, batching).
    """
    from monocular_depth_estimation_trt_tpu.apps.server import DepthServer

    srv = DepthServer(pipes, max_batch=max_batch, max_queue=max_queue,
                      batch_window_ms=2.0, chip_side=chip_side)
    srv.warmup()
    srv.start()

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (*input_hw, 3), dtype=np.uint8)
    stop = threading.Event()
    lat_ms: list = []
    counts = {"ok": 0, "rejected": 0, "failed": 0, "timeout": 0}
    lock = threading.Lock()

    def client(idx: int) -> None:
        import queue as _q

        my_models = (model_mix[idx % len(model_mix)]
                     if model_mix else None)
        while not stop.is_set():
            t0 = time.perf_counter()
            try:
                job = srv.submit(frame, viz, model=my_models)
            except _q.Full:
                with lock:
                    counts["rejected"] += 1
                time.sleep(0.005)  # backpressure: brief client backoff
                continue
            if not job.done.wait(timeout=60.0):
                with lock:
                    counts["timeout"] += 1
                continue
            dt = (time.perf_counter() - t0) * 1e3
            with lock:
                if job.error:
                    counts["failed"] += 1
                else:
                    counts["ok"] += 1
                    lat_ms.append(dt)

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(concurrency)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(duration_s)
    stop.set()
    for t in threads:
        t.join(timeout=65.0)
    wall = time.perf_counter() - t_start
    srv.stop()

    stats = srv.stats()
    row = {
        "concurrency": concurrency,
        "max_batch": max_batch,
        "duration_s": round(wall, 1),
        "throughput_fps": round(counts["ok"] / wall, 2),
        "ok": counts["ok"],
        "rejected_503": counts["rejected"],
        "failed": counts["failed"],
        "timeouts": counts["timeout"],
        "avg_batch": stats.get("avg_batch"),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 1) if lat_ms else None,
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 1) if lat_ms else None,
    }
    if model_mix:
        row["model_mix"] = sorted(set(model_mix))
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="depth_anything_v2")
    ap.add_argument("--encoder", default="vits")
    ap.add_argument("--duration", type=float, default=15.0)
    ap.add_argument("--concurrency", default="1,2,4,8,16")
    ap.add_argument("--max-batch", default="1,8", dest="max_batch")
    ap.add_argument("--mixed", action="store_true",
                    help="co-serve a second model (metric3d_v2 vitl) and "
                    "split clients across both")
    ap.add_argument("--chip-side", action="store_true", dest="chip_side",
                    help="device-resident synthetic frames + 1-element "
                    "probe readback: isolates the batcher + chip from the "
                    "dev tunnel's ~45 MB/s link (round-4 verdict item 9)")
    ap.add_argument("--out", default="")
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

    kw = {"encoder": args.encoder} if args.encoder else {}
    pipe = build_pipeline(args.model, **kw)
    pipes = pipe
    mix = None
    if args.mixed:
        second = build_pipeline("metric3d_v2", encoder="vitl")
        pipes = {args.model: pipe, "metric3d_v2": second}
        mix = [args.model, args.model, args.model, "metric3d_v2"]

    rows = []
    base_by_conc = {}
    for mb in [int(s) for s in args.max_batch.split(",")]:
        for conc in [int(s) for s in args.concurrency.split(",")]:
            row = run_load(pipes, concurrency=conc, max_batch=mb,
                           duration_s=args.duration,
                           input_hw=tuple(pipe.spec.input_hw), model_mix=mix,
                           chip_side=args.chip_side)
            if args.chip_side:
                row["chip_side"] = True
            if mb == 1:
                base_by_conc[conc] = row["throughput_fps"]
            elif base_by_conc.get(conc):
                row["batching_win"] = round(
                    row["throughput_fps"] / base_by_conc[conc], 2)
            rows.append(row)
            print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"timestamp": time.time(), "rows": rows}, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
