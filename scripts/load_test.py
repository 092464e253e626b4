"""HTTP serving load generator: measure `mdet serve` throughput under
concurrent load (the evidence tool for --max-batch dynamic batching).

Fires N concurrent client threads at POST /v1/depth for a fixed duration,
then prints ONE JSON line: served FPS, client-side latency percentiles,
error counts, and the server's own /v1/stats (batches, avg_batch).

Usage:
    mdet serve depth_anything_v2 --encoder vits --max-batch 8 &
    python scripts/load_test.py --url http://127.0.0.1:8000 \
        --image data/example.jpg --clients 8 --seconds 30

The reference has no serving layer to compare against (its closest surface
is the local webcam viewer, Depth_Pro/onnx2trt_webcam.py:191-197); the
interesting comparison is this tool's FPS at --max-batch 1 vs N.

Measurement note: POST a SMALL (pre-resized, e.g. 518x518) image. Decoding
a 7-MP JPEG costs ~0.3 s of host CPU per request on a 1-core box — with a
large image the load test measures the decoder, not the device.
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import urllib.request


def _worker(url: str, body: bytes, stop_at: float, out: dict, lock):
    while time.time() < stop_at:
        t0 = time.time()
        try:
            req = urllib.request.Request(f"{url}/v1/depth", data=body,
                                         method="POST")
            resp = urllib.request.urlopen(req, timeout=120)
            resp.read()
            ok = resp.status == 200
        except Exception:
            ok = False
        dt = (time.time() - t0) * 1e3
        with lock:
            out["lat_ms"].append(dt)
            out["done" if ok else "errors"] += 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("--image", default="data/example.jpg")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--warmup-s", type=float, default=5.0,
                    help="untimed leading seconds (bucket compiles)")
    args = ap.parse_args()

    body = open(args.image, "rb").read()

    def one_request(timeout=600):
        urllib.request.urlopen(
            urllib.request.Request(f"{args.url}/v1/depth", data=body,
                                   method="POST"), timeout=timeout).read()

    # warmup, untimed: first a single request (single-frame engine), then
    # two CONCURRENT rounds at full client count — batched buckets only
    # compile under concurrent load, and a bucket compile inside the timed
    # window would measure XLA, not serving throughput
    t0 = time.time()
    one_request()
    for _ in range(2):
        ws = [threading.Thread(target=one_request) for _ in range(args.clients)]
        for t in ws:
            t.start()
        for t in ws:
            t.join()
    warm_s = time.time() - t0
    time.sleep(max(args.warmup_s - warm_s, 0.0))

    out = {"lat_ms": [], "done": 0, "errors": 0}
    lock = threading.Lock()
    stop_at = time.time() + args.seconds
    t_start = time.time()
    threads = [
        threading.Thread(target=_worker,
                         args=(args.url, body, stop_at, out, lock))
        for _ in range(args.clients)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.time() - t_start

    lat = sorted(out["lat_ms"])

    def pct(p):
        return round(lat[min(int(len(lat) * p / 100), len(lat) - 1)], 1) \
            if lat else None

    try:
        stats = json.load(urllib.request.urlopen(f"{args.url}/v1/stats",
                                                 timeout=10))
    except Exception:
        stats = {}
    print(json.dumps({
        "metric": "serve_load_fps",
        "value": round(out["done"] / elapsed, 2),
        "unit": "fps",
        "clients": args.clients,
        "seconds": round(elapsed, 1),
        "done": out["done"],
        "errors": out["errors"],
        "client_p50_ms": pct(50),
        "client_p99_ms": pct(99),
        "server_stats": stats,
    }))


if __name__ == "__main__":
    main()
