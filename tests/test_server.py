"""HTTP serving (`apps/server.py`): protocol, queue discipline, errors.

Runs against an injected fake pipeline (no device work) on an ephemeral
port — the contract under test is the serving layer itself: request
decode, worker-thread handoff, npz/jpg response encoding, health/stats,
and overload -> 503 behavior.
"""

import io
import json
import threading
import time
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from monocular_depth_estimation_trt_tpu.apps.server import (
    DepthServer,
    make_handler,
)
from monocular_depth_estimation_trt_tpu.config import ModelSpec


class FakePipeline:
    def __init__(self, delay_s: float = 0.0, viz: bool = True):
        self.spec = ModelSpec(model="fake", input_hw=(32, 48),
                              precision="fp32")
        self.delay_s = delay_s
        self.viz = viz
        self.calls = 0

    def __call__(self, frame, viz=False, device_out=False):
        self.calls += 1
        if self.delay_s:
            time.sleep(self.delay_s)
        h, w = frame.shape[:2]
        out = {"depth": frame[..., 0].astype(np.float32) + 1.0,
               "scalar": np.float32(3.5)}
        if viz and self.viz:
            out["viz"] = np.repeat(frame[..., :1], 3, axis=-1)
        return out


@pytest.fixture
def server_factory():
    servers = []

    def make(pipe, **kw):
        ds = DepthServer(pipe, **kw).start()
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(ds))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        servers.append((httpd, ds))
        return f"http://127.0.0.1:{httpd.server_address[1]}", ds

    yield make
    for httpd, ds in servers:
        httpd.shutdown()
        httpd.server_close()
        ds.stop()


def _png_bytes(h=32, w=48, seed=0) -> bytes:
    import cv2

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    ok, enc = cv2.imencode(".png", img)
    assert ok
    return enc.tobytes()


def _post(url, body, timeout=10):
    req = urllib.request.Request(url, data=body, method="POST")
    return urllib.request.urlopen(req, timeout=timeout)


def test_depth_npz_roundtrip(server_factory):
    base, ds = server_factory(FakePipeline())
    resp = _post(f"{base}/v1/depth", _png_bytes())
    assert resp.status == 200
    data = np.load(io.BytesIO(resp.read()))
    assert data["depth"].shape == (32, 48)  # resized to the served hw
    assert float(data["scalar"]) == 3.5
    assert np.all(data["depth"] >= 1.0)


def test_resize_to_served_resolution(server_factory):
    base, _ = server_factory(FakePipeline(), input_hw=(64, 64))
    resp = _post(f"{base}/v1/depth", _png_bytes(h=100, w=200))
    assert np.load(io.BytesIO(resp.read()))["depth"].shape == (64, 64)


def test_jpg_format(server_factory):
    import cv2

    base, _ = server_factory(FakePipeline())
    resp = _post(f"{base}/v1/depth?format=jpg", _png_bytes())
    assert resp.status == 200
    assert resp.headers["Content-Type"] == "image/jpeg"
    img = cv2.imdecode(np.frombuffer(resp.read(), np.uint8),
                       cv2.IMREAD_COLOR)
    assert img.shape == (32, 48, 3)


def test_health_and_stats(server_factory):
    base, _ = server_factory(FakePipeline())
    h = json.load(urllib.request.urlopen(f"{base}/v1/health", timeout=10))
    assert h["status"] == "ok" and h["input_hw"] == [32, 48]
    _post(f"{base}/v1/depth", _png_bytes())
    s = json.load(urllib.request.urlopen(f"{base}/v1/stats", timeout=10))
    assert s["requests"] >= 1 and "p50_ms" in s


def test_bad_image_400_and_unknown_404(server_factory):
    base, _ = server_factory(FakePipeline())
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/v1/depth", b"not an image")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{base}/v1/nope", timeout=10)
    assert e.value.code == 404


def test_keepalive_404_drains_body(server_factory):
    """A POST with a body to an unknown path must not desync the
    keep-alive connection: the next request on the SAME socket has to
    parse cleanly (the unread body would otherwise be read as its start)."""
    import http.client

    base, _ = server_factory(FakePipeline())
    host = base.split("//", 1)[1]
    conn = http.client.HTTPConnection(host, timeout=10)
    try:
        conn.request("POST", "/v1/depths", body=_png_bytes())  # typo path
        r1 = conn.getresponse()
        assert r1.status == 404
        r1.read()
        # same socket: a valid request must still work
        conn.request("POST", "/v1/depth", body=_png_bytes())
        r2 = conn.getresponse()
        assert r2.status == 200
        data = np.load(io.BytesIO(r2.read()))
        assert data["depth"].shape == (32, 48)
    finally:
        conn.close()


def test_pipeline_error_becomes_500(server_factory):
    class Boom(FakePipeline):
        def __call__(self, frame, viz=False):
            raise RuntimeError("device on fire")

    base, ds = server_factory(Boom())
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/v1/depth", _png_bytes())
    assert e.value.code == 500
    assert "device on fire" in e.value.read().decode()
    # server keeps serving after an error
    assert json.load(
        urllib.request.urlopen(f"{base}/v1/health", timeout=10)
    )["status"] == "ok"


def test_overload_503(server_factory):
    base, ds = server_factory(FakePipeline(delay_s=0.5), max_queue=1)
    results = []

    def fire(seed):
        try:
            results.append(_post(f"{base}/v1/depth", _png_bytes(seed=seed),
                                 timeout=30).status)
        except urllib.error.HTTPError as e:
            results.append(e.code)

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert 503 in results, results  # overload rejected fast
    assert 200 in results, results  # while admitted work completes


def test_cli_serve_parser():
    from monocular_depth_estimation_trt_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args(["serve", "depth_anything_v2", "--encoder", "vits",
                      "--port", "9000", "--size", "518"])
    assert a.fn.__name__ == "cmd_serve"
    assert a.port == 9000 and a.size == 518 and a.max_queue == 32


class FakeBatchPipeline(FakePipeline):
    """Adds the batch_call surface the dynamic-batching worker uses."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self.batch_sizes = []

    def batch_call(self, frames, viz=False, device_out=False):
        self.batch_sizes.append(int(frames.shape[0]))
        out = {
            "depth": frames[..., 0].astype(np.float32) + 1.0,
            "scalar": np.full((frames.shape[0],), 3.5, np.float32),
        }
        if viz:
            out["viz"] = np.repeat(frames[..., :1], 3, axis=-1)
        return out


def test_dynamic_batching_groups_and_scatters(server_factory):
    """Concurrent requests coalesce into one padded power-of-two device
    launch; each response carries its own frame's result."""
    pipe = FakeBatchPipeline()
    base, ds = server_factory(pipe, max_batch=4, batch_window_ms=300.0)

    bodies = {seed: _png_bytes(seed=seed) for seed in range(3)}
    results = {}

    def fire(seed):
        resp = _post(f"{base}/v1/depth", bodies[seed], timeout=30)
        results[seed] = np.load(io.BytesIO(resp.read()))

    threads = [threading.Thread(target=fire, args=(s,)) for s in bodies]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    import cv2

    for seed, data in results.items():
        img = cv2.imdecode(np.frombuffer(bodies[seed], np.uint8),
                           cv2.IMREAD_COLOR)
        expect = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)[..., 0] + 1.0
        assert np.allclose(data["depth"], expect)  # scattered correctly
        assert float(data["scalar"]) == 3.5
    # 3 jobs pad to the 4-bucket (unless a straggler missed the window)
    assert pipe.batch_sizes and all(
        b in (1, 2, 4) for b in pipe.batch_sizes
    ), pipe.batch_sizes

    s = json.load(urllib.request.urlopen(f"{base}/v1/stats", timeout=10))
    assert s["requests"] == 3 and s["max_batch"] == 4


def test_dynamic_batching_error_fails_whole_batch(server_factory):
    class BoomBatch(FakeBatchPipeline):
        def batch_call(self, frames, viz=False, device_out=False):
            raise RuntimeError("batch on fire")

        __call__ = None  # single-job path must not be taken with a queue>1

    base, ds = server_factory(BoomBatch(), max_batch=4,
                              batch_window_ms=300.0)
    codes = []

    def fire(seed):
        try:
            codes.append(_post(f"{base}/v1/depth", _png_bytes(seed=seed),
                               timeout=30).status)
        except urllib.error.HTTPError as e:
            codes.append(e.code)

    threads = [threading.Thread(target=fire, args=(s,)) for s in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert codes.count(500) >= 1, codes
    # server keeps serving afterwards
    assert json.load(
        urllib.request.urlopen(f"{base}/v1/health", timeout=10)
    )["status"] == "ok"


def test_cli_serve_batching_flags():
    from monocular_depth_estimation_trt_tpu.cli import build_parser

    a = build_parser().parse_args(
        ["serve", "depth_anything_v2", "--max-batch", "8",
         "--batch-window-ms", "5"])
    assert a.max_batch == 8 and a.batch_window_ms == 5.0


def test_max_batch_rounds_down_to_power_of_two():
    """--max-batch 6 must not pad batches up to 8 (past the operator's cap,
    onto an engine warmup never compiled): it normalizes down to 4."""
    ds = DepthServer(FakePipeline(), max_batch=6)
    assert ds.max_batch == 4
    assert DepthServer(FakePipeline(), max_batch=8).max_batch == 8
    assert DepthServer(FakePipeline(), max_batch=1).max_batch == 1


def test_prometheus_metrics_endpoint(server_factory):
    base, _ = server_factory(FakeBatchPipeline(), max_batch=2)
    _post(f"{base}/v1/depth", _png_bytes())
    resp = urllib.request.urlopen(f"{base}/metrics", timeout=10)
    assert resp.status == 200
    assert resp.headers["Content-Type"].startswith("text/plain")
    body = resp.read().decode()
    assert "mdet_requests_total 1" in body
    assert "mdet_errors_total 0" in body
    assert "mdet_queue_depth" in body
    assert "mdet_batches_total" in body


# ---------------------------------------------------------------------------
# Multi-model serving
# ---------------------------------------------------------------------------


def _two_model_server(server_factory, **kw):
    a, b = FakePipeline(), FakePipeline()
    a.spec = ModelSpec(model="alpha", input_hw=(32, 48), precision="fp32")
    b.spec = ModelSpec(model="beta", input_hw=(24, 24), precision="fp32")
    base, ds = server_factory({"alpha": a, "beta": b}, **kw)
    return base, ds, a, b


def test_multi_model_routing_and_listing(server_factory):
    """One server, two models: /v1/depth serves the default (first) model,
    /v1/models/<name>/depth and ?model= address the rest, each at its own
    input size; /v1/models lists everything."""
    base, ds, a, b = _two_model_server(server_factory)

    d = np.load(io.BytesIO(_post(f"{base}/v1/depth", _png_bytes()).read()))
    assert d["depth"].shape == (32, 48)  # default = alpha's size

    d = np.load(io.BytesIO(
        _post(f"{base}/v1/models/beta/depth", _png_bytes()).read()))
    assert d["depth"].shape == (24, 24)  # routed to beta, beta's size

    d = np.load(io.BytesIO(
        _post(f"{base}/v1/depth?model=beta", _png_bytes()).read()))
    assert d["depth"].shape == (24, 24)

    listing = json.load(
        urllib.request.urlopen(f"{base}/v1/models", timeout=10))
    assert listing["default"] == "alpha"
    assert listing["models"]["beta"]["input_hw"] == [24, 24]
    assert set(listing["models"]) == {"alpha", "beta"}

    h = json.load(urllib.request.urlopen(f"{base}/v1/health", timeout=10))
    assert h["models"] == ["alpha", "beta"]

    s = json.load(urllib.request.urlopen(f"{base}/v1/stats", timeout=10))
    assert s["requests_by_model"] == {"alpha": 1, "beta": 2}


def test_multi_model_unknown_model_404_keeps_connection(server_factory):
    base, _, _, _ = _two_model_server(server_factory)
    import http.client

    host = base.split("//", 1)[1]
    conn = http.client.HTTPConnection(host, timeout=10)
    try:
        conn.request("POST", "/v1/models/nope/depth", body=_png_bytes())
        r1 = conn.getresponse()
        assert r1.status == 404
        err = json.loads(r1.read())
        assert err["models"] == ["alpha", "beta"]
        # same socket still parses cleanly (body was fully consumed)
        conn.request("POST", "/v1/depth", body=_png_bytes())
        r2 = conn.getresponse()
        assert r2.status == 200
        d = np.load(io.BytesIO(r2.read()))
        assert "depth" in d
    finally:
        conn.close()


def test_empty_model_name_is_404_not_default(server_factory):
    """`/v1/models//depth` (empty name) must 404, not silently serve the
    default model at the default resolution."""
    base, _, _, _ = _two_model_server(server_factory)
    import urllib.error

    try:
        _post(f"{base}/v1/models//depth", _png_bytes())
        raise AssertionError("expected HTTP 404 for empty model name")
    except urllib.error.HTTPError as e:
        assert e.code == 404
        err = json.loads(e.read())
        assert err["models"] == ["alpha", "beta"]


def test_multi_model_batching_groups_by_model(server_factory):
    """A mixed drain must never stack frames of different models (or input
    sizes) into one launch: the worker groups per model, each group gets
    its own padded bucket."""
    a, b = FakeBatchPipeline(), FakeBatchPipeline()
    a.spec = ModelSpec(model="alpha", input_hw=(32, 48), precision="fp32")
    b.spec = ModelSpec(model="beta", input_hw=(24, 24), precision="fp32")
    base, ds = server_factory({"alpha": a, "beta": b}, max_batch=4,
                              batch_window_ms=300.0)

    results = {}

    def fire(i, name):
        url = f"{base}/v1/models/{name}/depth"
        results[(i, name)] = np.load(io.BytesIO(
            _post(url, _png_bytes(seed=i), timeout=30).read()))

    threads = [threading.Thread(target=fire, args=(i, nm))
               for i in range(2) for nm in ("alpha", "beta")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for (i, name), data in results.items():
        expect = (32, 48) if name == "alpha" else (24, 24)
        assert data["depth"].shape == expect, (i, name)
    # each pipeline only ever saw its own frames (its own resolution);
    # batch launches stay power-of-two buckets
    for pipe in (a, b):
        assert all(s in (1, 2, 4) for s in pipe.batch_sizes), pipe.batch_sizes
    s = json.load(urllib.request.urlopen(f"{base}/v1/stats", timeout=10))
    assert s["requests_by_model"] == {"alpha": 2, "beta": 2}


def test_cli_serve_multi_engine_parser():
    from monocular_depth_estimation_trt_tpu.cli import build_parser

    a = build_parser().parse_args(
        ["serve", "--engine", "a.mdeteng", "--engine", "b.mdeteng"])
    assert a.engine == ["a.mdeteng", "b.mdeteng"]
    assert build_parser().parse_args(["serve", "x"]).engine == []


def test_per_model_batch_cap(server_factory):
    """A b1-only artifact co-served with a b4 bundle must not drag the
    bundle down to batch 1: the capped model is chunked to single
    launches while the other still batches (DepthServer.max_batch_by)."""
    a, b = FakeBatchPipeline(), FakeBatchPipeline()
    a.spec = ModelSpec(model="alpha", input_hw=(32, 48), precision="fp32")
    b.spec = ModelSpec(model="beta", input_hw=(24, 24), precision="fp32")
    b.batches = (1,)  # what a b1-only LoadedEngine exposes
    base, ds = server_factory({"alpha": a, "beta": b}, max_batch=4,
                              batch_window_ms=300.0)
    assert ds.max_batch_by == {"alpha": 4, "beta": 1}

    results = {}

    def fire(i, name):
        url = f"{base}/v1/models/{name}/depth"
        results[(i, name)] = np.load(io.BytesIO(
            _post(url, _png_bytes(seed=i), timeout=30).read()))

    threads = [threading.Thread(target=fire, args=(i, nm))
               for i in range(3) for nm in ("alpha", "beta")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for (i, name), data in results.items():
        expect = (32, 48) if name == "alpha" else (24, 24)
        assert data["depth"].shape == expect, (i, name)
    # alpha may batch (pow-2 buckets only); beta must NEVER see a batch
    # launch — its 3 jobs are chunked into single __call__s
    assert all(s in (1, 2, 4) for s in a.batch_sizes), a.batch_sizes
    assert b.batch_sizes == []
    assert b.calls == 3
    listing = json.load(
        urllib.request.urlopen(f"{base}/v1/models", timeout=10))
    assert listing["models"]["alpha"]["max_batch"] == 4
    assert listing["models"]["beta"]["max_batch"] == 1


class SnoopPipeline(FakePipeline):
    """Records whether a watched job was already resolved at each call."""

    def __init__(self):
        super().__init__()
        self.watch = None
        self.watch_done_at_call = []

    def __call__(self, frame, viz=False, device_out=False):
        if self.watch is not None:
            self.watch_done_at_call.append(self.watch.done.is_set())
        return super().__call__(frame, viz=viz, device_out=device_out)


def test_pipelined_worker_overlaps_fetch_with_next_dispatch():
    """The two-stage worker dispatches request N+1 BEFORE resolving N, so
    the host readback (28 ms RTT over the tunnel) overlaps device compute:
    while job 2's launch runs, job 1 must still be unresolved."""
    from monocular_depth_estimation_trt_tpu.apps.server import DepthServer

    pipe = SnoopPipeline()
    ds = DepthServer(pipe, max_queue=8)
    frame = np.zeros((32, 48, 3), np.uint8)
    j1 = ds.submit(frame, viz=False)  # queued before the worker starts
    pipe.watch = j1
    j2 = ds.submit(frame, viz=False)
    ds.start()
    try:
        assert j1.done.wait(10) and j2.done.wait(10)
        assert j1.error is None and j2.error is None
        assert j1.result["depth"].shape == (32, 48)
        assert j2.result["depth"].shape == (32, 48)
        # two calls observed; at the SECOND dispatch j1 was still in flight
        assert pipe.watch_done_at_call == [False, False]
    finally:
        ds.stop()


def test_blank_query_model_is_404_not_default(server_factory):
    """`?model=` (blank value) must 404 like the path form — parse_qs
    keeps blank values so '' is not silently the default model."""
    base, _, _, _ = _two_model_server(server_factory)

    try:
        _post(f"{base}/v1/depth?model=", _png_bytes())
        raise AssertionError("expected HTTP 404 for blank model name")
    except urllib.error.HTTPError as e:
        assert e.code == 404
        assert json.loads(e.read())["models"] == ["alpha", "beta"]


def test_sync_pipe_groups_resolve_before_next_dispatch():
    """A pipeline WITHOUT device_out computes everything at dispatch time;
    the worker must resolve it immediately instead of holding finished
    results hostage to the NEXT group's blocking compute."""
    events = []

    class SyncSnoop:
        spec = ModelSpec(model="sync", input_hw=(32, 48), precision="fp32")
        watch = None

        def __call__(self, frame, viz=False):  # no device_out kwarg
            if self.watch is not None:
                events.append(self.watch.done.is_set())
            return {"depth": frame[..., 0].astype(np.float32)}

    pipe = SyncSnoop()
    ds = DepthServer(pipe, max_queue=8)
    frame = np.zeros((32, 48, 3), np.uint8)
    j1 = ds.submit(frame, viz=False)
    SyncSnoop.watch = j1
    j2 = ds.submit(frame, viz=False)
    ds.start()
    try:
        assert j1.done.wait(10) and j2.done.wait(10)
        # call 1: j1 naturally unresolved; call 2: j1 ALREADY resolved
        assert events == [False, True]
    finally:
        ds.stop()


def test_sigterm_drains_and_returns():
    """SIGTERM (docker stop / k8s) must shut the blocking serve() down
    cleanly — drain, worker join, return — not die mid-launch."""
    import os
    import signal

    from monocular_depth_estimation_trt_tpu.apps.server import serve

    assert threading.current_thread() is threading.main_thread()
    prev = signal.getsignal(signal.SIGTERM)

    def killer():
        time.sleep(0.8)
        os.kill(os.getpid(), signal.SIGTERM)

    threading.Thread(target=killer, daemon=True).start()
    serve(FakePipeline(), host="127.0.0.1", port=0, warmup=False)  # returns
    assert signal.getsignal(signal.SIGTERM) is prev  # handler restored


def test_mixed_sync_async_models_under_concurrent_load():
    """Stress the two-stage worker: one device_out model and one sync model
    behind the same server, hammered concurrently with mixed viz — every
    job resolves, correct values, coherent stats."""
    a = FakeBatchPipeline()           # device_out capable
    a.spec = ModelSpec(model="alpha", input_hw=(16, 16), precision="fp32")

    class SyncPipe(FakePipeline):
        def __call__(self, frame, viz=False):  # no device_out
            return super().__call__(frame, viz=viz)

    b = SyncPipe()
    b.spec = ModelSpec(model="beta", input_hw=(16, 16), precision="fp32")

    ds = DepthServer({"alpha": a, "beta": b}, max_batch=4,
                     batch_window_ms=1.0).start()
    try:
        jobs = []
        lock = threading.Lock()

        def fire(i):
            frame = np.full((16, 16, 3), i % 251, np.uint8)
            j = ds.submit(frame, viz=bool(i % 3 == 0),
                          model="alpha" if i % 2 else "beta")
            with lock:
                jobs.append((i, j))

        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(40)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, j in jobs:
            assert j.done.wait(30), f"job {i} never resolved"
            assert j.error is None, f"job {i}: {j.error}"
            # depth = frame[..., 0] + 1.0 pins result-to-request routing
            assert float(np.asarray(j.result["depth"])[0, 0]) == (i % 251) + 1.0
        s = ds.stats()
        assert s["requests"] == 40 and s["errors"] == 0
        assert s["requests_by_model"]["alpha"] == 20
        assert s["requests_by_model"]["beta"] == 20
    finally:
        ds.stop()


def test_serve_sync_env_forces_synchronous_worker(monkeypatch):
    """MDET_SERVE_SYNC=1 (the hardware A/B knob) disables the two-stage
    worker even for device_out-capable pipelines."""
    monkeypatch.setenv("MDET_SERVE_SYNC", "1")
    ds = DepthServer(FakeBatchPipeline())
    assert ds._dev_out == {"fake": False}


def test_warmup_compiles_every_batch_bucket():
    """Warmup must touch EVERY power-of-two bucket (both viz modes), not
    just b1 and the cap — a bucket first compiled mid-traffic stalls the
    worker for a full engine build and 504s the queue behind it (observed
    in the hardware load test before this was fixed)."""
    pipe = FakeBatchPipeline()
    ds = DepthServer(pipe, max_batch=8)
    ds.warmup()
    assert sorted(pipe.batch_sizes) == [2, 2, 4, 4, 8, 8]
    for b in (1, 2, 4, 8):
        assert (("fake", b, True) in ds._warm
                and ("fake", b, False) in ds._warm)
